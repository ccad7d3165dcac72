"""Edge-case behavior: empty input, stereo rejection, tiny payloads,
silence-only audio."""

import struct

import numpy as np

from .helpers import run_cli


def test_tx_empty_input(tmp_path):
    # no bytes -> no leader/trailer, header-only file
    wav = str(tmp_path / "e.wav")
    code, _, err = run_cli(["--tx", "--file", wav, "1200"], b"")
    assert code == 0, err
    code, out, err = run_cli(["--rx", "--file", wav, "1200"])
    assert code == 0
    assert out == b""
    assert "CARRIER" not in err


def test_rx_silence_only(tmp_path):
    from minimodem_tpu.sigio import Direction, SampleFormat
    from minimodem_tpu.sigio.wavfile import FileStream

    wav = str(tmp_path / "s.wav")
    st = FileStream(wav, Direction.PLAYBACK, SampleFormat.S16, 48000, 1)
    st.write(np.zeros(48000, np.int16))
    st.close()
    code, out, err = run_cli(["--rx", "--file", wav, "1200"])
    assert code == 0
    assert out == b""
    assert "NOCARRIER" not in err  # never acquired


def test_rx_rejects_stereo(tmp_path):
    wav = str(tmp_path / "st.wav")
    data = np.zeros(1000, np.int16)
    with open(wav, "wb") as f:
        blk = 4  # 2ch * 16bit
        hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF",
                          36 + data.nbytes, b"WAVE", b"fmt ", 16, 1, 2,
                          48000, 48000 * blk, blk, 16, b"data", data.nbytes)
        f.write(hdr + data.tobytes())
    code, out, err = run_cli(["--rx", "--file", wav, "1200"])
    assert code == 1
    assert "must be 1-channel" in err


def test_single_char(tmp_path):
    wav = str(tmp_path / "one.wav")
    code, _, err = run_cli(["--tx", "--file", wav, "1200"], b"A")
    assert code == 0, err
    code, out, err = run_cli(["--rx", "--file", wav, "1200"])
    assert code == 0
    assert out == b"A", err
