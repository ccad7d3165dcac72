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


def test_sync_byte_garbage_strtol(tmp_wav):
    """--sync-byte with non-numeric text follows C strtol: parses as 0
    instead of crashing (reference: src/minimodem.c:700-702)."""
    from .helpers import run_cli

    wav = tmp_wav()
    code, _, err = run_cli(
        ["--tx", "--sync-byte", "zz", "--file", wav, "1200"], b"hi")
    assert code == 0, err
    code, out, err = run_cli(
        ["--rx", "--sync-byte", "zz", "--file", wav, "1200"])
    assert code == 0, err
    assert out == b"hi", (out, err)


def test_truncated_fmt_chunk_clean_error(tmp_path):
    """A WAV with an 8-byte fmt chunk must fail cleanly, not over-read."""
    import struct

    from .helpers import run_cli

    p = tmp_path / "trunc.wav"
    fmt8 = struct.pack("<HHI", 1, 1, 48000)
    body = b"fmt " + struct.pack("<I", 8) + fmt8
    riff = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    p.write_bytes(riff)
    code, out, err = run_cli(["--rx", "--file", str(p), "1200"])
    assert code == 1
    assert out == b""
    assert "Traceback" not in err, err


def test_sharded_halo_guard():
    """halo > t_local must be a clear error, not an XLA shape crash."""
    import pytest as _pytest

    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.parallel.sharding import make_mesh, sharded_score_fn

    m = FskModem("rtty")           # halo ~ 9k at 48 kHz
    mesh = make_mesh()
    with _pytest.raises(ValueError, match="halo"):
        sharded_score_fn(m.cfg, mesh, 1 << 12)
