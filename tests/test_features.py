"""Flag-surface feature tests beyond the reference's shipped suite:
carrier autodetect, binary output modes, bit-order/framing variants,
custom sync bytes, V.21, UIC decode, print filter, confidence knobs."""

import numpy as np
import pytest

from .conftest import ASCII_FIXTURE, read_fixture
from .helpers import run_cli, self_test


def test_auto_carrier(tmp_wav):
    # -a engages the carrier-autodetect host path
    # (reference: src/minimodem.c:1179-1220).  RTTY is the designed use
    # case: its long bit time gives the one-bit detection FFT enough
    # spectral resolution.  (At 1200 baud the 40-sample scan window has a
    # 1200 Hz main lobe vs 200 Hz bands, so detection is off-by-a-band
    # flaky — in the reference too, which ships no -a test.)
    text = b"RTTY AUTODETECT ROUND TRIP 123\n"
    wav = tmp_wav()
    code, _, err = run_cli(["--tx", "--file", wav, "rtty"], text)
    assert code == 0, err
    code, out, err = run_cli(["--rx", "-a", "--file", wav, "rtty"])
    assert code == 0, err
    assert out == text, err
    assert "### CARRIER" in err


def test_auto_carrier_nondefault_tone(tmp_wav):
    # TX on shifted tones; -a must find the carrier band
    text = b"autodetect me\n"
    wav = tmp_wav()
    code, _, err = run_cli(
        ["--tx", "--file", wav, "1200", "-M", "2200", "-S", "3200"], text)
    assert code == 0, err
    code, out, err = run_cli(["--rx", "-a", "--file", wav, "1200"])
    assert code == 0, err
    assert out == text, err


def test_auto_carrier_deterministic_integer_ratio(tmp_wav):
    """Deterministic -a: integer-ratio tones (24000 Hz / 300 baud /
    M=1200 S=2400) put the mark tone exactly on a detection-FFT bin, so
    the band argmax cannot leak and the detected carrier frequency and
    decode are pinned (exceeds the reference's own suite, which ships no
    -a test).  -a decodes on the host replay regardless of engine (see
    rx/engine.py:_run_device_autodetect)."""
    text = b"DETERMINISTIC AUTODETECT 42\n"
    wav = tmp_wav()
    code, _, err = run_cli(
        ["--tx", "--file", wav, "--samplerate", "24000",
         "-M", "1200", "-S", "2400", "300"], text)
    assert code == 0, err
    code, out, err = run_cli(
        ["--rx", "-a", "--file", wav, "--samplerate", "24000", "300"])
    assert code == 0, err
    assert out == text, err
    assert "### CARRIER 300 @ 1200.0 Hz ###" in err, err
    assert "(rate perfect)" in err, err


def test_binary_output(tmp_wav):
    wav = tmp_wav()
    code, _, err = run_cli(["--tx", "--file", wav, "1200"], b"A")
    assert code == 0, err
    code, out, err = run_cli(["--rx", "--binary-output", "--file", wav, "1200"])
    assert code == 0, err
    lines = out.decode().strip().split("\n")
    # 'A' = 0x41 -> LSB-first bits 10000010
    assert "10000010" in lines, (lines, err)


def test_binary_raw(tmp_wav):
    # --binary-raw N: no framing, N bits per line
    # (reference: src/minimodem.c:894-898).  Without start/stop bits the
    # frame alignment is arbitrary, so check the concatenated bit stream
    # rather than line boundaries.
    wav = tmp_wav()
    payload = bytes([0b10110010] * 4)
    code, _, err = run_cli(["--tx", "--file", wav, "--startbits", "0",
                            "--stopbits", "0", "1200"], payload)
    assert code == 0, err
    code, out, err = run_cli(
        ["--rx", "--binary-raw", "8", "--file", wav, "1200"])
    assert code == 0, err
    stream = out.decode().replace("\n", "")
    assert set(stream) <= {"0", "1"}
    assert "01001101" * 3 in stream, (out, err)  # LSB-first of 0xB2 x3


def test_msb_first(tmp_wav):
    self_test(b"msb-first round trip\n", tmp_wav(),
              ["--msb-first", "1200"])


def test_invert_start_stop(tmp_wav):
    self_test(b"inverted start/stop\n", tmp_wav(),
              ["--invert-start-stop", "1200"])


def test_inverted_freqs(tmp_wav):
    self_test(b"inverted mark/space\n", tmp_wav(), ["-i", "1200"])


def test_custom_sync_byte(tmp_wav):
    self_test(b"sync framed payload\n", tmp_wav(),
              ["--sync-byte", "0x55", "1200"])


def test_v21(tmp_wav):
    self_test(b"V.21 at 300 baud\n", tmp_wav(), ["V.21"])


def test_custom_startstop(tmp_wav):
    self_test(b"two start bits, two stop bits\n", tmp_wav(),
              ["--startbits", "2", "--stopbits", "2", "1200"])


def test_usos_off(tmp_wav):
    self_test(b"FIGS 123 456 789 END\n", tmp_wav(), ["-u", "0", "rtty"])


def test_print_filter(tmp_wav):
    wav = tmp_wav()
    payload = b"ok\x01\x02text\n"
    code, _, err = run_cli(["--tx", "--file", wav, "1200"], payload)
    assert code == 0, err
    code, out, err = run_cli(
        ["--rx", "--print-filter", "--file", wav, "1200"])
    assert code == 0, err
    assert out == b"ok..text\n", (out, err)


def test_print_eot(tmp_wav):
    wav = tmp_wav()
    code, _, err = run_cli(["--tx", "--print-eot", "--file", wav, "1200"],
                           b"bye")
    assert code == 0, err
    assert "### EOT" in err


def test_confidence_threshold_squelch(tmp_wav):
    # an absurdly high threshold squelches everything -> no output
    text = b"should be squelched"
    wav = tmp_wav()
    code, _, err = run_cli(["--tx", "--file", wav, "1200"], text)
    assert code == 0, err
    code, out, err = run_cli(
        ["--rx", "-c", "1000000", "--file", wav, "1200"])
    assert code == 0
    assert out == b""
    assert "CARRIER" not in err


def test_limit_sanitize(tmp_wav):
    # -l below -c is raised to -c (reference: src/minimodem.c:963-965);
    # decode still works
    self_test(b"limit sanitize\n", tmp_wav(),
              ["1200"], rx_args=["-c", "2.0", "-l", "0.5", "1200"])


def test_uic_decode(tmp_wav):
    """Synthesize a UIC-751-3 telegram by keying raw frame bits, decode
    with the uic-train preset (reference: src/minimodem.c:859-876,
    src/databits_uic.c)."""
    from minimodem_tpu.codecs import bit_reverse
    from minimodem_tpu.models.presets import uic
    from minimodem_tpu.ops.tx import ToneGenerator
    from minimodem_tpu.sigio import Direction, SampleFormat
    from minimodem_tpu.sigio.wavfile import FileStream

    preset = uic("train")
    cfg = preset.cfg
    wav = tmp_wav()

    # frame bits: 8-bit sync pattern 11110010 then 39 data bits
    train_id = [2, 0, 1, 9, 0, 7]           # six nibbles, LSB-first each
    code_byte = 0x09                         # "Train staff wish to comm."
    data = 0
    for i, nib in enumerate(train_id):
        data |= nib << (4 * i)
    data |= bit_reverse(code_byte, 8) << 24
    frame_bits = [1, 1, 1, 1, 0, 0, 1, 0] + [
        (data >> i) & 1 for i in range(39)]

    gen = ToneGenerator(cfg.sample_rate, SampleFormat.S16)
    bit_ns = cfg.bit_nsamples_tx
    for _ in range(4):                       # leader marks
        gen.tone(float(cfg.mark_f), bit_ns)
    for _ in range(3):                       # repeat the telegram
        for b in frame_bits:
            gen.tone(float(cfg.mark_f if b else cfg.space_f), bit_ns)
    for _ in range(4):
        gen.tone(float(cfg.mark_f), bit_ns)
    stream = FileStream(wav, Direction.PLAYBACK, SampleFormat.S16,
                        cfg.sample_rate, 1)
    stream.write(gen.synthesize())
    stream.close()

    code, out, err = run_cli(["--rx", "--file", wav, "uic-train"])
    assert code == 0, err
    assert b"Train ID: 201907 - Message: 09 (Train staff wish to comm.)" \
        in out, (out, err)


def test_auto_carrier_rearm_engine_parity():
    """-a re-arms detection after carrier loss (the reference resets
    carrier_band on every noconfidence overflow, src/minimodem.c:
    1295-1297): two bursts at different mark tones separated by silence
    must decode on every engine routing, including the retune to the
    second band.  (Device-engine -a delegates to the host replay: the
    post-drop detection chunk phase depends on samplebuf state a
    device-resident decode does not model — see
    rx/engine.py:_run_device_autodetect.)"""
    import io

    import numpy as np

    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.models.presets import bell_like
    from minimodem_tpu.rx.engine import Receiver
    from minimodem_tpu.utils.cfloat import f32

    def burst(mark, space, text):
        from minimodem_tpu.models.modem import FskModem

        m = FskModem("300", sample_rate=24000)
        m.preset = bell_like(300, 24000, mark_f=f32(mark),
                             space_f=f32(space))
        m.cfg = m.preset.cfg
        return m.modulate(text)

    w1 = burst(1200, 2400, b"FIRST BURST")
    w2 = burst(1800, 3000, b"SECOND BURST")
    gap = np.zeros(24000, np.float32)       # 1 s: forces a carrier drop
    stream = np.concatenate([w1, gap, w2]).astype(np.float32)

    rx_cfg = bell_like(300, 24000).cfg
    opts = RxOptions(carrier_autodetect_threshold=0.001)

    outs = {}
    for engine in ("host", "device"):
        out, err = io.BytesIO(), io.StringIO()
        rx = Receiver(rx_cfg, opts, get_codec("ascii8"),
                      out.write, err.write)
        rx.run(stream.copy(), engine=engine)
        outs[engine] = (out.getvalue(), err.getvalue())

    assert outs["device"][0] == outs["host"][0] == b"FIRST BURSTSECOND BURST"
    # two carrier sessions on both routings, second at the retuned band
    for engine in ("host", "device"):
        err = outs[engine][1]
        assert err.count("### CARRIER") == 2, (engine, err)
        assert "@ 1200.0 Hz" in err and "@ 1800.0 Hz" in err, (engine, err)
        assert err.count("NOCARRIER") == 2, (engine, err)
    assert outs["device"][1] == outs["host"][1], (
        outs["device"][1], outs["host"][1])


def test_manpage_current():
    """docs/minimodem-tpu.1 must be regenerable from MANUAL.md (the
    reference ships a man page built from ronn source,
    src/Makefile.am:27-29; here gen_manpage.py renders MANUAL.md)."""
    import os
    import subprocess
    import sys

    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "gen_manpage.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with open(os.path.join(root, "docs", "minimodem-tpu.1")) as f:
        roff = f.read()
    for needle in (".SH SYNOPSIS", ".SH NAME", "--auto-carrier",
                   ".SH STATS LINES"):
        assert needle in roff, needle
    # HTML rendering ships alongside (reference: src/Makefile.am:60-62)
    with open(os.path.join(root, "docs", "minimodem-tpu.html")) as f:
        html = f.read()
    for needle in ("<h1>minimodem-tpu(1)", "<h2>", "--auto-carrier",
                   "<table>"):
        assert needle in html, needle
