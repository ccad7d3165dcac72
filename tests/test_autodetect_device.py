"""Device-resident carrier autodetect (-a) parity tests.

The device -a path (rx/engine.py:_run_device_autodetect) runs detection
probes host-side on the samplebuf grid but decodes every detected burst
end-to-end on the device engine (stop_on_overflow mode), reconstructing
the samplebuf refill/advance phase by an integer replay over the event
positions.  These tests pin it decision-exact — bytes AND stderr —
against the host replay (itself parity-locked to the reference's
src/minimodem.c:1179-1220 autodetect loop), including re-arm cases where
the post-drop probe-grid phase matters.  The live-feed variant
(run_live_autodetect) must match the file-mode result chunk-for-chunk.
"""

import io

import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.models.presets import bell_like
from minimodem_tpu.rx.engine import Receiver
from minimodem_tpu.utils.cfloat import f32


def burst(mark, space, text, rate=24000, baud=300):
    m = FskModem(str(baud), sample_rate=rate)
    m.preset = bell_like(baud, rate, mark_f=f32(mark), space_f=f32(space))
    m.cfg = m.preset.cfg
    return m.modulate(text)


def run_a(stream, engine, rx_one=False, rate=24000, baud=300):
    cfg = bell_like(baud, rate).cfg
    opts = RxOptions(carrier_autodetect_threshold=0.001, rx_one=rx_one)
    out, err = io.BytesIO(), io.StringIO()
    rx = Receiver(cfg, opts, get_codec("ascii8"), out.write, err.write)
    rx.run(stream.copy(), engine=engine)
    return out.getvalue(), err.getvalue()


def assert_parity(stream, rx_one=False, **kw):
    host = run_a(stream, "host", rx_one=rx_one, **kw)
    dev = run_a(stream, "device", rx_one=rx_one, **kw)
    assert dev[0] == host[0], (dev[0], host[0], host[1], dev[1])
    assert dev[1] == host[1], (dev[1], host[1])
    return host


def test_single_burst_leading_silence():
    # detection needs several probe iterations before the carrier
    # appears: exercises the detect-advance phase replay
    w = burst(1200, 2400, b"HELLO DEVICE AUTODETECT")
    stream = np.concatenate([np.zeros(30000, np.float32), w])
    out, err = assert_parity(stream)
    assert out == b"HELLO DEVICE AUTODETECT"
    assert err.count("### CARRIER") == 1


def test_three_bursts_same_band():
    # re-arm WITHOUT retune: each noconfidence overflow resets detection
    # (reference src/minimodem.c:1295-1297); the next probe grid depends
    # on the carried samplebuf phase
    parts = []
    for i, txt in enumerate([b"BURST ONE ", b"BURST TWO ", b"BURST THREE"]):
        parts.append(burst(1200, 2400, txt))
        parts.append(np.zeros(24000 + 1111 * i, np.float32))
    stream = np.concatenate(parts)
    out, err = assert_parity(stream)
    # NB: whether a later burst re-acquires depends on the post-drop
    # probe-grid phase — the reference itself can miss one (its coarse
    # candidates land off the frame grid); parity is the contract here
    assert out.startswith(b"BURST ONE BURST TWO")
    assert err.count("### CARRIER") >= 2
    assert err.count("NOCARRIER") >= 2


def test_rearm_retune():
    # re-arm WITH retune (different mark tone per burst): the second
    # decode must run on a receiver tuned to the new band
    w1 = burst(1200, 2400, b"AT 1200")
    w2 = burst(1800, 3000, b"AT 1800")
    stream = np.concatenate([w1, np.zeros(24000, np.float32), w2])
    out, err = assert_parity(stream)
    assert out == b"AT 1200AT 1800"
    assert "@ 1200.0 Hz" in err and "@ 1800.0 Hz" in err


def test_rx_one():
    # -a + rx_one: decode ends at the FIRST carrier drop
    w1 = burst(1200, 2400, b"FIRST")
    w2 = burst(1200, 2400, b"SECOND")
    stream = np.concatenate([w1, np.zeros(24000, np.float32), w2])
    out, err = assert_parity(stream, rx_one=True)
    assert out == b"FIRST"
    assert err.count("### CARRIER") == 1


def test_no_carrier_anywhere():
    # pure silence: no detection, no output, identical (empty) stderr
    stream = np.zeros(60000, np.float32)
    out, err = assert_parity(stream)
    assert out == b""
    assert "CARRIER" not in err


def run_live(stream, chunk_sizes, rx_one=False, rate=24000, baud=300):
    cfg = bell_like(baud, rate).cfg
    opts = RxOptions(carrier_autodetect_threshold=0.001, rx_one=rx_one)
    out, err = io.BytesIO(), io.StringIO()
    rx = Receiver(cfg, opts, get_codec("ascii8"), out.write, err.write)

    def chunks():
        i = 0
        k = 0
        while i < len(stream):
            n = chunk_sizes[k % len(chunk_sizes)]
            yield stream[i:i + n]
            i += n
            k += 1

    rx.run_live_autodetect(chunks())
    return out.getvalue(), err.getvalue()


@pytest.mark.parametrize("chunk_sizes", [[12000], [7777, 1234, 50000]])
def test_live_matches_file(chunk_sizes):
    # the live chunked feed must produce the same bytes as the file-mode
    # device path; carrier events and decode text are chunking-invariant
    parts = [burst(1200, 2400, b"LIVE ONE "),
             np.zeros(26000, np.float32),
             burst(1200, 2400, b"LIVE TWO")]
    stream = np.concatenate(parts)
    fout, ferr = run_a(stream, "device")
    lout, lerr = run_live(stream, chunk_sizes)
    assert lout == fout == b"LIVE ONE LIVE TWO"
    assert lerr.count("### CARRIER") == 2
    assert lerr.count("NOCARRIER") == 2


def test_live_retune():
    w1 = burst(1200, 2400, b"L1200")
    w2 = burst(1800, 3000, b"L1800")
    stream = np.concatenate([w1, np.zeros(26000, np.float32), w2])
    lout, lerr = run_live(stream, [9000])
    assert lout == b"L1200L1800"
    assert "@ 1200.0 Hz" in lerr and "@ 1800.0 Hz" in lerr


def test_live_rx_one():
    w1 = burst(1200, 2400, b"ONLY")
    w2 = burst(1200, 2400, b"NOT THIS")
    stream = np.concatenate([w1, np.zeros(26000, np.float32), w2])
    lout, lerr = run_live(stream, [8000], rx_one=True)
    assert lout == b"ONLY"
    assert lerr.count("### CARRIER") == 1


def test_cli_live_alsa(monkeypatch):
    # end-to-end: `minimodem-tpu --rx -a -A` reading from a mock ALSA
    # capture device (the reference supports -a on any RECORD stream;
    # the round-2 CLI refused it for live input)
    import minimodem_tpu.sigio.alsa as A

    from .helpers import run_cli
    from .test_alsa import FakeAsound

    w = burst(1200, 2400, b"LIVE ALSA AUTODETECT", rate=48000)
    fake = FakeAsound(capture=np.asarray(w, np.float32))
    monkeypatch.setattr(A, "load_libasound", lambda: fake)
    code, out, err = run_cli(
        ["--rx", "-a", "-A", "--samplerate", "48000", "300",
         "-M", "1200", "-S", "2400"])
    assert code == 0, err
    assert out == b"LIVE ALSA AUTODETECT", (out, err)
    assert "### CARRIER" in err
