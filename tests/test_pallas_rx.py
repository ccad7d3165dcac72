"""Pallas megakernel receiver: interpret-mode event-for-event parity with
the XLA device receiver (the TPU-compiled path is round-2 work; see
ops/pallas_rx.py docstring)."""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.device_rx import DeviceReceiver


def _mega_vs_device(monkeypatch, m, waves, spec=None):
    """Assert event-for-event equality between the XLA device receiver
    and the (interpret-mode) megakernel for a batch of waveforms."""
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    if spec is not None:
        monkeypatch.setenv("MINIMODEM_TPU_SPEC", str(spec))

    from minimodem_tpu.ops import pallas_rx as P

    P.build_mega_rx.cache_clear()
    try:
        L = max(len(w) for w in waves)
        batch = np.zeros((len(waves), L), np.float32)
        for i, w in enumerate(waves):
            batch[i, :len(w)] = w
        totals = [len(w) for w in waves]

        ref_events, _ = DeviceReceiver(m.cfg).run_events_batch(
            batch, totals, 1.5, 2.3)
        mega_events, _ = P.MegaReceiver(m.cfg).run_events_batch(
            batch, totals, 1.5, 2.3)
        for i in range(len(waves)):
            assert len(ref_events[i]) == len(mega_events[i])
            for a, b in zip(ref_events[i], mega_events[i]):
                assert np.array_equal(a, b)
    finally:
        P.build_mega_rx.cache_clear()


@pytest.mark.smoke
def test_mega_interpret_parity(monkeypatch):
    m = FskModem("1200")
    payloads = [b"mega kernel parity", b"second stream, other text"]
    _mega_vs_device(monkeypatch, m, [m.modulate(p) for p in payloads])


@pytest.mark.parametrize("spec", [1, 2, 4, 8])
def test_mega_parity_spec_depths(monkeypatch, spec):
    """Speculative depths must not change decisions: clean signal plus a
    silence gap (carrier drop mid-stream) and a re-acquisition."""
    m = FskModem("1200")
    w1 = m.modulate(b"first burst")
    gap = np.zeros(m.cfg.sample_rate // 2, np.float32)
    w2 = m.modulate(b"second burst after silence")
    _mega_vs_device(monkeypatch, m,
                    [np.concatenate([w1, gap, w2])], spec=spec)


def test_mega_parity_noise(monkeypatch):
    """Noise forces fine rescans and mispredicted speculative frames; the
    commit chain must fall back to the sequential decisions exactly."""
    m = FskModem("1200")
    rng = np.random.default_rng(11)
    waves = []
    for seed, level in ((1, 0.2), (2, 0.4)):
        w = m.modulate(bytes(range(33, 127)))
        w = w + rng.uniform(-level, level, len(w)).astype(np.float32)
        waves.append(w.astype(np.float32))
    _mega_vs_device(monkeypatch, m, waves)


def test_mega_parity_rate_slop(monkeypatch):
    """Off-rate TX (timing drift) keeps fstart moving, so speculation
    mispredicts constantly — decisions must still match the device
    engine frame-for-frame."""
    w = FskModem("305").modulate(b"rate slop speculation check")
    _mega_vs_device(monkeypatch, FskModem("300"), [w])


def test_mega_parity_same_sync(monkeypatch):
    """SAME mode: do_rx_sync suppresses the 0xAB preamble bytes, so the
    byte ring advances non-contiguously on both the fast-commit and the
    per-frame paths."""
    m = FskModem("same")
    w = m.modulate(b"ZCZC-WXR-RWT-020103+0030-1051700-KEAX/NWS-")
    _mega_vs_device(monkeypatch, m, [w])


def test_mega_parity_long_stream(monkeypatch):
    """A >3-row byte payload: the lane-major byte ring must flush
    multiple completed rows and the final partial row, across several
    resident-window refills."""
    m = FskModem("1200")
    payload = bytes(33 + (i % 94) for i in range(400))
    _mega_vs_device(monkeypatch, m, [m.modulate(payload)])


@pytest.mark.parametrize("mode,payload", [
    ("rtty", b"RTTY QUICK BROWN FOX 123"),      # 45.45 bd, 1.5 stop bits
    ("tdd", b"TDD CHECK 456"),                  # 45.45 bd, 2 stop bits
    ("v.21", b"v21 parity text"),               # ITU V.21 300 bd
])
def test_mega_parity_fractional_timing(monkeypatch, mode, payload):
    """Fractional samples-per-bit (45.45 baud) and fractional stop bits
    must replay identically through the fast-commit chain."""
    m = FskModem(mode)
    _mega_vs_device(monkeypatch, m, [m.modulate(payload)])


def test_mega_streaming_carry(monkeypatch):
    """Round 3: the megakernel takes a streaming carry + finalize flag.
    A segmented decode riding it (DeviceStreamReceiver -> DeviceReceiver
    -> MegaReceiver, interpret mode) must match the one-shot XLA decode
    byte-for-byte AND stats-line-for-stats-line, including a carrier gap
    spanning a segment boundary (the analogue of the reference's sliding
    samplebuf, src/minimodem.c:1144-1174)."""
    import io

    from jax.experimental import pallas as pl

    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.ops.device_rx import DeviceStreamReceiver
    from minimodem_tpu.rx.engine import Receiver

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from minimodem_tpu.ops import pallas_rx as P

    P.build_mega_rx.cache_clear()
    try:
        m = FskModem("1200")
        p1, p2 = b"carry across segment boundaries", b"after the gap"
        gap = np.zeros(48000, np.float32)
        samples = np.concatenate(
            [m.modulate(p1), gap, m.modulate(p2)]).astype(np.float32)

        def render(parts):
            sink, errs = io.BytesIO(), []
            rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                          sink.write, errs.append)
            for p in parts:
                rx.render_events(*p)
            return sink.getvalue(), "".join(errs)

        # reference: wide XLA one-shot
        ref = DeviceReceiver(m.cfg, compact=False).run_events(
            samples, 1.5, 2.3)
        out1, err1 = render([ref])
        assert out1 == p1 + p2

        # mega streaming: force the mega route on the CPU backend
        monkeypatch.setenv("MINIMODEM_TPU_MEGAKERNEL", "1")
        sr = DeviceStreamReceiver(m.cfg, segment_len=1 << 15)
        assert sr.compact and sr.rx._mega is not None
        parts = []
        for off in range(0, len(samples), 20000):
            parts.append(sr.feed(samples[off:off + 20000]))
        parts.append(sr.finish())
        out2, err2 = render(parts)
        assert out2 == p1 + p2
        assert err1 == err2, (err1, err2)
    finally:
        P.build_mega_rx.cache_clear()


def test_mega_pipelined_carry(monkeypatch):
    """PipelinedReceiver's segmented path through the megakernel
    (interpret mode) must match its XLA-segment path byte-for-byte."""
    import io

    from jax.experimental import pallas as pl

    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.ops.device_rx import PipelinedReceiver
    from minimodem_tpu.rx.engine import Receiver

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from minimodem_tpu.ops import pallas_rx as P

    P.build_mega_rx.cache_clear()
    try:
        m = FskModem("1200")
        p1 = bytes(33 + (i % 94) for i in range(300))
        p2 = b"tail burst"
        gap = np.zeros(48000, np.float32)
        samples = np.concatenate(
            [m.modulate(p1), gap, m.modulate(p2)]).astype(np.float32)

        def render_all(run):
            sink, errs = io.BytesIO(), []
            rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                          sink.write, errs.append)
            for seg in run:
                rx.render_events(*seg)
            return sink.getvalue(), "".join(errs)

        monkeypatch.setenv("MINIMODEM_TPU_MEGAKERNEL", "0")
        pr = PipelinedReceiver(m.cfg, segment_len=1 << 16)
        assert len(samples) > pr.segment_len
        out1, err1 = render_all(pr.run(samples, 1.5, 2.3))
        assert out1 == p1 + p2

        monkeypatch.setenv("MINIMODEM_TPU_MEGAKERNEL", "1")
        pr2 = PipelinedReceiver(m.cfg, segment_len=1 << 16)
        out2, err2 = render_all(pr2.run(samples, 1.5, 2.3))
        assert out2 == p1 + p2
        assert err1 == err2, (err1, err2)
    finally:
        P.build_mega_rx.cache_clear()
