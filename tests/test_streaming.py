"""Streaming decode: feeding audio in arbitrary-size segments must produce
exactly the same event stream as one-shot decode (state carries across
segment boundaries on device)."""

import io

import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.device_rx import (
    DeviceReceiver,
    DeviceStreamReceiver,
    PipelinedReceiver,
)
from minimodem_tpu.rx.engine import Receiver


def _render(cfg, ev_t, ev_p):
    sink = io.BytesIO()
    events = []
    rx = Receiver(cfg, RxOptions(), get_codec("ascii8"),
                  sink.write, events.append)
    rx.render_events(ev_t, ev_p)
    return sink.getvalue(), "".join(events)


def _render_parts(cfg, parts):
    """Render a sequence of event tuples (wide 2-tuples or compact
    3-tuples) through one Receiver; returns (bytes, stderr)."""
    sink = io.BytesIO()
    events = []
    rx = Receiver(cfg, RxOptions(), get_codec("ascii8"),
                  sink.write, events.append)
    for p in parts:
        rx.render_events(*p)
    return sink.getvalue(), "".join(events)


@pytest.mark.parametrize("feed_size", [4096, 30000])
def test_streaming_matches_oneshot(feed_size):
    m = FskModem("1200")
    payload = bytes((33 + (i % 94)) for i in range(600))
    samples = m.modulate(payload)

    one = DeviceReceiver(m.cfg, compact=False)
    ev_t1, ev_p1 = one.run_events(samples, 1.5, 2.3)
    out1, ev1 = _render(m.cfg, ev_t1, ev_p1)
    assert out1 == payload

    # streaming is compact by default now (round 3: events+bytes with
    # per-segment byte-position rebasing); bytes AND stats lines must
    # match the wide one-shot decode
    sr = DeviceStreamReceiver(m.cfg, segment_len=1 << 15)
    assert sr.compact
    parts = []
    for off in range(0, len(samples), feed_size):
        parts.append(sr.feed(samples[off:off + feed_size]))
    parts.append(sr.finish())
    out2, ev2 = _render_parts(m.cfg, parts)

    assert out2 == payload
    assert ev1 == ev2, (ev1, ev2)


@pytest.mark.parametrize("feed_size", [4096, 30000])
def test_streaming_wide_matches_oneshot(feed_size):
    """The wide (non-compact) streaming path stays decision-exact too —
    it serves stop_on_overflow (-a) and wide-word geometries."""
    m = FskModem("1200")
    payload = bytes((33 + (i % 94)) for i in range(600))
    samples = m.modulate(payload)

    one = DeviceReceiver(m.cfg, compact=False)
    ev_t1, ev_p1 = one.run_events(samples, 1.5, 2.3)

    sr = DeviceStreamReceiver(m.cfg, segment_len=1 << 15)
    sr.rx = DeviceReceiver(m.cfg, compact=False)
    sr.compact = False
    parts_t, parts_p = [], []
    for off in range(0, len(samples), feed_size):
        et, ep = sr.feed(samples[off:off + feed_size])
        parts_t.append(et)
        parts_p.append(ep)
    et, ep = sr.finish()
    parts_t.append(et)
    parts_p.append(ep)
    ev_t2 = np.concatenate(parts_t)
    ev_p2 = np.concatenate(parts_p)

    assert np.array_equal(ev_t1, ev_t2)
    assert np.array_equal(ev_p1, ev_p2)


@pytest.mark.parametrize("dtype", [np.float32, np.int16, "alaw"])
def test_pipelined_matches_oneshot(dtype):
    """The segmented/pipelined receiver must produce the same bytes and
    stats as the one-shot decode, including a carrier gap that spans a
    segment boundary.  The "alaw" case feeds the raw-u8 wire: non-final
    segments carry real lookahead samples past the scan bound, which
    the u8 tail mask must NOT clip (expand_wire's u8_extra)."""
    m = FskModem("1200")
    p1 = bytes((33 + (i % 94)) for i in range(400))
    p2 = b"after the gap"
    gap = np.zeros(48000, np.float32)
    samples = np.concatenate([m.modulate(p1), gap, m.modulate(p2)])
    enc = None
    if dtype == np.int16:
        samples = np.clip(samples * 32768.0, -32768, 32767).astype(np.int16)
    elif dtype == "alaw":
        from minimodem_tpu.sigio.containers import _alaw_encode

        enc = "alaw"
        samples = _alaw_encode(np.clip(
            np.rint(samples * 32768.0), -32768, 32767).astype(np.int16))

    def render_all(run):
        sink = io.BytesIO()
        errs = []
        rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                      sink.write, errs.append)
        for seg in run:
            rx.render_events(*seg)
        return sink.getvalue(), "".join(errs)

    one = PipelinedReceiver(m.cfg)     # segment > stream: one-shot path
    out1, err1 = render_all(one.run(samples, 1.5, 2.3, in_encoding=enc))
    if enc is None:
        assert out1 == p1 + p2
    else:
        # G.711 is lossy; the invariant here is segmented == one-shot
        assert len(out1) > 0

    seg = PipelinedReceiver(m.cfg, segment_len=1 << 16)
    assert len(samples) > 3 * seg.segment_len  # force multiple segments
    out2, err2 = render_all(seg.run(samples, 1.5, 2.3, in_encoding=enc))
    assert out2 == out1
    assert err1 == err2, (err1, err2)


def test_streaming_multiple_carriers():
    """Silence gaps force carrier drops; streaming must reproduce the same
    carrier/nocarrier event sequence."""
    m = FskModem("1200")
    p1, p2 = b"first burst", b"second burst"
    gap = np.zeros(48000, np.float32)  # 1s silence -> carrier drop
    samples = np.concatenate([m.modulate(p1), gap, m.modulate(p2)])

    one = DeviceReceiver(m.cfg, compact=False)
    ev_t1, ev_p1 = one.run_events(samples, 1.5, 2.3)
    out1, ev1 = _render(m.cfg, ev_t1, ev_p1)
    assert out1 == p1 + p2
    assert ev1.count("NOCARRIER") == 2

    sr = DeviceStreamReceiver(m.cfg, segment_len=1 << 15)
    parts = []
    for off in range(0, len(samples), 20000):
        parts.append(sr.feed(samples[off:off + 20000]))
    parts.append(sr.finish())
    out2, ev2 = _render_parts(m.cfg, parts)
    assert out2 == p1 + p2
    assert ev1 == ev2
