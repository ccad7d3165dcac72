"""Batched multi-stream decode: B concurrent streams in one device program
must each match their single-stream decode exactly."""

import io

import numpy as np

from minimodem_tpu.codecs import Ascii8Codec, get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.device_rx import DeviceLoopback, DeviceReceiver
from minimodem_tpu.ops.tx_device import tx_bit_schedule
from minimodem_tpu.rx.engine import Receiver


def _render(cfg, *event_parts):
    sink = io.BytesIO()
    rx = Receiver(cfg, RxOptions(), get_codec("ascii8"),
                  sink.write, lambda s: None)
    rx.render_events(*event_parts)
    return sink.getvalue()


def test_batched_receiver_matches_single():
    m = FskModem("1200")
    payloads = [
        b"stream zero: hello",
        b"stream one has a different, longer payload 0123456789",
        b"s2",
        bytes(range(33, 100)),
    ]
    waves = [m.modulate(p) for p in payloads]
    L = max(len(w) for w in waves)
    batch = np.zeros((len(waves), L), np.float32)
    for i, w in enumerate(waves):
        batch[i, :len(w)] = w
    totals = [len(w) for w in waves]

    rxer = DeviceReceiver(m.cfg)
    events, _ = rxer.run_events_batch(batch, totals, 1.5, 2.3)
    for i, p in enumerate(payloads):
        got = _render(m.cfg, *events[i])
        assert got == p, (i, got, p)
        # single-stream must agree exactly (every event-tuple part)
        single = rxer.run_events(waves[i], 1.5, 2.3)
        for a, b in zip(single, events[i]):
            assert np.array_equal(a, b)


def test_batched_loopback():
    m = FskModem("1200")
    payloads = [b"alpha stream", b"beta stream, longer than alpha"]
    scheds = [tx_bit_schedule(p, m.cfg, Ascii8Codec()) for p in payloads]
    lb = DeviceLoopback(m.cfg)
    events = lb.run_events_batch(scheds)
    for i, p in enumerate(payloads):
        assert _render(m.cfg, *events[i]) == p


def test_pipelined_dispatch_collect_matches_sync():
    """The async serving loop (dispatch batch j+1 before collecting
    batch j — bench.py's pipelined configuration) must return exactly
    what the synchronous call returns, batch for batch."""
    m = FskModem("1200")
    sets = [
        [b"pipe batch 0 stream A", b"pb0 B"],
        [b"pipe batch 1 stream A, different text", b"pb1 B!"],
        [b"third batch", b"3rd, stream two"],
    ]
    scheds = [[tx_bit_schedule(p, m.cfg, Ascii8Codec()) for p in ps]
              for ps in sets]
    lb = DeviceLoopback(m.cfg)
    sync = [lb.run_events_batch(s) for s in scheds]

    handles = []
    results = []
    for j, s in enumerate(scheds):
        handles.append(lb.dispatch_events_batch(s))
        if j >= 1:
            lb.prefetch_events_batch(handles[j - 1])
        if j >= 2:
            results.append(lb.collect_events_batch(handles[j - 2]))
    for h in handles[-2:]:
        results.append(lb.collect_events_batch(h))

    for j, ps in enumerate(sets):
        for i, p in enumerate(ps):
            assert _render(m.cfg, *results[j][i]) == p
            for a, b in zip(sync[j][i], results[j][i]):
                assert np.array_equal(a, b)


def test_chained_wide_collect_slices_prefix():
    """The wide-event chained collect must fetch only the used event
    prefix (the full [K, 8, B, max_events] log is hundreds of MB on the
    host link for long audio) and return exactly what full-buffer
    unpacking returns."""
    import jax.numpy as jnp

    from minimodem_tpu.ops.device_rx import unpack_events

    rng = np.random.default_rng(7)
    K, B, E = 3, 2, 512
    ev = rng.integers(0, 1 << 16, size=(K, 8, B, E)).astype(np.uint32)
    n = np.array([[3, 0], [5, 2], [1, 4]], np.int32)
    lb = DeviceLoopback(FskModem("1200").cfg)
    got = lb.collect_events_chain(
        ((jnp.asarray(ev), jnp.asarray(n)), K, B, False))
    assert len(got) == K * B
    for k in range(K):
        for i in range(B):
            want = unpack_events(ev[k][:, i, :], int(n[k, i]))
            for a, b in zip(got[k * B + i], want):
                assert np.array_equal(a, b)


def test_chain_rejects_single_subbatch():
    """K=1 chains would compile the unchained loop and fail with a shape
    error at call time; the dispatcher must reject them up front."""
    import pytest

    m = FskModem("1200")
    lb = DeviceLoopback(m.cfg)
    sched = tx_bit_schedule(b"one", m.cfg, Ascii8Codec())
    with pytest.raises(AssertionError, match=">= 2 sub-batches"):
        lb.dispatch_events_chain([[sched]])


def test_chained_batches_match_sync():
    """K batches executed as ONE device program (lax.scan chain —
    DeviceLoopback.run_events_chain) must return exactly what K
    separate synchronous calls return, stream for stream."""
    m = FskModem("1200")
    sets = [
        [b"chain batch 0 stream A", b"cb0 B"],
        [b"chain batch 1 stream A, different text", b"cb1 B!"],
        [b"chain batch 2", b"2nd str"],
    ]
    scheds = [[tx_bit_schedule(p, m.cfg, Ascii8Codec()) for p in ps]
              for ps in sets]
    lb = DeviceLoopback(m.cfg)
    sync = [lb.run_events_batch(s) for s in scheds]

    flat = lb.run_events_chain(scheds)
    assert len(flat) == sum(len(ps) for ps in sets)
    for j, ps in enumerate(sets):
        for i, p in enumerate(ps):
            got = flat[j * len(ps) + i]
            assert _render(m.cfg, *got) == p
            for a, b in zip(sync[j][i], got):
                assert np.array_equal(a, b)
