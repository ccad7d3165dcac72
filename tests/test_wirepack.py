"""Lossless delta-bitpack wire transport (ops/wirepack.py).

The packed wire must be BIT-EXACT to the raw int16 wire after
device-side reconstruction — decode decisions, bytes, and stats are
then identical by construction; these tests pin the round-trip
property (base width + exception scatter), the tail-mask parity rule,
and full-receiver byte/event equality on both the one-shot and the
segmented pipeline paths (including the per-segment raw fallback for
content whose exceptions exceed the stream's capacity).
"""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops import wirepack as wp
from minimodem_tpu.ops.device_rx import PipelinedReceiver


def _tone(freq, n, amp=32000.0, rate=48000):
    return (np.sin(2 * np.pi * freq / rate * np.arange(n))
            * amp).astype(np.int16)


def _unpack(wire, totals, k, w, n_packed, e_cap, n_target, extra=0):
    import jax.numpy as jnp

    if len(wire) % 2 == 0:
        wire = wire.view(np.int16)          # int16-framed upload path
    return np.asarray(wp.unpack_expand(
        jnp.asarray(wire[None, :]),
        jnp.asarray(np.asarray([totals], np.int32)),
        k, w, n_packed, e_cap, n_target, extra))[0]


def test_round_trip_exact_tone_silence_escape():
    tone = _tone(2200, 48000)
    sil = np.zeros(9000, np.int16)
    esc = np.array([0, 0, 0, 0, 32767, -32768, 32767, -32768] * 40,
                   np.int16)
    for x in (tone, sil, esc):
        for k in range(wp.MAX_ORDER + 1):
            for w in (8, 12):
                e_cap = wp.exc_capacity(wp.count_exceptions(x, k, w))
                n_target = len(x) + 777
                wire = wp.pack(x, n_target, k, w, e_cap)
                out = _unpack(wire, len(x), k, w, n_target, e_cap,
                              n_target)
                ref = np.zeros(n_target, np.float32)
                ref[:len(x)] = x.astype(np.float32) / 32768.0
                assert np.array_equal(out, ref), (k, w, len(x))


def test_round_trip_randomized_cuts_and_extras():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(50, 4000))
        amp = int(rng.integers(1, 32000))
        x = (np.sin(np.linspace(0, rng.uniform(1, 300), n))
             * amp).astype(np.int16)
        x[rng.integers(0, n, 5)] = rng.integers(
            -32768, 32768, 5).astype(np.int16)
        k = int(rng.integers(0, wp.MAX_ORDER + 1))
        w = int(rng.choice([6, 8, 10, 12, 14]))
        n_packed = n + int(rng.integers(0, 300))
        cut = int(rng.integers(1, n))
        extra = int(rng.integers(0, n - cut + 1))
        n_target = n_packed + int(rng.integers(0, 500))
        e_cap = wp.exc_capacity(wp.count_exceptions(x, k, w))
        wire = wp.pack(x, n_packed, k, w, e_cap)
        out = _unpack(wire, cut, k, w, n_packed, e_cap, n_target,
                      extra)
        ref = np.zeros(n_target, np.float32)
        m = min(cut + extra, n)
        ref[:m] = x[:m].astype(np.float32) / 32768.0
        ref[cut + extra:] = 0.0
        assert np.array_equal(out, ref), (trial, k, w, cut, extra)


def test_exception_overflow_raises():
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32768, 4000).astype(np.int16)
    with pytest.raises(ValueError):
        wp.pack(x, 4000, 2, 6, 16)


def test_chooser_fallbacks():
    rng = np.random.default_rng(3)
    assert wp.choose_params(
        rng.integers(-32768, 32768, 5000).astype(np.int16)) is None
    # float input never packs
    assert wp.choose_params(np.zeros(5000, np.float32)) is None
    # a tone packs well below the raw wire
    p = wp.choose_params(_tone(2200, 48000))
    assert p is not None
    k, w = p
    assert w <= 12


def _modem_signal(reps=4):
    m = FskModem("1200")
    payload = (b"the quick brown fox jumps over the lazy dog 0123456789\n"
               * reps)
    s = m.modulate(payload)
    s16 = np.clip(np.rint(s * 32768.0), -32768,
                  32767).astype(np.int16)
    return m, payload, s16


@pytest.mark.smoke
def test_one_shot_decode_parity():
    m, payload, s16 = _modem_signal()
    raw, ev_raw = m.demodulate(s16, return_events=True, wire_pack=False)
    pk, ev_pk = m.demodulate(s16, return_events=True, wire_pack=True)
    assert raw == pk == payload
    assert ev_raw == ev_pk


def test_one_shot_bucketed_lengths():
    """One-shot packed decodes of nearby lengths share one executable:
    the spec token buckets n_packed to the RX builder's pow2 bucket, so
    the shortfall (held deltas past the real samples) must stay masked
    past totals — decode and events identical to the raw wire at BOTH
    a bucket-aligned and a mid-bucket length."""
    m, payload, s16 = _modem_signal()
    for cut in (len(s16), len(s16) - 12345):
        x = s16[:cut]
        raw, ev_raw = m.demodulate(x, return_events=True, wire_pack=False)
        pk, ev_pk = m.demodulate(x, return_events=True, wire_pack=True)
        assert raw == pk
        assert ev_raw == ev_pk


def test_segmented_decode_parity():
    m, payload, s16 = _modem_signal()
    per = {}
    for wpk in (False, True):
        rx = PipelinedReceiver(m.cfg, "auto", False, segment_len=1 << 15)
        per[wpk] = [tuple(np.asarray(a).tobytes() for a in o)
                    for o in rx.run(s16, 1.5, 2.3, wire_pack=wpk)]
    assert per[False] == per[True]
    assert len(per[True]) >= 3


def test_segmented_raw_fallback_parity():
    """A segment of incompressible noise mid-stream overflows the
    exception capacity set by segment 0 and must fall back to the raw
    int16 wire for that segment only — decode output identical."""
    m, payload, s16 = _modem_signal(reps=2)
    rng = np.random.default_rng(11)
    seg = 1 << 15
    sig = np.concatenate([
        s16, np.zeros(seg // 2, np.int16),
        rng.integers(-32768, 32768, 2 * seg).astype(np.int16),
        np.zeros(seg // 2, np.int16), s16]).astype(np.int16)
    per = {}
    for wpk in (False, True):
        rx = PipelinedReceiver(m.cfg, "auto", False, segment_len=seg)
        per[wpk] = [tuple(np.asarray(a).tobytes() for a in o)
                    for o in rx.run(sig, 1.5, 2.3, wire_pack=wpk)]
    assert per[False] == per[True]


def _native_lib():
    lib = wp._native()
    if lib is None:
        pytest.skip("native wirepack unavailable")
    return lib


def test_native_pack_byte_parity():
    """mm_wirepack_pack emits the exact bytes of the NumPy reference
    packer for tones, silence, escapes, and random cuts/params."""
    _native_lib()
    rng = np.random.default_rng(19)
    cases = [_tone(2200, 48000), np.zeros(9000, np.int16),
             np.array([0, 0, 0, 0, 32767, -32768, 32767, -32768] * 40,
                      np.int16)]
    for _ in range(15):
        n = int(rng.integers(50, 4000))
        x = (np.sin(np.linspace(0, rng.uniform(1, 300), n))
             * int(rng.integers(1, 32000))).astype(np.int16)
        x[rng.integers(0, n, 5)] = rng.integers(
            -32768, 32768, 5).astype(np.int16)
        cases.append(x)
    for i, x in enumerate(cases):
        for k in (0, 2, wp.MAX_ORDER):
            for w in (6, 8, 12):
                e_cap = wp.exc_capacity(wp.count_exceptions(x, k, w))
                n_packed = len(x) + int(rng.integers(0, 300))
                a = wp.pack(x, n_packed, k, w, e_cap)
                b = wp._pack_py(x, n_packed, k, w, e_cap)
                assert np.array_equal(a, b), (i, k, w)


def test_native_count_and_scan_parity():
    """mm_wirepack_count matches the NumPy count (incl. >65535-gap
    dummies), and mm_wirepack_scan reproduces the chooser's per-(k, w)
    exception counts so choose_params picks identical params."""
    import ctypes

    lib = _native_lib()
    rng = np.random.default_rng(23)
    # a >65535 gap between exceptions forces dummy records
    gap = np.zeros(70000, np.int16)
    gap[10] = 32000
    gap[69990] = -32000
    cases = [_tone(2200, 48000), gap,
             rng.integers(-2000, 2000, 5000).astype(np.int16)]
    for x in cases:
        for k in (0, 1, 3):
            for w in (6, 8):
                body = wp.delta_encode(x, k)[k:]
                pos = np.nonzero(np.abs(body) >= (1 << (w - 1)))[0]
                ref = (len(wp._with_dummies(pos, body)[0])
                       if len(pos) else 0)
                got = int(lib.mm_wirepack_count(
                    np.ascontiguousarray(x).ctypes.data_as(
                        ctypes.c_void_p), len(x), k, w))
                assert got == ref, (k, w)
        # scan vs the NumPy chooser scoring loop
        counts = np.zeros((wp.MAX_ORDER + 1, len(wp._WIDTHS)), np.int64)
        lib.mm_wirepack_scan(
            np.ascontiguousarray(x).ctypes.data_as(ctypes.c_void_p),
            len(x), wp.MAX_ORDER,
            counts.ctypes.data_as(ctypes.c_void_p))
        a = x.astype(np.int32)
        for k in range(wp.MAX_ORDER + 1):
            if k:
                a = np.concatenate([a[:1], np.diff(a)])
            ab = np.abs(a[k:])
            for wi, w in enumerate(wp._WIDTHS):
                assert int(counts[k, wi]) == int(
                    (ab >= (1 << (w - 1))).sum()), (k, w)


def test_demodulate_kwarg_and_env(monkeypatch):
    m, payload, s16 = _modem_signal(reps=1)
    monkeypatch.setenv("MINIMODEM_TPU_WIREPACK", "1")
    assert wp.default_on()
    assert m.demodulate(s16) == payload
    monkeypatch.setenv("MINIMODEM_TPU_WIREPACK", "0")
    assert not wp.default_on()
    assert m.demodulate(s16) == payload
