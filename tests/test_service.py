"""Multi-chip decode service (parallel/service.py): dp-sharded full
decode on the virtual 8-device CPU mesh — byte parity with the
single-chip DeviceReceiver, fleet stats psum, batch padding."""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.parallel.service import ShardedReceiver
from minimodem_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest re-exec)")
    return make_mesh(8, dp=8, sp=1)


def _tx_batch(texts):
    m = FskModem("1200")
    streams = [m.modulate(t) for t in texts]
    return m, streams


@pytest.mark.smoke
def test_decode_batch_parity(mesh8):
    texts = [b"stream zero", b"stream one is longer",
             b"s2", b"stream three ~!@#", b"stream four 44444"]
    m, streams = _tx_batch(texts)
    svc = ShardedReceiver(m.cfg, mesh8)
    outs, stats = svc.decode_batch(streams)
    assert outs == texts
    assert stats["devices"] == 8
    assert stats["frames_total"] == sum(len(t) for t in texts)
    assert stats["mean_confidence"] > 1.5
    assert stats["events_total"] >= 2 * len(texts)  # CARRIER+NOCARRIER


def test_events_match_single_chip(mesh8):
    """The sharded service runs the PRODUCTION (compact) receiver: its
    per-stream results — event log AND on-device-decoded byte stream —
    must equal the single-chip compact DeviceReceiver's exactly."""
    from minimodem_tpu.ops.device_rx import DeviceReceiver

    texts = [b"parity check", b"abcdefgh" * 4]
    m, streams = _tx_batch(texts)
    L = max(len(s) for s in streams)
    x = np.zeros((2, L), np.float32)
    for i, s in enumerate(streams):
        x[i, :len(s)] = s
    totals = [len(s) for s in streams]

    svc = ShardedReceiver(m.cfg, mesh8)
    assert svc.compact
    ev_sharded, _ = svc.run_events_batch(x, totals, 1.5, 2.3)

    single = DeviceReceiver(m.cfg)          # compact auto, like the svc
    assert single.compact
    ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3)

    assert len(ev_sharded) == len(ev_single)
    for tup_s, tup_1 in zip(ev_sharded, ev_single):
        assert len(tup_s) == len(tup_1) == 3    # compact: +byte stream
        for a, b in zip(tup_s, tup_1):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("enc", [None, "ulaw"])
def test_mega_ingest_matches_single_chip(mesh8, monkeypatch, enc):
    """The dp-only fleet INGEST path (samples/u8 in) rides the same
    megakernel program as the single-chip samples receiver
    (ops/device_rx.py DeviceReceiver): interpret-mode mega under
    shard_map must be event- and byte-exact vs the XLA single chip."""
    from jax.experimental import pallas as pl

    from minimodem_tpu.ops import pallas_rx as P
    from minimodem_tpu.ops.device_rx import DeviceReceiver

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setenv("MINIMODEM_TPU_MEGAKERNEL", "1")
    P.build_mega_rx.cache_clear()
    try:
        texts = [b"fleet mega ingest", b"stream two ~!@#", b"s3"]
        m, streams = _tx_batch(texts)
        if enc == "ulaw":
            from minimodem_tpu.sigio.containers import _ulaw_encode

            streams = [
                _ulaw_encode(np.clip(np.rint(s * 32768.0), -32768,
                                     32767).astype(np.int16))
                for s in streams]
        L = max(len(s) for s in streams)
        x = np.zeros((len(streams), L),
                     np.uint8 if enc else np.float32)
        for i, s in enumerate(streams):
            x[i, :len(s)] = s
        totals = [len(s) for s in streams]

        svc = ShardedReceiver(m.cfg, mesh8)
        assert svc.use_mega
        ev_sharded, _ = svc.run_events_batch(x, totals, 1.5, 2.3,
                                             in_encoding=enc)

        # apples to apples: the single-chip samples receiver with the
        # megakernel ON — the exact program the fleet shards
        single = DeviceReceiver(m.cfg)
        assert single._mega is not None
        ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3,
                                               in_encoding=enc)

        assert len(ev_sharded) == len(ev_single)
        for tup_s, tup_1 in zip(ev_sharded, ev_single):
            assert len(tup_s) == len(tup_1) == 3
            for a, b in zip(tup_s, tup_1):
                np.testing.assert_array_equal(a, b)

        # and the decision-exact contract vs the XLA engine: identical
        # decoded bytes (engines may differ in the last ulp of the
        # NOCARRIER ampl sum on G.711-expanded values — the parity
        # contract is bytes + stats lines, tests/test_engines.py)
        monkeypatch.setenv("MINIMODEM_TPU_MEGAKERNEL", "0")
        xla = DeviceReceiver(m.cfg)
        assert xla._mega is None
        ev_xla, _ = xla.run_events_batch(x, totals, 1.5, 2.3,
                                         in_encoding=enc)
        for tup_s, tup_x, want in zip(ev_sharded, ev_xla, texts):
            np.testing.assert_array_equal(tup_s[0], tup_x[0])  # types
            assert bytes(np.asarray(tup_s[2], np.uint8)) \
                == bytes(np.asarray(tup_x[2], np.uint8))
    finally:
        P.build_mega_rx.cache_clear()


def test_compact_vs_wide_service_equality(mesh8):
    """compact (production) and wide event modes of the sharded service
    must agree: same carrier-transition events, same decoded bytes, same
    fleet stats."""
    texts = [b"compact-vs-wide stream A", b"B" * 30, b"third ~!@#"]
    m, streams = _tx_batch(texts)
    svc_c = ShardedReceiver(m.cfg, mesh8)
    svc_w = ShardedReceiver(m.cfg, mesh8, compact=False)
    assert svc_c.compact and not svc_w.compact

    outs_c, stats_c = svc_c.decode_batch(streams)
    outs_w, stats_w = svc_w.decode_batch(streams)
    assert outs_c == outs_w == texts
    # events_total counts raw log records: wide logs one per frame,
    # compact only carrier transitions — the rest must agree exactly
    for k in ("devices", "frames_total", "mean_confidence"):
        assert stats_c[k] == stats_w[k], k
    assert stats_c["events_total"] <= stats_w["events_total"]

    L = max(len(s) for s in streams)
    x = np.zeros((len(streams), L), np.float32)
    for i, s in enumerate(streams):
        x[i, :len(s)] = s
    totals = [len(s) for s in streams]
    ev_c, _ = svc_c.run_events_batch(x, totals, 1.5, 2.3)
    ev_w, _ = svc_w.run_events_batch(x, totals, 1.5, 2.3)
    from minimodem_tpu.ops.device_rx import EV_FRAME

    for tup_c, tup_w in zip(ev_c, ev_w):
        # compact logs only carrier transitions (frames live in the byte
        # stream): wide's control events must match type-for-type
        keep = tup_w[0] != EV_FRAME
        np.testing.assert_array_equal(tup_c[0], tup_w[0][keep])


@pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (1, 8)])
def test_sp_sharded_full_decode(dp, sp):
    """sp-sharded scoring + all_gather + replicated state machine must
    be byte- and event-exact vs the single-chip receiver."""
    import jax

    from minimodem_tpu.ops.device_rx import DeviceReceiver

    if len(jax.devices()) < dp * sp:
        pytest.skip("needs the 8-device CPU mesh (conftest re-exec)")
    mesh = make_mesh(dp * sp, dp=dp, sp=sp)
    texts = [b"sequence parallel stream zero",
             b"sp stream one ~!@#$%^&*()", b"x" * 40]
    m, streams = _tx_batch(texts)
    svc = ShardedReceiver(m.cfg, mesh)
    outs, stats = svc.decode_batch(streams)
    assert outs == texts
    assert stats["frames_total"] == sum(len(t) for t in texts)

    L = max(len(s) for s in streams)
    x = np.zeros((len(streams), L), np.float32)
    for i, s in enumerate(streams):
        x[i, :len(s)] = s
    totals = [len(s) for s in streams]
    ev_sharded, _ = svc.run_events_batch(x, totals, 1.5, 2.3)
    single = DeviceReceiver(m.cfg)          # compact auto, like the svc
    ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3)
    for tup_s, tup_1 in zip(ev_sharded, ev_single):
        assert len(tup_s) == len(tup_1) == 3
        for a, b in zip(tup_s, tup_1):
            np.testing.assert_array_equal(a, b)


def test_sp_sharded_dual_expect_same_mode():
    """SAME (--sync-byte) is dual-expect: the sp path must keep the full
    8-channel gather (the slim 3-channel re-alias only serves
    single-expect geometries) and still match the single chip."""
    import jax

    from minimodem_tpu.ops.device_rx import DeviceReceiver

    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    mesh = make_mesh(4, dp=2, sp=2)
    m = FskModem("same")
    texts = [b"ZCZC-WXR-RWT-000000+", b"NNNN"]
    streams = [m.modulate(t) for t in texts]
    svc = ShardedReceiver(m.cfg, mesh)
    outs, stats = svc.decode_batch(streams)
    assert outs == texts

    L = max(len(s) for s in streams)
    x = np.zeros((len(streams), L), np.float32)
    for i, s in enumerate(streams):
        x[i, :len(s)] = s
    totals = [len(s) for s in streams]
    ev_sharded, _ = svc.run_events_batch(x, totals, 1.5, 2.3)
    single = DeviceReceiver(m.cfg)
    ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3)
    for tup_s, tup_1 in zip(ev_sharded, ev_single):
        for a, b in zip(tup_s, tup_1):
            np.testing.assert_array_equal(a, b)


def test_sharded_loopback_matches_device_loopback(mesh8):
    """ShardedLoopback runs DeviceLoopback's exact per-chip program
    under shard_map: every result part (events, payloads, byte streams)
    must match the single-chip loopback stream-for-stream, including
    dp-padding with empty streams (5 streams on an 8-wide mesh)."""
    from minimodem_tpu.codecs import Ascii8Codec
    from minimodem_tpu.ops.device_rx import DeviceLoopback
    from minimodem_tpu.ops.tx_device import tx_bit_schedule
    from minimodem_tpu.parallel.service import ShardedLoopback

    m = FskModem("1200")
    payloads = [b"fleet stream zero", b"fs1", b"fleet stream two ~!@#",
                b"D" * 40, b"fleet stream four"]
    scheds = [tx_bit_schedule(p, m.cfg, Ascii8Codec()) for p in payloads]

    flb = ShardedLoopback(m.cfg, mesh8)
    ev_fleet = flb.run_events_batch(scheds)
    lb = DeviceLoopback(m.cfg)
    ev_single = lb.run_events_batch(scheds)

    assert len(ev_fleet) == len(ev_single) == len(payloads)
    for tup_f, tup_1 in zip(ev_fleet, ev_single):
        assert len(tup_f) == len(tup_1)
        for a, b in zip(tup_f, tup_1):
            np.testing.assert_array_equal(a, b)


def test_batch_padding_to_dp(mesh8):
    # 3 streams on an 8-wide dp axis: rows pad with silence and drop
    texts = [b"a", b"bb", b"ccc"]
    m, streams = _tx_batch(texts)
    svc = ShardedReceiver(m.cfg, mesh8)
    outs, stats = svc.decode_batch(streams)
    assert outs == texts
    assert stats["frames_total"] == 6
