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
    from minimodem_tpu.ops.device_rx import DeviceReceiver

    texts = [b"parity check", b"abcdefgh" * 4]
    m, streams = _tx_batch(texts)
    L = max(len(s) for s in streams)
    x = np.zeros((2, L), np.float32)
    for i, s in enumerate(streams):
        x[i, :len(s)] = s
    totals = [len(s) for s in streams]

    svc = ShardedReceiver(m.cfg, mesh8)
    ev_sharded, _ = svc.run_events_batch(x, totals, 1.5, 2.3)

    single = DeviceReceiver(m.cfg, compact=False)
    ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3)

    assert len(ev_sharded) == len(ev_single)
    for (t_s, p_s), (t_1, p_1) in zip(ev_sharded, ev_single):
        np.testing.assert_array_equal(t_s, t_1)
        np.testing.assert_array_equal(p_s, p_1)


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
    single = DeviceReceiver(m.cfg, compact=False)
    ev_single, _ = single.run_events_batch(x, totals, 1.5, 2.3)
    for (t_s, p_s), (t_1, p_1) in zip(ev_sharded, ev_single):
        np.testing.assert_array_equal(t_s, t_1)
        np.testing.assert_array_equal(p_s, p_1)


def test_batch_padding_to_dp(mesh8):
    # 3 streams on an 8-wide dp axis: rows pad with silence and drop
    texts = [b"a", b"bb", b"ccc"]
    m, streams = _tx_batch(texts)
    svc = ShardedReceiver(m.cfg, mesh8)
    outs, stats = svc.decode_batch(streams)
    assert outs == texts
    assert stats["frames_total"] == 6
