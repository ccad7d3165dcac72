"""Multi-chip sharded demodulation.

The reference is single-threaded C with no distributed layer (SURVEY.md
section 2: "Parallelism / distributed components — explicitly: NONE"), so
nothing here is required for parity; this is the TPU-native throughput
headroom layer: scale decode across chips with `jax.sharding` + shard_map
over a Mesh, XLA collectives riding ICI.

Two axes:
- "dp"  (data parallel): independent audio streams (batch rows).  No
  communication — each chip scores its rows.
- "sp"  (sequence parallel): the time axis of each stream is split across
  chips.  Scoring offset t needs samples [t, t + halo), so each chip
  fetches a `halo` overlap region from its right neighbor with a single
  `lax.ppermute` — the 1-D halo-exchange pattern.

The "decode step" = sharded scoring + a psum'd stats reduction; it is this
framework's analogue of a training step for the multi-chip dry run.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModemConfig
from ..ops.demod import _build_score_fn, geometry_from_config


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              sp: Optional[int] = None) -> Mesh:
    """Build a ("dp", "sp") mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and sp is None:
        # favor sequence parallelism for single-stream decode throughput
        sp = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // sp
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != n({n})"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def sharded_score_fn(cfg: ModemConfig, mesh: Mesh, t_local: int,
                     precision: str = "auto"):
    """Build a jitted, mesh-sharded scorer.

    Input:  samples [B, sp * t_local + halo] — each stream row is scored at
            sp * t_local candidate offsets; B must divide the "dp" axis.
    Output: dict of [B, sp * t_local] per-offset arrays (conf/ampl/bits),
            plus a scalar stats vector psum'd over the whole mesh.

    Layout: rows sharded over "dp", time sharded over "sp".  Each sp shard
    holds t_local offsets and ppermute-fetches `halo` samples of overlap
    from its right neighbor (the overscan/expect window of frames that
    straddle the shard boundary).
    """
    geo = geometry_from_config(cfg, precision)
    halo = geo.halo
    if halo > t_local:
        raise ValueError(
            f"halo ({halo}) exceeds the per-shard length t_local "
            f"({t_local}): the single-neighbor halo exchange cannot "
            "serve this geometry — increase t_local")
    score = _build_score_fn(geo, t_local, None)
    sp_size = mesh.shape["sp"]

    def local_fn(x_local):
        # x_local: [B_local, t_local (+ halo only on the last shard)]
        # fetch the halo region from the right neighbor over ICI
        lead = x_local[:, :halo]
        left_halo = jax.lax.ppermute(
            lead, "sp",
            [(i, (i - 1) % sp_size) for i in range(sp_size)])
        # the last shard has no right neighbor: its halo must be zeros
        # (matching the unsharded scorer, which zero-pads past the chunk),
        # not shard 0's samples that the circular ppermute delivered
        is_last = jax.lax.axis_index("sp") == sp_size - 1
        left_halo = jnp.where(is_last, jnp.zeros_like(left_halo), left_halo)
        x_ext = jnp.concatenate([x_local[:, :t_local], left_halo], axis=1)
        out = jax.vmap(score)(x_ext)
        # mesh-wide stats: candidate-weighted mean confidence (collective)
        conf_sum = jax.lax.psum(jnp.sum(out["conf_data"]), ("dp", "sp"))
        n_off = jax.lax.psum(
            jnp.float32(out["conf_data"].size), ("dp", "sp"))
        out["mean_conf"] = conf_sum / n_off
        return out

    out_specs = {
        "conf_data": P("dp", "sp"),
        "conf_sync": P("dp", "sp"),
        "ampl_data": P("dp", "sp"),
        "ampl_sync": P("dp", "sp"),
        "bits_lo": P("dp", "sp"),
        "bits_hi": P("dp", "sp"),
        "mean_conf": P(),
    }
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        fn = jax.shard_map(
            local_fn, mesh=mesh, in_specs=P("dp", "sp"),
            out_specs=out_specs, check_vma=False)
    else:
        from jax.experimental.shard_map import shard_map

        fn = shard_map(
            local_fn, mesh=mesh, in_specs=P("dp", "sp"),
            out_specs=out_specs, check_rep=False)
    return jax.jit(fn)


_SCORE_FN_CACHE: dict = {}


def _cached_sharded_score_fn(cfg: ModemConfig, mesh: Mesh, t_local: int,
                             precision: str):
    """Per-(geometry, mesh, shard length) cache: TPU compiles here go
    through a remote service (minutes cold), so looping decode steps
    must not rebuild the shard_map program each call."""
    from ..ops.device_rx import device_rx_key

    key = (device_rx_key(cfg, precision), mesh, t_local)
    fn = _SCORE_FN_CACHE.get(key)
    if fn is None:
        fn = sharded_score_fn(cfg, mesh, t_local, precision)
        _SCORE_FN_CACHE[key] = fn
    return fn


def sharded_decode_step(cfg: ModemConfig, mesh: Mesh, samples: np.ndarray,
                        t_local: int = 1 << 12, precision: str = "auto"):
    """One full sharded decode scoring step over a batch of audio streams.

    samples: [B, L] float32 with L <= sp * t_local (padded up; the halo
    is taken from padding).  Longer streams must be segmented by the
    caller — silent truncation would read as full coverage.  Returns
    host numpy arrays.
    """
    sp = mesh.shape["sp"]
    want = sp * t_local
    b, L = samples.shape
    if L > want:
        raise ValueError(
            f"stream length {L} exceeds the sharded window sp*t_local "
            f"= {want}; segment the input or raise t_local")
    x = np.zeros((b, want), np.float32)
    x[:, :L] = samples
    fn = _cached_sharded_score_fn(cfg, mesh, t_local, precision)
    xs = jax.device_put(
        x, NamedSharding(mesh, P("dp", "sp")))
    out = fn(xs)
    return {k: np.asarray(v) for k, v in out.items()}
