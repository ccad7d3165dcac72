"""Pallas MXU correlation kernel: interpret-mode parity on any backend;
compiled parity runs on real TPU (skipped on CPU test mesh)."""

import numpy as np
import pytest

from minimodem_tpu.models.presets import bell202
from minimodem_tpu.ops.demod import (
    _correlate_direct,
    geometry_from_config,
    make_basis,
)
from minimodem_tpu.ops import pallas_demod as P


def test_banded_w_layout():
    basis = np.arange(8, dtype=np.float32).reshape(4, 2)
    w = P.make_banded_w(basis)
    assert w.shape == (P._kdim(2), 512)
    # W[j, 128c + r] = basis[c, j - r]
    assert w[0, 0] == basis[0, 0]
    assert w[1, 0] == basis[0, 1]
    assert w[5, 128 * 2 + 4] == basis[2, 1]
    assert w[2, 0] == 0.0


def test_interpret_mode_batched_vmap(monkeypatch):
    """jax.vmap over correlate_pallas dispatches to the batched 2-D-grid
    kernel (custom_vmap rule) and matches the per-stream scan."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    P._build.cache_clear()
    P._build_batch.cache_clear()
    P._make_correlator.cache_clear()
    try:
        geo = geometry_from_config(bell202().cfg, "float32")
        basis = make_basis(geo, np.float32)
        s_len = P.TILE
        x = np.random.default_rng(3).standard_normal(
            (3, s_len + geo.nb + 2048)).astype(np.float32)
        xj = jnp.asarray(x)
        ref = np.asarray(jax.vmap(
            lambda v: _correlate_direct(v, jnp.asarray(basis), s_len))(xj))
        pal = np.asarray(jax.vmap(
            lambda v: P.correlate_pallas(v, basis, s_len))(xj))
        np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-5)
    finally:
        P._build.cache_clear()
        P._build_batch.cache_clear()
        P._make_correlator.cache_clear()


def test_interpret_mode_matches_scan(monkeypatch):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    P._build.cache_clear()
    try:
        geo = geometry_from_config(bell202().cfg, "float32")
        basis = make_basis(geo, np.float32)
        s_len = P.TILE
        x = np.random.default_rng(0).standard_normal(
            s_len + geo.nb + 2048).astype(np.float32)
        xj = jnp.asarray(x)
        ref = np.asarray(jax.jit(
            lambda x: _correlate_direct(x, jnp.asarray(basis), s_len))(xj))
        pal = np.asarray(P.correlate_pallas(xj, basis, s_len))
        np.testing.assert_allclose(pal, ref, rtol=1e-5, atol=1e-5)
    finally:
        P._build.cache_clear()
