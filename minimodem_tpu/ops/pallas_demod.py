"""Pallas TPU kernel for stage-1 demodulation: sliding 4-basis correlation.

Maps the stride-1 correlation onto the MXU as a banded matmul:

    corr[c, s] = sum_j x[s + j] * basis[c, j]           (j < nb)

Decompose s = 128*a + r.  Build, per 16K-offset tile, the im2col slab
X2[a, j] = x[128*a + j] for j < KDIM = 128 + nb, and the static banded
weight W[j, 128*c + r] = basis[c, j - r] (zero outside the band).  Then

    (X2 @ W)[a, 128*c + r] = corr[c, 128*a + r]

one [128, KDIM] x [KDIM, 512] MXU matmul per tile, float32
(precision=HIGHEST).  The slab lives in VMEM; the audio tile is DMA'd from
HBM with an overlapping window (overlap = nb samples).

This replaces the lax.scan correlation (ops/demod.py::_correlate_direct)
on TPU for float32 geometries; the scan remains the float64 /
long-filter / CPU fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE = 16384            # offsets per grid step (128 rows x 128 lanes)
ROWS = TILE // 128
MAX_NB = 1920           # keep KDIM * 512 * 4B (W) and the slab in VMEM


def supported(nb: int) -> bool:
    return nb <= MAX_NB


def _kdim(nb: int) -> int:
    k = 128 + nb
    return ((k + 7) // 8) * 8      # sublane-align


def make_banded_w(basis: np.ndarray) -> np.ndarray:
    """basis: [4, nb] -> W [KDIM, 512] with W[j, 128c + r] = basis[c, j-r]."""
    nb = basis.shape[1]
    kdim = _kdim(nb)
    w = np.zeros((kdim, 512), np.float32)
    for c in range(4):
        for r in range(128):
            j0 = r
            w[j0:j0 + nb, 128 * c + r] = basis[c]
    return w


@functools.lru_cache(maxsize=32)
def _build(nb: int, n_tiles: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kdim = _kdim(nb)
    # HBM DMA slices must be 1024-aligned in length (mosaic 1-D tiling)
    xs_len = TILE + ((kdim + 1023) // 1024) * 1024

    def kernel(x_hbm, w_ref, out_ref, xs, x2, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TILE, xs_len)], xs, sem)
        dma.start()
        dma.wait()

        # static unrolled im2col: 128 shifted copies (no dynamic indices —
        # mosaic's x64-mode index promotion chokes on dynamic ds here)
        for a in range(ROWS):
            x2[a, :] = xs[a * 128: a * 128 + kdim]
        prod = jnp.dot(x2[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)   # [ROWS, 512]
        # [ROWS, 4, 128] -> [4, ROWS, 128] -> [4, TILE]
        out_ref[...] = (
            prod.reshape(ROWS, 4, 128).transpose(1, 0, 2).reshape(4, TILE))

    grid = (n_tiles,)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
            pl.BlockSpec((kdim, 512), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),     # W replicated
        ],
        out_specs=pl.BlockSpec((4, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * TILE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((xs_len,), jnp.float32),
            pltpu.VMEM((ROWS, kdim), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return fn


@functools.lru_cache(maxsize=32)
def _build_batch(nb: int, n_tiles: int, batch: int):
    """Batched variant: grid (batch, n_tiles), streams flattened into ONE
    contiguous 1-D HBM array of `batch` rows x `row` samples (row is a
    1024-multiple, so every DMA start stays aligned).  The DMA is then
    shape-identical to the single-stream kernel's, which mosaic compiles.

    This is how the kernel serves `jax.vmap` (via the custom_vmap rule in
    `_make_correlator`): a leading grid axis over streams, NOT a vmapped
    pallas_call — the manual HBM DMA below can't be auto-batched."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kdim = _kdim(nb)
    xs_len = TILE + ((kdim + 1023) // 1024) * 1024
    row = n_tiles * TILE + ((kdim + 1023) // 1024) * 1024

    def kernel(x_hbm, w_ref, out_ref, xs, x2, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * row + i * TILE, xs_len)], xs, sem)
        dma.start()
        dma.wait()

        for a in range(ROWS):
            x2[a, :] = xs[a * 128: a * 128 + kdim]
        prod = jnp.dot(x2[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)   # [ROWS, 512]
        out_ref[...] = (
            prod.reshape(ROWS, 4, 128).transpose(1, 0, 2)
            .reshape(1, 4, TILE))

    fn = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x [B*row] in HBM
            pl.BlockSpec((kdim, 512), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),     # W replicated
        ],
        out_specs=pl.BlockSpec((1, 4, TILE), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 4, n_tiles * TILE),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((xs_len,), jnp.float32),
            pltpu.VMEM((ROWS, kdim), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return fn


def backend_supports_pallas() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _padded_len(nb: int, s_len: int) -> "tuple[int, int]":
    kdim = _kdim(nb)
    n_tiles = -(-s_len // TILE)
    # TILE and the kdim round-up are both 1024-multiples, so `need` is too —
    # which keeps every HBM row 1024-aligned in the batched layout
    need = n_tiles * TILE + ((kdim + 1023) // 1024) * 1024
    return n_tiles, need


@functools.lru_cache(maxsize=64)
def _make_correlator(basis_bytes: bytes, nb: int, s_len: int):
    """vmap-aware correlator for a fixed basis and output length.

    The single-stream impl runs the 1-D grid kernel; `jax.vmap` over it
    dispatches to the explicitly batched 2-D grid kernel via
    jax.custom_batching.custom_vmap (a vmapped pallas_call with manual
    HBM DMA is unsupported, see _build_batch)."""
    basis_np = np.frombuffer(basis_bytes, np.float32).reshape(4, nb).copy()
    w_np = make_banded_w(basis_np)
    n_tiles, need = _padded_len(nb, s_len)

    def _single(x):
        L = int(x.shape[0])
        if L < need:
            x = jnp.pad(x, (0, need - L))
        else:
            x = x[:need]
        # trace the kernel with x64 promotion off: mosaic lowering loops
        # on the i64 index constants that x64 mode injects
        with jax.enable_x64(False):
            corr = _build(nb, n_tiles)(x, jnp.asarray(w_np))
        return corr[:, :s_len]

    def _batched(x):
        B, L = int(x.shape[0]), int(x.shape[1])
        if L < need:
            x = jnp.pad(x, ((0, 0), (0, need - L)))
        else:
            x = x[:, :need]
        with jax.enable_x64(False):
            corr = _build_batch(nb, n_tiles, B)(
                x.reshape(B * need), jnp.asarray(w_np))
        return corr[:, :, :s_len]

    corr_fn = jax.custom_batching.custom_vmap(_single)

    @corr_fn.def_vmap
    def _vmap_rule(axis_size, in_batched, x):  # noqa: ANN001
        del axis_size
        (x_batched,) = in_batched
        assert x_batched, "correlate_pallas vmap rule needs a batched x"
        return _batched(x), True

    return corr_fn


def correlate_pallas(x, basis_np: np.ndarray, s_len: int):
    """x: [L] f32 on device; basis_np: [4, nb] host constant.
    Returns corr [4, s_len].  Batches transparently under jax.vmap."""
    basis32 = np.ascontiguousarray(basis_np, np.float32)
    fn = _make_correlator(basis32.tobytes(), basis32.shape[1], int(s_len))
    return fn(x)
