"""Fused Pallas scoring kernel: stages 1+2 in one TPU program.

The XLA score packer (ops/device_rx.py::make_score_packer) materializes
the correlation, the magnitude planes, and n_bits shifted copies of the
bit/signal/noise planes in HBM between ops — ~30-50 GB of traffic for a
64 x 60 s batch, ~150 ms of the batched pipeline.  This kernel computes
the packed [8, T] uint32 score channels tile-by-tile entirely in VMEM:

  DMA x tile -> im2col banded matmul (the MXU correlator from
  ops/pallas_demod.py) -> mark/space magnitudes -> per-bit shifted
  slices accumulated into frame stats (two passes: totals, then
  divergence) -> confidence/ampl/framing-mask channels -> one packed
  (8, T_TILE) store.

HBM traffic drops to read-x + write-packed (~7 GB for the same batch).

Semantics replay make_score_packer exactly (reference: src/fsk.c:117-174
bit analysis, :178-446 frame analysis / CONFIDENCE_ALGO 6); float32
rounding can differ in the last bits from the XLA lowering (different
reduction trees), the same cross-lowering drift the MXU correlator
already introduces — decisions are threshold comparisons on O(1)-scale
confidences and are unaffected.

Float32 geometries only (f64 perfection-capable configs keep the XLA
path); batches transparently under jax.vmap via the same custom_vmap
pattern as correlate_pallas.
"""

from __future__ import annotations

import functools

import numpy as np

from .pallas_demod import MAX_NB, _kdim, make_banded_w

# packed offsets per grid step: the per-bit passes unroll ~3*n_bits
# [1, T_TILE] temporaries whose scoped-stack footprint must stay inside
# the 16 MB VMEM budget — 8192 keeps a 10-bit frame near ~10 MB
T_TILE = 8192


def supported(nb: int, n_bits: int) -> bool:
    return nb <= MAX_NB and n_bits <= 64


@functools.lru_cache(maxsize=32)
def _build(geo_key, n_tiles: int, batch: int, row: int):
    """Compile the fused scorer for a fixed tile count and batch.

    geo_key: (basis bytes, nb, magscalar, bit_begin tuple, n_bits,
    req_data, req_sync) — everything static the math depends on."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    kdim = _kdim(nb)
    max_begin = max(bit_begin)
    tile_s_len = T_TILE + max_begin
    rows_t = -(-tile_s_len // 128)
    s_t = rows_t * 128
    xs_len = ((s_t - 128 + kdim + 1023) // 1024) * 1024 + 1024
    assert row >= (n_tiles - 1) * T_TILE + xs_len

    eps = np.float32(np.finfo(np.float32).eps)
    scal = np.float32(magscalar)
    n_bits_f = np.float32(n_bits)

    def kernel(w_ref, x_hbm, out_ref, xs, x2, sig_sc, bit_sc, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(b * row + i * T_TILE, xs_len)], xs, sem)
        dma.start()
        dma.wait()

        # ---- stage 1: banded-matmul correlation (pallas_demod.py) ----
        for a in range(rows_t):
            x2[a, :] = xs[a * 128: a * 128 + kdim]
        prod = jnp.dot(x2[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [rows_t, 512]
        corr = (prod.reshape(rows_t, 4, 128).transpose(1, 0, 2)
                .reshape(4, s_t))
        # band magnitudes (reference: src/fsk.c:107-114,130-159)
        mag_mark = jnp.sqrt(corr[0] * corr[0] + corr[1] * corr[1]) * scal
        mag_space = jnp.sqrt(corr[2] * corr[2] + corr[3] * corr[3]) * scal
        bit = mag_mark > mag_space                  # fsk.c:161 strict
        sig = jnp.where(bit, mag_mark, mag_space)
        noise = jnp.where(bit, mag_space, mag_mark)
        noise_g = jnp.where(noise > eps, noise, jnp.float32(0.0))
        sig2 = sig.reshape(1, s_t)
        noise2 = noise_g.reshape(1, s_t)
        bit2 = bit.astype(jnp.int32).reshape(1, s_t)

        # ---- stage 2 pass 1: per-bit slices -> totals ----
        zf = jnp.zeros((1, T_TILE), jnp.float32)
        total_sig = zf
        total_noise = zf
        mark_sig = zf
        n_mark_i = jnp.zeros((1, T_TILE), jnp.int32)
        for k in range(n_bits):
            s0 = int(bit_begin[k])
            sb = sig2[:, s0:s0 + T_TILE]
            nb_ = noise2[:, s0:s0 + T_TILE]
            bb = bit2[:, s0:s0 + T_TILE]
            sig_sc[k, :] = sb[0]
            bit_sc[k, :] = bb[0]
            total_sig = total_sig + sb
            total_noise = total_noise + nb_
            n_mark_i = n_mark_i + bb
            mark_sig = mark_sig + jnp.where(bb != 0, sb, 0.0)

        n_mark = n_mark_i.astype(jnp.float32)
        n_space = n_bits_f - n_mark
        space_sig = total_sig - mark_sig
        avg_mark = jnp.where(n_mark > 0, mark_sig / n_mark,
                             jnp.float32(0.0))
        avg_space = jnp.where(n_space > 0, space_sig / n_space,
                              jnp.float32(0.0))

        # ---- pass 2: divergence (reference CONFIDENCE_ALGO 6) ----
        divergence = zf
        for k in range(n_bits):
            sb = sig_sc[k, :].reshape(1, T_TILE)
            bb = bit_sc[k, :].reshape(1, T_TILE)
            avg_own = jnp.where(bb != 0, avg_mark, avg_space)
            divergence = divergence + jnp.abs(sb - avg_own) / avg_own
        divergence = divergence * jnp.float32(2.0) / n_bits_f
        snr = total_sig / total_noise       # IEEE: x/0=inf, 0/0=nan
        conf = snr * (jnp.float32(1.0) - divergence)
        ampl = total_sig / n_bits_f

        # ---- framing masks + bit packing ----
        ones = jnp.ones((1, T_TILE), jnp.int32)
        ok_d = ones
        ok_s = ones
        bits_lo = jnp.zeros((1, T_TILE), jnp.int32)
        bits_hi = jnp.zeros((1, T_TILE), jnp.int32)
        for k in range(n_bits):
            bb = bit_sc[k, :].reshape(1, T_TILE)
            if req_data[k] >= 0:
                ok_d = ok_d & jnp.where(bb == int(req_data[k]), 1, 0)
            if req_sync[k] >= 0:
                ok_s = ok_s & jnp.where(bb == int(req_sync[k]), 1, 0)
            if k < 32:
                bits_lo = bits_lo | (bb << k)
            else:
                bits_hi = bits_hi | (bb << (k - 32))

        zero = jnp.float32(0.0)
        u = jax.lax.bitcast_convert_type
        out_ref[0, 0, :] = u(jnp.where(ok_d != 0, conf, zero),
                             jnp.uint32)[0]
        out_ref[0, 1, :] = u(jnp.where(ok_s != 0, conf, zero),
                             jnp.uint32)[0]
        out_ref[0, 2, :] = u(jnp.where(ok_d != 0, ampl, zero),
                             jnp.uint32)[0]
        out_ref[0, 3, :] = u(jnp.where(ok_s != 0, ampl, zero),
                             jnp.uint32)[0]
        out_ref[0, 4, :] = u(bits_lo, jnp.uint32)[0]
        out_ref[0, 5, :] = u(bits_hi, jnp.uint32)[0]
        zu = jnp.zeros((T_TILE,), jnp.uint32)
        out_ref[0, 6, :] = zu
        out_ref[0, 7, :] = zu

    fn = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=[
            pl.BlockSpec((kdim, 512), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),       # banded W
            pl.BlockSpec(memory_space=pltpu.ANY),        # x [B*row] HBM
        ],
        out_specs=pl.BlockSpec((1, 8, T_TILE), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 8, n_tiles * T_TILE),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((xs_len,), jnp.float32),
            pltpu.VMEM((rows_t, kdim), jnp.float32),
            pltpu.VMEM((n_bits, T_TILE), jnp.float32),
            pltpu.VMEM((n_bits, T_TILE), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return fn, xs_len


@functools.lru_cache(maxsize=32)
def _make_packer(geo_key, t_total: int):
    """vmap-aware fused packer for a fixed geometry and score length.
    Single-stream impl runs the kernel at B=1; jax.vmap dispatches to a
    B-grid build via custom_vmap (same pattern as correlate_pallas)."""
    import jax
    import jax.numpy as jnp

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    w_np = make_banded_w(
        np.frombuffer(basis_bytes, np.float32).reshape(4, nb).copy())
    assert t_total % T_TILE == 0, t_total
    n_tiles = t_total // T_TILE
    kdim = _kdim(nb)
    max_begin = max(bit_begin)
    tile_s_len = T_TILE + max_begin
    rows_t = -(-tile_s_len // 128)
    s_t = rows_t * 128
    xs_len = ((s_t - 128 + kdim + 1023) // 1024) * 1024 + 1024
    row = (n_tiles - 1) * T_TILE + xs_len

    def _run(x2d):
        B, L = int(x2d.shape[0]), int(x2d.shape[1])
        if L < row:
            x2d = jnp.pad(x2d, ((0, 0), (0, row - L)))
        else:
            x2d = x2d[:, :row]
        fn, _ = _build(geo_key, n_tiles, B, row)
        with jax.enable_x64(False):
            out = fn(jnp.asarray(w_np), x2d.reshape(B * row))
        return out

    def _single(x):
        return _run(x.astype(jnp.float32)[None, :])[0]

    pack_fn = jax.custom_batching.custom_vmap(_single)

    @pack_fn.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        del axis_size
        (x_batched,) = in_batched
        assert x_batched
        return _run(x.astype(jnp.float32)), True

    return pack_fn


def fused_packer_eligible(geo, t_total: int) -> bool:
    """TPU backends, float32 geometries, bounded filter, tile-aligned
    score lengths.  MINIMODEM_TPU_PALLAS=0 disables (same escape hatch
    as the correlator)."""
    import os

    if os.environ.get("MINIMODEM_TPU_PALLAS", "1") == "0":
        return False
    if geo.use_f64:
        return False
    if not supported(geo.nb, geo.n_bits):
        return False
    if t_total % T_TILE != 0:
        return False
    from .pallas_demod import backend_supports_pallas

    return backend_supports_pallas()


def make_fused_packer(geo, basis_np: np.ndarray, t_total: int):
    """-> packer fn x[t_total + halo] f32/int16-normalized -> [8, t_total]
    u32, batching under jax.vmap.  Callers guarantee eligibility."""
    basis32 = np.ascontiguousarray(basis_np, np.float32)
    geo_key = (basis32.tobytes(), int(geo.nb), float(geo.magscalar),
               tuple(int(v) for v in geo.bit_begin), int(geo.n_bits),
               tuple(int(v) for v in geo.req_data),
               tuple(int(v) for v in geo.req_sync))
    return _make_packer(geo_key, t_total)
