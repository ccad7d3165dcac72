"""Fused Pallas scoring kernel: stages 1+2 in one TPU program.

The XLA score packer (ops/device_rx.py::make_score_packer) materializes
the correlation, the magnitude planes, and n_bits shifted copies of the
bit/signal/noise planes in HBM between ops — ~30-50 GB of traffic for a
64 x 60 s batch, ~150 ms of the batched pipeline.  This kernel computes
the packed [8, T] uint32 score channels tile-by-tile entirely in VMEM.

Layout (round 2, v2): everything lives in dense (rows, 128) row-major
form — a vector op uses all 8 sublanes instead of 1 — and the input
audio arrives as BlockSpec-indexed (R_OUT, 128) blocks so the pallas
pipeline double-buffers the HBM reads (the v1 kernel issued a blocking
DMA per tile).  Two constructions make the dense form workable:

- im2col slab without concat: a scratch X2 with X2[a, m] = x[a*128 + m]
  is built from K128 sublane-shifted column-block stores, then one
  [R, KDIM] x [KDIM, 512] MXU matmul gives the 4-basis correlation
  (see ops/pallas_demod.py for the banded-W trick).
- overlapped planes: scratch P with P[a, m] = plane[a*128 + m] for
  m < OV*128 turns the per-bit shifted read (offset bit_begin[k]) into
  the plain lane slice P[:, s0:s0+128] — no cross-row carries.

The per-bit passes accumulate into (R_OUT, 128) registers; the bit
value rides in the SIGN of the signal plane (ss = bit ? sig : -sig), so
one shifted read per bit serves signal, bit, mark-mask, and packing.

Semantics replay make_score_packer exactly (reference: src/fsk.c:117-174
bit analysis, :178-446 frame analysis / CONFIDENCE_ALGO 6); float32
rounding can differ in the last bits from the XLA lowering (different
reduction trees), the same cross-lowering drift the MXU correlator
already introduces — decisions are threshold comparisons on O(1)-scale
confidences and are unaffected.  (The v2 layout itself is bit-identical
to the v1 fused kernel: same ops, same order, only the layout differs —
verified exhaustively on TPU.)

Float32 geometries only (f64 perfection-capable configs keep the XLA
path); batches transparently under jax.vmap via the same custom_vmap
pattern as correlate_pallas.
"""

from __future__ import annotations

import functools

import numpy as np

from .pallas_demod import MAX_NB, _kdim, make_banded_w

# candidate tile sizes, largest first: bigger tiles amortize per-grid-step
# overheads (measured 199.7 -> 136.1 ms on the 64 x 60 s batch going
# 8192 -> 32768), smaller ones keep short decodes and big-filter
# geometries eligible (scratch VMEM scales with the tile)
T_TILES = (32768, 16384, 8192)
T_TILE = T_TILES[-1]                  # granularity the score length needs

# pass-1 comb sums ride the MXU (round 3): the pss/png slabs already ARE
# im2col matrices of the overlapped planes, so total/mark/noise sums over
# the n_bits comb taps are banded matmuls, and the integer stats
# (n_mark, framing mismatch, packed bits) are one matmul on the 0/1
# indicator slab — exact even in bf16 passes (0/1 x {0, +-1, 2^k}
# products, f32 accumulation), gated at n_bits <= 24 so the bit weights
# stay inside f32's exact-integer range.  Measured on v5e (64 x 60 s
# Bell202): scorer 107.3 -> 94.8 ms wall (pass 1 was ~20 ms of VPU
# shifted adds).  Round 4: the float slabs ride 3 single-pass bf16
# matmuls each (manual exact A-side split — the weights are exactly
# bf16, so HIGHEST's other 3 passes multiplied zeros), chained scorer
# 68.3 -> 58.2 ms device.  MINIMODEM_TPU_MXP1=0 restores the VPU pass.
MXP1_MAX_BITS = 24


def _mxp1_on() -> bool:
    import os

    return os.environ.get("MINIMODEM_TPU_MXP1", "1") not in (
        "0", "", "off")


# Mosaic's scoped-VMEM stack limit is 16 MB; the MXP1 comb weights scale
# with the overlapped-plane span (wc: OV*128 x 128, wb: OV*128 x 384), so
# long-bit geometries (rtty at 48 kHz: max_begin ~7400 -> OV=59 ->
# ~15.5 MB of weights alone) blow the stack that Bell202 (OV=5) never
# approaches.  Estimate the kernel's resident VMEM and fall back to the
# VPU pass 1 (identical decisions, ~13 ms slower on the 64 x 60 s
# Bell202 batch) when MXP1 doesn't fit.
_MXP1_VMEM_BUDGET = 14 << 20


def _mxp1_fits(nb: int, max_begin: int, t_tile: int) -> bool:
    kdim, r_out, n_blocks, r_corr, k128, ov = _statics(nb, max_begin,
                                                       t_tile)
    ovk = ov * 128
    total = (
        kdim * 512 * 4                 # banded W block
        + ovk * 512 * 2                # wc + wb comb weights (bf16)
        + 2 * n_blocks * r_out * 128 * 4   # double-buffered inputs
        + 2 * 4 * r_out * 128 * 4      # double-buffered out (planes)
        + r_corr * kdim * 4            # im2col scratch
        + 2 * r_out * ovk * 4          # pss + png slabs
    )
    return total <= _MXP1_VMEM_BUDGET

# VMEM guards for the scratch slabs (bytes)
_MAX_X2_BYTES = 4 << 20
_MAX_PLANE_BYTES = 2 << 20


def _statics(nb: int, max_begin: int, t_tile: int):
    kdim = _kdim(nb)
    r_out = t_tile // 128
    k128 = -(-kdim // 128)                   # im2col column blocks
    ov = max_begin // 128 + 2                # overlapped-plane blocks
    # corr rows must cover both the scored offsets [0, t_tile+max_begin)
    # and the deepest overlapped-plane copy ss[ov-1 : ov-1+r_out]
    r_corr = max(-(-(t_tile + max_begin) // 128), (ov - 1) + r_out)
    r_corr = (r_corr + 7) // 8 * 8
    # input rows must cover the deepest im2col copy x[k128-1 : k128-1+r_corr]
    rows_needed = (k128 - 1) + r_corr
    n_blocks = -(-rows_needed // r_out)      # input blocks per grid step
    return kdim, r_out, n_blocks, r_corr, k128, ov


def _tile_fits(nb: int, max_begin: int, t_tile: int) -> bool:
    kdim, r_out, n_blocks, r_corr, k128, ov = _statics(nb, max_begin,
                                                       t_tile)
    if r_corr * kdim * 4 > _MAX_X2_BYTES:
        return False
    if r_out * ov * 128 * 4 > _MAX_PLANE_BYTES:
        return False
    return True


def _pick_tile(nb: int, max_begin: int, t_total: int):
    for t in T_TILES:
        if t_total % t == 0 and _tile_fits(nb, max_begin, t):
            return t
    return None


def supported(nb: int, n_bits: int, max_begin: int = 0,
              t_total: int = T_TILE) -> bool:
    if nb > MAX_NB or n_bits > 64:
        return False
    return _pick_tile(nb, max_begin, t_total) is not None


def plane_rows(n_bits: int, req_data, req_sync):
    """Channel-plane layout (round 3, v3): the v2 packed form writes 8
    u32 rows per offset (32 B) but two are always zero, conf_sync/
    ampl_sync duplicate the data channels whenever the expect strings
    match (every mode without --sync-byte), and bits_hi is zero for
    n_bits <= 32 — so the common case moves 12 B of information in a
    32 B stream, and the scorer's OUT write is the measured ~110 GB/s
    data-movement wall (ROADMAP item 1).

    Mosaic constraint shaping the layout: HBM DMA row slices must be
    8-aligned in start AND size (a [b*3, 3) slice of a (8,128)-tiled
    memref is rejected — same failure as ROADMAP's 6-row negative
    result).  So the common case uses FOUR rows per stream (cd, ad, bl
    + one never-written pad row): two streams share one 8-aligned DMA
    block and the scorer writes only 3 rows (12 B/offset).  Dual-expect
    or wide-bits geometries keep the full 8-row v2 layout (rows in v2
    order), where every slice is naturally aligned.

    Returns (n_ch, rows): n_ch in {4, 8}; rows = dict(cd, cs, ad, as_,
    bl, bh, written); duplicate channels alias the same row; bh is None
    when n_bits <= 32."""
    dual = tuple(req_data) != tuple(req_sync)
    if dual or n_bits > 32:
        return 8, {"cd": 0, "cs": 1, "ad": 2, "as_": 3, "bl": 4,
                   "bh": 5 if n_bits > 32 else None, "written": 8}
    return 4, {"cd": 0, "cs": 0, "ad": 1, "as_": 1, "bl": 2,
               "bh": None, "written": 3}


@functools.lru_cache(maxsize=32)
def _build(geo_key, n_tiles: int, batch: int, t_tile: int,
           planes: bool = False, mxp1: bool = False):
    """Compile the fused scorer for a fixed tile count and batch.

    geo_key: (basis bytes, nb, magscalar, bit_begin tuple, n_bits,
    req_data, req_sync) — everything static the math depends on.
    planes=True emits the v3 channel-plane layout (plane_rows) instead
    of the 8-row packed form.  mxp1=True (planes only) runs pass 1 as
    banded comb matmuls on the MXU (see MXP1_MAX_BITS)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    max_begin = max(bit_begin)
    kdim, r_out, n_blocks, r_corr, k128, ov = _statics(nb, max_begin,
                                                       t_tile)
    n_ch, prow = plane_rows(n_bits, req_data, req_sync)
    if planes:
        assert n_ch == 4, "planes build serves the 4-row common layout"
    assert not (mxp1 and not planes)

    eps = np.float32(np.finfo(np.float32).eps)
    scal = np.float32(magscalar)
    n_bits_f = np.float32(n_bits)
    ovk = ov * 128
    n_req1 = float(sum(1 for r in req_data if r == 1))

    def kernel(*refs):
        w_ref = refs[0]
        nw = 1
        if mxp1:
            wc_ref, wb_ref = refs[1], refs[2]
            nw = 3
        x_refs = refs[nw:nw + n_blocks]
        out_ref = refs[nw + n_blocks]
        x2_sc = refs[nw + 1 + n_blocks]
        pss = refs[nw + 2 + n_blocks]
        png = refs[nw + 3 + n_blocks]

        x_full = jnp.concatenate([r[0] for r in x_refs], axis=0)

        # ---- stage 1: banded-matmul correlation (pallas_demod.py) ----
        for c in range(k128):
            w = min(128, kdim - c * 128)
            x2_sc[:, c * 128:c * 128 + w] = x_full[c:c + r_corr, :w]
        prod = jnp.dot(x2_sc[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [r_corr, 512]
        # band magnitudes (reference: src/fsk.c:107-114,130-159)
        mm = jnp.sqrt(prod[:, 0:128] * prod[:, 0:128]
                      + prod[:, 128:256] * prod[:, 128:256]) * scal
        ms = jnp.sqrt(prod[:, 256:384] * prod[:, 256:384]
                      + prod[:, 384:512] * prod[:, 384:512]) * scal
        bitp = mm > ms                       # fsk.c:161 strict
        sig = jnp.where(bitp, mm, ms)
        ss = jnp.where(bitp, sig, -sig)      # sign carries the bit
        noise = jnp.where(bitp, ms, mm)
        ng = jnp.where(noise > eps, noise, jnp.float32(0.0))

        for c in range(ov):
            pss[:, c * 128:(c + 1) * 128] = ss[c:c + r_out, :]
            png[:, c * 128:(c + 1) * 128] = ng[c:c + r_out, :]

        def shift_ss(s0):
            return pss[:, s0:s0 + 128]

        u = jax.lax.bitcast_convert_type
        zero = jnp.float32(0.0)

        if mxp1:
            # ---- pass 1 on the MXU: comb sums over the slabs ----
            # total_sig = 2*mark_sig - sum_ss (|x| = 2*max(x,0) - x);
            # integer stats from the 0/1 indicator slab are exact in
            # bf16 passes (0/1 x {0, +-1, 2^k}, f32 accumulation).
            #
            # The comb weights are EXACTLY bf16-representable, so the
            # f32-grade product only needs the A-side decomposed:
            # a = a0+a1+a2 with each part exactly bf16 (3 x 8 mantissa
            # bits cover f32's 24; the two splitting subtractions are
            # Sterbenz-exact).  Three single-pass bf16 matmuls then
            # produce the same nonzero partial products HIGHEST's six
            # passes would (w's tail parts are zero) at half the MXU
            # time — measured mxp1 ~16 -> ~8 ms on the 64 x 60 s
            # Bell202 batch, bit-identical partials.
            prec = jax.lax.Precision.DEFAULT

            def split3(a):
                a0 = a.astype(jnp.bfloat16)
                r1 = a - a0.astype(jnp.float32)
                a1 = r1.astype(jnp.bfloat16)
                a2 = (r1 - a1.astype(jnp.float32)).astype(jnp.bfloat16)
                return a0, a1, a2

            def dot3(a, w):
                p0, p1, p2 = split3(a)
                out = jnp.dot(p0, w, preferred_element_type=jnp.float32,
                              precision=prec)
                out = out + jnp.dot(p1, w,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                return out + jnp.dot(p2, w,
                                     preferred_element_type=jnp.float32,
                                     precision=prec)

            wcv = wc_ref[...]
            pm = jnp.maximum(pss[...], jnp.float32(0.0))
            # mask select in f32, then cast: mosaic rejects an i1-mask
            # select straight into bf16 ((8,128) mask vs (16,128) vreg)
            bb2 = jnp.where(pss[...] > 0, jnp.float32(1.0),
                            jnp.float32(0.0)).astype(jnp.bfloat16)
            # (a mask-scaled single-split variant — exact bf16 parts of
            # relu/min via 0/1 muls, dropping the sum_ss matmul — was
            # measured neutral: packer 59.0 vs 58.2 ms; keep the plain
            # three-split form)
            sum_ss = dot3(pss[...], wcv)
            mark_sig = dot3(pm, wcv)
            total_noise = dot3(png[...], wcv)
            d4 = jnp.dot(bb2, wb_ref[...],
                         preferred_element_type=jnp.float32,
                         precision=prec)
            n_mark = d4[:, 0:128]
            mism_f = jnp.float32(n_req1) + d4[:, 128:256]
            bits_lo = d4[:, 256:384].astype(jnp.int32)
            total_sig = jnp.float32(2.0) * mark_sig - sum_ss
            n_space = n_bits_f - n_mark
            space_sig = total_sig - mark_sig
            avg_mark = jnp.where(n_mark > 0, mark_sig / n_mark,
                                 jnp.float32(0.0))
            avg_space = jnp.where(n_space > 0, space_sig / n_space,
                                  jnp.float32(0.0))
            divergence = jnp.zeros((r_out, 128), jnp.float32)
            for k in range(n_bits):
                ssk = shift_ss(int(bit_begin[k]))
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
            divergence = divergence * jnp.float32(2.0) / n_bits_f
            snr = total_sig / total_noise
            conf = snr * (jnp.float32(1.0) - divergence)
            ampl = total_sig / n_bits_f
            ok_d = mism_f == 0
            out_ref[0, prow["cd"]] = u(jnp.where(ok_d, conf, zero),
                                       jnp.uint32)
            out_ref[0, prow["ad"]] = u(jnp.where(ok_d, ampl, zero),
                                       jnp.uint32)
            out_ref[0, prow["bl"]] = u(bits_lo, jnp.uint32)
            return

        # ---- pass 1: totals + framing masks + bit packing ----
        zf = jnp.zeros((r_out, 128), jnp.float32)
        zi = jnp.zeros((r_out, 128), jnp.int32)
        total_sig = zf
        total_noise = zf
        mark_sig = zf
        n_mark_i = zi
        mism_d = zi
        mism_s = zi
        bits_lo = zi
        bits_hi = zi
        for k in range(n_bits):
            s0 = int(bit_begin[k])
            ssk = shift_ss(s0)
            ngk = png[:, s0:s0 + 128]
            sbk = jnp.abs(ssk)
            bbk = (ssk > 0).astype(jnp.int32)
            total_sig = total_sig + sbk
            total_noise = total_noise + ngk
            n_mark_i = n_mark_i + bbk
            mark_sig = mark_sig + jnp.maximum(ssk, jnp.float32(0.0))
            if req_data[k] == 1:
                mism_d = mism_d + (1 - bbk)
            elif req_data[k] == 0:
                mism_d = mism_d + bbk
            if req_sync[k] == 1:
                mism_s = mism_s + (1 - bbk)
            elif req_sync[k] == 0:
                mism_s = mism_s + bbk
            if k < 32:
                bits_lo = bits_lo | (bbk << k)
            else:
                bits_hi = bits_hi | (bbk << (k - 32))

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
            ssk = shift_ss(int(bit_begin[k]))
            sbk = jnp.abs(ssk)
            avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
            divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
        divergence = divergence * jnp.float32(2.0) / n_bits_f
        snr = total_sig / total_noise       # IEEE: x/0=inf, 0/0=nan
        conf = snr * (jnp.float32(1.0) - divergence)
        ampl = total_sig / n_bits_f

        ok_d = mism_d == 0
        ok_s = mism_s == 0
        zero = jnp.float32(0.0)
        u = jax.lax.bitcast_convert_type
        if planes:
            # 4-row common layout: cd, ad, bl written; row 3 is DMA
            # alignment padding and is never written (zero traffic)
            out_ref[0, prow["cd"]] = u(jnp.where(ok_d, conf, zero),
                                       jnp.uint32)
            out_ref[0, prow["ad"]] = u(jnp.where(ok_d, ampl, zero),
                                       jnp.uint32)
            out_ref[0, prow["bl"]] = u(bits_lo, jnp.uint32)
            return
        out_ref[0, 0] = u(jnp.where(ok_d, conf, zero), jnp.uint32)
        out_ref[0, 1] = u(jnp.where(ok_s, conf, zero), jnp.uint32)
        out_ref[0, 2] = u(jnp.where(ok_d, ampl, zero), jnp.uint32)
        out_ref[0, 3] = u(jnp.where(ok_s, ampl, zero), jnp.uint32)
        out_ref[0, 4] = u(bits_lo, jnp.uint32)
        out_ref[0, 5] = u(bits_hi, jnp.uint32)
        zu = jnp.zeros((r_out, 128), jnp.uint32)
        out_ref[0, 6] = zu
        out_ref[0, 7] = zu

    in_specs = [pl.BlockSpec((kdim, 512), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)]
    if mxp1:
        in_specs.append(pl.BlockSpec((ovk, 128), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((ovk, 384), lambda b, i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for j in range(n_blocks):
        in_specs.append(pl.BlockSpec(
            (1, r_out, 128),
            functools.partial(lambda b, i, j=0: (b, i + j, 0), j=j),
            memory_space=pltpu.VMEM))
    ch_out = n_ch if planes else 8
    fn = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ch_out, r_out, 128),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, ch_out, n_tiles * r_out,
                                        128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_corr, kdim), jnp.float32),      # im2col slab
            pltpu.VMEM((r_out, ov * 128), jnp.float32),   # pss
            pltpu.VMEM((r_out, ov * 128), jnp.float32),   # png
        ],
    )
    n_rows_in = (n_tiles + n_blocks - 1) * r_out
    return fn, n_rows_in, n_blocks


@functools.lru_cache(maxsize=32)
def _make_packer(geo_key, t_total: int, planes: bool = False):
    """vmap-aware fused packer for a fixed geometry and score length.
    Single-stream impl runs the kernel at B=1; jax.vmap dispatches to a
    B-grid build via custom_vmap (same pattern as correlate_pallas)."""
    import jax
    import jax.numpy as jnp

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    w_np = make_banded_w(
        np.frombuffer(basis_bytes, np.float32).reshape(4, nb).copy())
    t_tile = _pick_tile(nb, max(bit_begin), t_total)
    assert t_tile is not None, (nb, t_total)
    n_tiles = t_total // t_tile
    n_ch = plane_rows(n_bits, req_data, req_sync)[0] if planes else 8
    # distinct tap offsets keep every wb entry a single exact-bf16
    # 0/+-1/2^k value (duplicate offsets would sum packing weights into
    # non-representable 2^a + 2^b entries)
    mxp1 = (planes and n_bits <= MXP1_MAX_BITS and _mxp1_on()
            and len(set(bit_begin)) == n_bits
            and _mxp1_fits(nb, max(bit_begin), t_tile))
    extra_np = []
    if mxp1:
        ov = _statics(nb, max(bit_begin), t_tile)[5]
        wc = np.zeros((ov * 128, 128), np.float32)
        wb = np.zeros((ov * 128, 384), np.float32)
        for m in range(128):
            for k in range(n_bits):
                j = m + int(bit_begin[k])
                wc[j, m] = 1.0
                wb[j, m] = 1.0                    # n_mark taps
                if req_data[k] == 1:              # mism = n_req1
                    wb[j, 128 + m] += -1.0        #   - sum bb over req1
                elif req_data[k] == 0:            #   + sum bb over req0
                    wb[j, 128 + m] += 1.0
                wb[j, 256 + m] += float(1 << k)   # packed bits
        extra_np = [wc, wb]

    def _run(x2d):
        B, L = int(x2d.shape[0]), int(x2d.shape[1])
        fn, n_rows_in, n_blocks = _build(geo_key, n_tiles, B, t_tile,
                                         planes, mxp1)
        need = n_rows_in * 128
        if L < need:
            x2d = jnp.pad(x2d, ((0, 0), (0, need - L)))
        else:
            x2d = x2d[:, :need]
        x3 = x2d.reshape(B, n_rows_in, 128)
        with jax.enable_x64(False):
            out = fn(jnp.asarray(w_np),
                     *[jnp.asarray(w, jnp.bfloat16) for w in extra_np],
                     *([x3] * n_blocks))
        return out.reshape(B, n_ch, n_tiles * t_tile)

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
    if t_total % T_TILE != 0:
        return False
    if not supported(geo.nb, geo.n_bits, max(geo.bit_begin), t_total):
        return False
    from .pallas_demod import backend_supports_pallas

    return backend_supports_pallas()


def make_fused_packer(geo, basis_np: np.ndarray, t_total: int,
                      planes: bool = False):
    """-> packer fn x[t_total + halo] f32/int16-normalized -> [8, t_total]
    u32 (or [n_ch, t_total] channel planes with planes=True), batching
    under jax.vmap.  Callers guarantee eligibility."""
    basis32 = np.ascontiguousarray(basis_np, np.float32)
    geo_key = (basis32.tobytes(), int(geo.nb), float(geo.magscalar),
               tuple(int(v) for v in geo.bit_begin), int(geo.n_bits),
               tuple(int(v) for v in geo.req_data),
               tuple(int(v) for v in geo.req_sync))
    return _make_packer(geo_key, t_total, planes)
