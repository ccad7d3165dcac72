"""Bisect the PLANES (v3) fused scorer's remaining cost on TPU.

After the round-3 planes layout landed (16 B/offset out incl. the DMA
pad row, vs v2's 32), the 64 x 60 s scorer sits at ~122 ms — far above
the ~8 ms HBM roofline for its ~24 B/offset of traffic, so the wall is
now VPU compute / in-VMEM data movement, not HBM.  This harness times
stripped variants of the SAME kernel to attribute the cost:

  full   production planes kernel (3 written rows + pad)
  nodiv  pass-2 divergence refactored to 2 divisions total
         (divergence = recip_own * |sbk - avg_own| summed per class)
         -- the ship candidate
  nop2   pass 2 (divergence) removed          -> cost(pass2) = full-nop2
  nop1   both per-bit passes removed          -> cost(pass1) = nop2-nop1
  mmdef  matmul at DEFAULT precision          -> cost(HIGHEST passes)
  noim   im2col/plane copies write row 0 only -> cost(sublane shifts)

Timing per CLAUDE.md: force a dependent d2h transfer (block_until_ready
does not synchronize under axon).
"""

import functools
import sys
import time

import numpy as np


def t(fn, n=5):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def build_variant(geo_key, n_tiles, batch, t_tile, variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from minimodem_tpu.ops.pallas_demod import make_banded_w
    from minimodem_tpu.ops.pallas_score import _statics

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    max_begin = max(bit_begin)
    kdim, r_out, n_blocks, r_corr, k128, ov = _statics(nb, max_begin,
                                                       t_tile)
    eps = np.float32(np.finfo(np.float32).eps)
    scal = np.float32(magscalar)
    n_bits_f = np.float32(n_bits)
    prec = (jax.lax.Precision.DEFAULT if variant == "mmdef"
            else jax.lax.Precision.HIGHEST)

    tapshare = variant in ("tapshare", "tapsharerelu")

    def kernel(*refs):
        w_ref = refs[0]
        x_refs = refs[1:1 + n_blocks]
        out_ref = refs[1 + n_blocks]
        x2_sc = refs[2 + n_blocks]
        pss = refs[3 + n_blocks]
        png = refs[4 + n_blocks]
        ts = refs[5 + n_blocks] if tapshare else None

        x_full = jnp.concatenate([r[0] for r in x_refs], axis=0)
        if variant == "noim":
            x2_sc[:, 0:128] = x_full[0:r_corr, :]
        else:
            for c in range(k128):
                w = min(128, kdim - c * 128)
                x2_sc[:, c * 128:c * 128 + w] = x_full[c:c + r_corr, :w]
        prod = jnp.dot(x2_sc[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=prec)
        mm = jnp.sqrt(prod[:, 0:128] * prod[:, 0:128]
                      + prod[:, 128:256] * prod[:, 128:256]) * scal
        ms = jnp.sqrt(prod[:, 256:384] * prod[:, 256:384]
                      + prod[:, 384:512] * prod[:, 384:512]) * scal
        bitp = mm > ms
        sig = jnp.where(bitp, mm, ms)
        ss = jnp.where(bitp, sig, -sig)
        noise = jnp.where(bitp, ms, mm)
        ng = jnp.where(noise > eps, noise, jnp.float32(0.0))
        if variant == "noim":
            pss[:, 0:128] = ss[0:r_out, :]
            png[:, 0:128] = ng[0:r_out, :]
        else:
            for c in range(ov):
                pss[:, c * 128:(c + 1) * 128] = ss[c:c + r_out, :]
                png[:, c * 128:(c + 1) * 128] = ng[c:c + r_out, :]

        def shift_ss(s0):
            return pss[:, s0:s0 + 128]

        u = jax.lax.bitcast_convert_type
        zero = jnp.float32(0.0)
        if variant == "nop1":
            out_ref[0, 0] = u(ss[0:r_out, :], jnp.uint32)
            out_ref[0, 1] = u(ng[0:r_out, :], jnp.uint32)
            out_ref[0, 2] = u(sig[0:r_out, :], jnp.uint32)
            return

        zf = jnp.zeros((r_out, 128), jnp.float32)
        zi = jnp.zeros((r_out, 128), jnp.int32)
        total_sig = zf
        total_noise = zf
        mark_sig = zf
        n_mark_i = zi
        mism_d = zi
        bits_lo = zi
        for k in range(n_bits):
            s0 = int(bit_begin[k])
            ssk = shift_ss(s0)
            if tapshare:
                # pass 1 pays the unaligned tap read ONCE and parks it
                # 128-aligned; pass 2 re-reads it with plain aligned
                # loads (p2align attributed ~16 ms to the unaligned
                # slices)
                ts[:, k * 128:(k + 1) * 128] = ssk
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
            bits_lo = bits_lo | (bbk << k)

        n_mark = n_mark_i.astype(jnp.float32)
        n_space = n_bits_f - n_mark
        space_sig = total_sig - mark_sig
        avg_mark = jnp.where(n_mark > 0, mark_sig / n_mark,
                             jnp.float32(0.0))
        avg_space = jnp.where(n_space > 0, space_sig / n_space,
                              jnp.float32(0.0))

        if variant == "nop2":
            divergence = zf
        elif variant in ("split2", "split4"):
            # break the 11-tap serial accumulation chain into N
            # independent chains (latency experiment: pass 2 measured
            # ~40% above its op-count floor, suggesting dependency
            # stalls, not issue width)
            nacc = 2 if variant == "split2" else 4
            accs = [zf] * nacc
            for k in range(n_bits):
                ssk = shift_ss(int(bit_begin[k]))
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                accs[k % nacc] = (accs[k % nacc]
                                  + jnp.abs(sbk - avg_own) / avg_own)
            divergence = functools.reduce(jnp.add, accs)
        elif variant == "p2align":
            # WRONG-RESULT timing probe: pass 2 with every slab slice
            # rounded down to a 128-aligned lane offset.  If this is
            # much faster than full, pass 2's wall is the unaligned
            # lane slices (2 loads + align per vreg); if not, it's the
            # arithmetic.
            divergence = zf
            for k in range(n_bits):
                s0 = (int(bit_begin[k]) // 128) * 128
                ssk = shift_ss(s0)
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
        elif variant == "relu":
            # telescoped divergence (round 4): with am = mark_sig/n_mark
            # and as = space_sig/n_space, the per-tap
            # |sbk - avg_own|/avg_own sum collapses algebraically to
            #   2*(R_m/am + R_s/as),
            #   R_m = sum_k relu(ss_k - am), R_s = sum_k relu(-ss_k - as)
            # (mark taps contribute only to R_m, space taps only to R_s,
            # because relu kills the cross terms; the linear parts cancel
            # against n_mark/n_space exactly in real arithmetic).  Same
            # loads, no per-tap select/abs/div.
            rm = jnp.where(avg_mark > 0,
                           jnp.float32(1.0) / avg_mark, zero)
            rs = jnp.where(avg_space > 0,
                           jnp.float32(1.0) / avg_space, zero)
            R_m = zf
            R_s = zf
            for k in range(n_bits):
                ssk = shift_ss(int(bit_begin[k]))
                R_m = R_m + jnp.maximum(ssk - avg_mark, zero)
                R_s = R_s - jnp.minimum(ssk + avg_space, zero)
            divergence = jnp.float32(2.0) * (R_m * rm + R_s * rs)
        elif variant == "blkrot":
            # load each 128-lane slab block ONCE (aligned), derive every
            # tap by register concat + static slice: the 11 unaligned
            # tap reads overlap pairwise by ~88 lanes, so naive codegen
            # loads the same blocks ~2x/tap; if mosaic folds
            # concat+slice into a register align, loads collapse from
            # 2/tap to ov+1 total.
            blocks = [pss[:, c * 128:(c + 1) * 128] for c in range(ov)]

            def tap(k):
                q, r = divmod(int(bit_begin[k]), 128)
                if r == 0:
                    return blocks[q]
                pair = jnp.concatenate([blocks[q], blocks[q + 1]],
                                       axis=1)
                return jax.lax.slice_in_dim(pair, r, r + 128, axis=1)

            divergence = zf
            for k in range(n_bits):
                ssk = tap(k)
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
        elif variant == "relublk":
            # blkrot loads + telescoped relu arithmetic combined
            blocks = [pss[:, c * 128:(c + 1) * 128] for c in range(ov)]

            def tap(k):
                q, r = divmod(int(bit_begin[k]), 128)
                if r == 0:
                    return blocks[q]
                pair = jnp.concatenate([blocks[q], blocks[q + 1]],
                                       axis=1)
                return jax.lax.slice_in_dim(pair, r, r + 128, axis=1)

            rm = jnp.where(avg_mark > 0,
                           jnp.float32(1.0) / avg_mark, zero)
            rs = jnp.where(avg_space > 0,
                           jnp.float32(1.0) / avg_space, zero)
            R_m = zf
            R_s = zf
            for k in range(n_bits):
                ssk = tap(k)
                R_m = R_m + jnp.maximum(ssk - avg_mark, zero)
                R_s = R_s - jnp.minimum(ssk + avg_space, zero)
            divergence = jnp.float32(2.0) * (R_m * rm + R_s * rs)
        elif variant == "tapshare":
            divergence = zf
            for k in range(n_bits):
                ssk = ts[:, k * 128:(k + 1) * 128]
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
        elif variant == "tapsharerelu":
            # aligned re-reads + the telescoped relu arithmetic
            rm = jnp.where(avg_mark > 0,
                           jnp.float32(1.0) / avg_mark, zero)
            rs = jnp.where(avg_space > 0,
                           jnp.float32(1.0) / avg_space, zero)
            R_m = zf
            R_s = zf
            for k in range(n_bits):
                ssk = ts[:, k * 128:(k + 1) * 128]
                R_m = R_m + jnp.maximum(ssk - avg_mark, zero)
                R_s = R_s - jnp.minimum(ssk + avg_space, zero)
            divergence = jnp.float32(2.0) * (R_m * rm + R_s * rs)
        elif variant == "nodiv":
            acc_m = zf
            acc_s = zf
            for k in range(n_bits):
                ssk = shift_ss(int(bit_begin[k]))
                sbk = jnp.abs(ssk)
                pos = ssk > 0
                dm = jnp.abs(sbk - avg_mark)
                dsp = jnp.abs(sbk - avg_space)
                acc_m = acc_m + jnp.where(pos, dm, zero)
                acc_s = acc_s + jnp.where(pos, zero, dsp)
            divergence = acc_m / avg_mark + acc_s / avg_space
        else:
            divergence = zf
            for k in range(n_bits):
                ssk = shift_ss(int(bit_begin[k]))
                sbk = jnp.abs(ssk)
                avg_own = jnp.where(ssk > 0, avg_mark, avg_space)
                divergence = divergence + jnp.abs(sbk - avg_own) / avg_own
        divergence = divergence * jnp.float32(2.0) / n_bits_f
        snr = total_sig / total_noise
        conf = snr * (jnp.float32(1.0) - divergence)
        ampl = total_sig / n_bits_f

        ok_d = mism_d == 0
        out_ref[0, 0] = u(jnp.where(ok_d, conf, zero), jnp.uint32)
        out_ref[0, 1] = u(jnp.where(ok_d, ampl, zero), jnp.uint32)
        out_ref[0, 2] = u(bits_lo, jnp.uint32)

    in_specs = [pl.BlockSpec((kdim, 512), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for j in range(n_blocks):
        in_specs.append(pl.BlockSpec(
            (1, r_out, 128),
            functools.partial(lambda b, i, j=0: (b, i + j, 0), j=j),
            memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4, r_out, 128),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 4, n_tiles * r_out, 128),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_corr, kdim), jnp.float32),
            pltpu.VMEM((r_out, ov * 128), jnp.float32),
            pltpu.VMEM((r_out, ov * 128), jnp.float32),
        ] + ([pltpu.VMEM((r_out, n_bits * 128), jnp.float32)]
             if tapshare else []),
    )
    w_np = make_banded_w(
        np.frombuffer(basis_bytes, np.float32).reshape(4, nb).copy())
    n_rows_in = (n_tiles + n_blocks - 1) * r_out
    return fn, w_np, n_rows_in, n_blocks


def main():
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "1200"
    variants = (sys.argv[4].split(",") if len(sys.argv) > 4
                else ["full", "nodiv", "nop2", "nop1", "mmdef", "noim"])

    import jax
    import jax.numpy as jnp

    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.demod import make_basis
    from minimodem_tpu.ops.device_rx import (
        _round_up_pow2, device_rx_key, geo_from_key)
    from minimodem_tpu.ops.pallas_score import _pick_tile

    m = FskModem(mode, precision="float32")
    key = device_rx_key(m.cfg, "float32")
    geo = geo_from_key(key)
    basis_np = np.ascontiguousarray(
        make_basis(geo, np.float32), np.float32)
    geo_key = (basis_np.tobytes(), int(geo.nb), float(geo.magscalar),
               tuple(int(v) for v in geo.bit_begin), int(geo.n_bits),
               tuple(int(v) for v in geo.req_data),
               tuple(int(v) for v in geo.req_sync))

    n_samp = int(audio_seconds * m.cfg.sample_rate)
    t_total = _round_up_pow2(n_samp)
    t_tile = _pick_tile(geo.nb, max(geo.bit_begin), t_total)
    n_tiles = t_total // t_tile
    print(f"mode={mode} t_total={t_total} t_tile={t_tile} "
          f"n_tiles={n_tiles} batch={batch} n_bits={geo.n_bits}",
          flush=True)

    rng = np.random.default_rng(0)
    base = None
    for variant in variants:
        fn, w_np, n_rows_in, n_blocks = build_variant(
            geo_key, n_tiles, batch, t_tile, variant)
        x3 = jnp.asarray(
            rng.standard_normal((batch, n_rows_in, 128)).astype(
                np.float32))
        w = jnp.asarray(w_np)

        def go(w, x3):
            with jax.enable_x64(False):
                out = fn(w, *([x3] * n_blocks))
            return jnp.sum(out[:, :, ::128])

        run_j = jax.jit(go)

        def run():
            return np.asarray(run_j(w, x3))

        run()
        dt = t(run)
        note = ""
        if variant == "full":
            base = dt
        elif base is not None:
            note = f"   (delta vs full {1e3*(dt-base):+7.2f} ms)"
        print(f"{variant:6s}: {dt*1e3:8.2f} ms{note}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
