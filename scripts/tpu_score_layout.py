"""Measure stage-1 scorer cost for candidate packed-score layouts.

Round-2 bisect (ROADMAP item 1): stage 1 is data-movement-bound at
~110 GB/s effective; the out stream (32 B/offset, 8 u32 channels) is
the dominant term.  Only 4 channels are semantically needed
(conf_data, conf_sync, ampl-ungated, bits_lo) for n_bits <= 32
geometries — ampl_d/ampl_s are one value gated by flags the consumer
already derives from conf>0, and 6/7 are zero padding.

Variants measured here (64 x 60 s Bell202 unless overridden):
  v2   [B, 8, NR, 128]  32 B/offset  (current production)
  v3a  [B, 4, NR, 128]  16 B/offset  (risk: round-2 showed a 6-row
       variant SLOWER; does 4 behave like 6 or like 8?)
  v3b  [B, 8, NR/2, 128] 16 B/offset, adjacent 128-blocks paired:
       out[c][j] = chan c of block 2j, out[c+4][j] = chan c of block
       2j+1 (keeps the 8-sublane out structure that measured fastest)
"""

import sys
import time
import functools

import numpy as np


def t(fn, n=5):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def build_variant(geo_key, n_tiles, batch, t_tile, layout):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from minimodem_tpu.ops.pallas_score import _statics
    from minimodem_tpu.ops.pallas_demod import make_banded_w

    (basis_bytes, nb, magscalar, bit_begin, n_bits, req_data,
     req_sync) = geo_key
    max_begin = max(bit_begin)
    kdim, r_out, n_blocks, r_corr, k128, ov = _statics(nb, max_begin,
                                                       t_tile)
    eps = np.float32(np.finfo(np.float32).eps)
    scal = np.float32(magscalar)
    n_bits_f = np.float32(n_bits)

    def kernel(*refs):
        w_ref = refs[0]
        x_refs = refs[1:1 + n_blocks]
        out_ref = refs[1 + n_blocks]
        x2_sc = refs[2 + n_blocks]
        pss = refs[3 + n_blocks]
        png = refs[4 + n_blocks]

        x_full = jnp.concatenate([r[0] for r in x_refs], axis=0)
        for c in range(k128):
            w = min(128, kdim - c * 128)
            x2_sc[:, c * 128:c * 128 + w] = x_full[c:c + r_corr, :w]
        prod = jnp.dot(x2_sc[...], w_ref[...],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        mm = jnp.sqrt(prod[:, 0:128] * prod[:, 0:128]
                      + prod[:, 128:256] * prod[:, 128:256]) * scal
        ms = jnp.sqrt(prod[:, 256:384] * prod[:, 256:384]
                      + prod[:, 384:512] * prod[:, 384:512]) * scal
        bitp = mm > ms
        sig = jnp.where(bitp, mm, ms)
        ss = jnp.where(bitp, sig, -sig)
        noise = jnp.where(bitp, ms, mm)
        ng = jnp.where(noise > eps, noise, jnp.float32(0.0))
        for c in range(ov):
            pss[:, c * 128:(c + 1) * 128] = ss[c:c + r_out, :]
            png[:, c * 128:(c + 1) * 128] = ng[c:c + r_out, :]

        def shift_ss(s0):
            return pss[:, s0:s0 + 128]

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
        ok_s = mism_s == 0
        zero = jnp.float32(0.0)
        u = jax.lax.bitcast_convert_type
        conf_d = u(jnp.where(ok_d, conf, zero), jnp.uint32)
        conf_s = u(jnp.where(ok_s, conf, zero), jnp.uint32)
        if layout == "v2":
            out_ref[0, 0] = conf_d
            out_ref[0, 1] = conf_s
            out_ref[0, 2] = u(jnp.where(ok_d, ampl, zero), jnp.uint32)
            out_ref[0, 3] = u(jnp.where(ok_s, ampl, zero), jnp.uint32)
            out_ref[0, 4] = u(bits_lo, jnp.uint32)
            out_ref[0, 5] = u(bits_hi, jnp.uint32)
            zu = jnp.zeros((r_out, 128), jnp.uint32)
            out_ref[0, 6] = zu
            out_ref[0, 7] = zu
        elif layout == "v3a":
            out_ref[0, 0] = conf_d
            out_ref[0, 1] = conf_s
            out_ref[0, 2] = u(ampl, jnp.uint32)
            out_ref[0, 3] = u(bits_lo, jnp.uint32)
        elif layout == "v3b":
            amplu = u(ampl, jnp.uint32)
            bitsu = u(bits_lo, jnp.uint32)
            for c, arr in enumerate((conf_d, conf_s, amplu, bitsu)):
                v = arr.reshape(r_out // 2, 256)
                out_ref[0, c] = v[:, 0:128]
                out_ref[0, c + 4] = v[:, 128:256]
        else:
            raise AssertionError(layout)

    in_specs = [pl.BlockSpec((kdim, 512), lambda b, i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for j in range(n_blocks):
        in_specs.append(pl.BlockSpec(
            (1, r_out, 128),
            functools.partial(lambda b, i, j=0: (b, i + j, 0), j=j),
            memory_space=pltpu.VMEM))
    if layout == "v2":
        out_spec = pl.BlockSpec((1, 8, r_out, 128),
                                lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, 8, n_tiles * r_out, 128),
                                         jnp.uint32)
    elif layout == "v3a":
        out_spec = pl.BlockSpec((1, 4, r_out, 128),
                                lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, 4, n_tiles * r_out, 128),
                                         jnp.uint32)
    else:
        out_spec = pl.BlockSpec((1, 8, r_out // 2, 128),
                                lambda b, i: (b, 0, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (batch, 8, n_tiles * (r_out // 2), 128), jnp.uint32)

    fn = pl.pallas_call(
        kernel,
        grid=(batch, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((r_corr, kdim), jnp.float32),
            pltpu.VMEM((r_out, ov * 128), jnp.float32),
            pltpu.VMEM((r_out, ov * 128), jnp.float32),
        ],
    )
    w_np = make_banded_w(
        np.frombuffer(basis_bytes, np.float32).reshape(4, nb).copy())
    n_rows_in = (n_tiles + n_blocks - 1) * r_out
    return fn, w_np, n_rows_in, n_blocks


def main():
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    mode = sys.argv[3] if len(sys.argv) > 3 else "1200"

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

    # baseline: the production v2 packer, timed through the same
    # jit + strided-sum harness as the variants
    from minimodem_tpu.ops.device_rx import make_score_packer
    packer = make_score_packer(key, t_total, "float32")
    xb = jnp.asarray(rng.standard_normal(
        (batch, t_total + geo.halo)).astype(np.float32))
    pkv2 = jax.jit(lambda a: jnp.sum(jax.vmap(packer)(a)[:, :, ::1024]))
    np.asarray(pkv2(xb))
    dt = t(lambda: np.asarray(pkv2(xb)))
    gb = (out_bytes("v2", batch, n_tiles, t_tile) + xb.nbytes) / 1e9
    print(f"v2  : {dt*1e3:8.2f} ms   {gb/dt:7.1f} GB/s effective "
          f"(in+out {gb*1e3:.0f} MB)", flush=True)

    for layout in ("v3a", "v3b"):
        fn, w_np, n_rows_in, n_blocks = build_variant(
            geo_key, n_tiles, batch, t_tile, layout)
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
        gb = (out_bytes(layout, batch, n_tiles, t_tile)
              + x3.nbytes * 1) / 1e9
        print(f"{layout:4s}: {dt*1e3:8.2f} ms   "
              f"{gb/dt:7.1f} GB/s effective (in+out {gb*1e3:.0f} MB)",
              flush=True)


def out_bytes(layout, batch, n_tiles, t_tile):
    r_out = t_tile // 128
    if layout == "v2":
        return batch * 8 * n_tiles * r_out * 128 * 4
    return batch * 4 * n_tiles * r_out * 128 * 4


if __name__ == "__main__":
    sys.exit(main())
