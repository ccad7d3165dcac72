"""Isolate per-iteration costs of a mosaic while_loop: scalar-only,
+dynamic block load, +one-hot scan, +dynamic byte store, +cond branch.

Each variant runs N iterations; report ns/iter.
"""

import sys
import time

import numpy as np

N_ITERS = 7200
W_FETCH = 256
W_RES = 9216
KC = 3


def build(variant: str):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(cand_ref, packed_hbm, out_ref, win_vmem, bytes_vmem, sem):
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W_FETCH), 1)

        def body(st):
            (i, pos, acc, n_by, win_base) = st
            if variant in ("load", "scan", "store", "cond"):
                need = pos - win_base + W_FETCH > W_RES

                @pl.when(need)
                def _():
                    base = pl.multiple_of((pos // 128) * 128, 128)
                    dma = pltpu.make_async_copy(
                        packed_hbm.at[pl.ds(0, 8), pl.ds(base, W_RES)],
                        win_vmem, sem)
                    dma.start()
                    dma.wait()

                win_base = jnp.where(need, (pos // 128) * 128, win_base)
                off_res = pos - win_base
                local = pl.multiple_of((off_res // 128) * 128, 128)
                blk = win_vmem[:, pl.ds(local, W_FETCH)]
                off = off_res - local
                acc = acc + jax.lax.bitcast_convert_type(
                    blk[0, :], jnp.float32)[0]

            if variant in ("scan", "store", "cond"):
                lanes = off + jnp.maximum(cand_ref[0, :], 0)
                oh = lane_iota == lanes[:, None]
                ce = jax.lax.bitcast_convert_type(blk[0, :], jnp.float32)
                c = jnp.sum(jnp.where(oh, ce[None, :], 0.0), axis=1,
                            dtype=jnp.float32)
                acc = acc + jnp.max(c)

            if variant in ("store", "cond"):
                @pl.when(i % 2 == 0)
                def _():
                    bytes_vmem[pl.ds(n_by, 1), :] = (i & 255)[None, None]
                n_by = n_by + jnp.where(i % 2 == 0, 1, 0)

            if variant == "cond":
                def t_(x):
                    lanes2 = off + jnp.maximum(cand_ref[0, :], 0)
                    oh2 = lane_iota == lanes2[:, None]
                    return jnp.sum(jnp.where(oh2, x[None, :], 0.0),
                                   dtype=jnp.float32)
                acc = acc + jax.lax.cond(
                    i % 64 == 0,
                    t_, lambda x: jnp.float32(0.0),
                    jax.lax.bitcast_convert_type(blk[1, :], jnp.float32))

            adv = 420 if variant != "scalar" else 1
            return (i + 1, (pos + adv) % (1 << 21), acc, n_by, win_base)

        st = jax.lax.while_loop(
            lambda st: st[0] < N_ITERS, body,
            (jnp.int32(0), jnp.int32(0), jnp.float32(0.0), jnp.int32(0),
             jnp.int32(-(1 << 30))))
        out_ref[0] = st[2] + st[0].astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, W_RES), jnp.uint32),
            pltpu.VMEM((1024, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return jax.jit(fn)


def main():
    import jax
    import jax.numpy as jnp

    cand = jnp.asarray(np.array([[0, 20, 40], [20, 36, 4]], np.int32))
    packed = jnp.zeros((8, (1 << 21) + W_RES + 512), jnp.uint32)
    for variant in ("scalar", "load", "scan", "store", "cond"):
        fn = build(variant)
        with jax.enable_x64(False):
            r = np.asarray(fn(cand, packed))
            t0 = time.perf_counter()
            for _ in range(3):
                r = np.asarray(fn(cand, packed))
            dt = (time.perf_counter() - t0) / 3
        print(f"{variant:8s}: {dt*1e3:7.2f} ms  "
              f"{dt*1e9/N_ITERS:8.1f} ns/iter  (out={float(r[0]):.1f})",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
