"""Does a mosaic while_loop cost scale with iteration count, and how much
is fixed per-call overhead?"""

import sys
import time

import numpy as np


def build(n_iters: int, with_mod: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(out_ref):
        def body(st):
            i, acc = st
            if with_mod:
                acc = (acc + i) % (1 << 21)
            else:
                acc = acc + i
            return (i + 1, acc)

        st = jax.lax.while_loop(
            lambda st: st[0] < n_iters, body,
            (jnp.int32(0), jnp.int32(0)))
        out_ref[0] = st[1]

    fn = pl.pallas_call(
        kernel,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
    )
    return jax.jit(fn)


def main():
    import jax

    for with_mod in (False, True):
        for n in (100, 7200, 72000):
            fn = build(n, with_mod)
            with jax.enable_x64(False):
                r = np.asarray(fn())
                t0 = time.perf_counter()
                for _ in range(5):
                    r = np.asarray(fn())
                dt = (time.perf_counter() - t0) / 5
            print(f"mod={int(with_mod)} n={n:6d}: {dt*1e3:8.2f} ms "
                  f"({dt*1e9/n:8.1f} ns/iter) out={int(r[0])}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
