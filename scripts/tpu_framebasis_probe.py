"""Round-5: measure the FFT-batched / frame-length-basis demod
candidate (ROADMAP "fundamentally different demodulation"; VERDICT r4
item 2) against the shipping scorer.

The candidate replaces the shared per-sample correlation + shifted
comb reads with direct per-(bit, band) frame-length bases so every
tap plane lands 128-aligned:

  corrF[b, k][o] = sum_t x[o+t] * basis_b[t - begin_k]

As a banded matmul that is [*, KF] x [KF, 4*n_bits*128] per 128-offset
row block — for Bell-202 (n_bits=11, nb=40, max_begin=400): KF=576,
5632 columns, i.e. ~37x the MXU work of the shipping stage 1
([*, 168] x [168, 512]), because each tap's correlation is computed
independently instead of shared via slab shifts.  A milder variant
keeps stage 1 and only MXU-aligns the 11 tap planes with 0/1 shift
matrices ([*, 640] x [640, 128] per tap, exact-bf16 3-pass split).

This harness times both matmul cores chained on-device (fori_loop with
a data dependency, CLAUDE.md timing rules) and scales to the 64 x 60 s
bench batch (184.3M offsets = 1.44M row-blocks of 128), giving each
candidate's LOWER bound — the matmul alone, before magnitudes
(x11 more sqrt/select work than today) or divergence arithmetic.
Compare against the shipping fused scorer: 57.8 ms chained.

Run on the real TPU:  python scripts/tpu_framebasis_probe.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TOTAL_ROWS = 64 * (2_880_000 // 128)      # 64 x 60 s of 48 kHz offsets


def chained_ms(make_step, rows, iters):
    import jax
    import jax.numpy as jnp

    step = make_step()

    def go(seed):
        def body(i, acc):
            return acc + step(acc)

        return jax.lax.fori_loop(0, iters, body, seed)

    run = jax.jit(go)
    out = np.asarray(run(jnp.float32(0.0)))      # compile + run
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jnp.float32(1e-30))
        _ = np.asarray(out)                      # dependent d2h sync
        best = min(best, time.perf_counter() - t0)
    per_iter = best / iters
    return per_iter * 1e3, per_iter * (TOTAL_ROWS / rows) * 1e3


def matmul_probe(rows, kdim, cols, dtype, passes, label, iters=40):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((rows, kdim)).astype(np.float32)
    w_np = rng.standard_normal((kdim, cols)).astype(np.float32)

    def make_step():
        # NumPy constants, converted INSIDE the trace (CLAUDE.md: jnp
        # arrays captured in a jitted closure lower as device constants,
        # ~70 s each on this harness)
        if dtype == "f32_highest":
            def step(acc):
                a = jnp.asarray(a_np)
                w = jnp.asarray(w_np)
                p = jnp.dot(a + acc * jnp.float32(1e-30), w,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                return p[0, 0] * jnp.float32(1e-30)
        else:                                    # bf16 x `passes`
            def step(acc):
                a = jnp.asarray(a_np, jnp.bfloat16)
                w = jnp.asarray(w_np, jnp.bfloat16)
                s = jnp.float32(0.0)
                for j in range(passes):
                    # distinct per-pass A so XLA cannot CSE the dots
                    aj = a + ((acc + jnp.float32(j))
                              .astype(jnp.bfloat16) * jnp.bfloat16(1e-30))
                    p = jnp.dot(aj, w,
                                preferred_element_type=jnp.float32)
                    s = s + p[0, 0]
                return s * jnp.float32(1e-30)
        return step

    ms_iter, ms_batch = chained_ms(make_step, rows, iters)
    flops = rows * kdim * cols * 2 * (passes if dtype != "f32_highest"
                                      else 6)
    print(json.dumps({
        "probe": label, "rows": rows, "kdim": kdim, "cols": cols,
        "ms_per_iter": round(ms_iter, 3),
        "ms_per_64x60s_batch": round(ms_batch, 1),
        "eff_bf16_tflops": round(flops / (ms_iter / 1e3) / 1e12, 1),
    }), flush=True)
    return ms_batch


def main():
    rows = 8192                                  # 8K row-blocks per iter
    # shipping stage 1 core (shared correlation, banded W)
    base = matmul_probe(rows, 168, 512, "f32_highest", 6,
                        "stage1_shipping_core")
    # candidate A: frame-length bases (every tap computed directly)
    fb = matmul_probe(rows, 576, 5632, "f32_highest", 6,
                      "framebasis_core", iters=6)
    # candidate B: MXU shift-alignment of the 11 tap planes
    sh = matmul_probe(rows, 640, 11 * 128, "bf16", 3,
                      "shiftmxu_core", iters=20)
    print(json.dumps({
        "summary": {
            "stage1_core_ms": round(base, 1),
            "framebasis_core_ms": round(fb, 1),
            "shiftmxu_core_ms": round(sh, 1),
            "shipping_full_scorer_ms": 57.8,
            "shipping_pass2_unaligned_ms": 16.0,
        }}, ), flush=True)


if __name__ == "__main__":
    sys.exit(main())
