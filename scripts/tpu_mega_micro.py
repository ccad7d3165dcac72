"""Isolate TPU costs: link bandwidth, packer, mega kernel, XLA stage-3."""

import sys
import time

import numpy as np


def t(fn, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    import jax
    import jax.numpy as jnp

    from minimodem_tpu.bench import _bench_payload
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.device_rx import (
        _round_up_pow2, device_rx_key, geometry_from_config,
        make_score_packer_planes)
    from minimodem_tpu.ops.pallas_rx import build_mega_rx

    m = FskModem("1200", precision="float32")
    base = _bench_payload(m.cfg, audio_seconds)
    payloads = [bytes((c + i) % 94 + 33 for c in base) for i in range(batch)]
    waves = [m.modulate(p) for p in payloads]
    L = max(len(w) for w in waves)
    x = np.zeros((batch, L), np.float32)
    for i, w in enumerate(waves):
        x[i, : len(w)] = w
    totals = np.asarray([len(w) for w in waves], np.int32)
    audio_sec = float(totals.sum()) / m.cfg.sample_rate

    key = device_rx_key(m.cfg, "float32")
    geo = geometry_from_config(m.cfg, "float32")
    t_total = _round_up_pow2(int(totals.max()) + m.cfg.nsamples_overscan + 1)
    xp = np.zeros((batch, t_total + geo.halo), np.float32)
    xp[:, :L] = x[:, : t_total + geo.halo]

    # 1. link bandwidth
    dt = t(lambda: jax.block_until_ready(jax.device_put(xp)))
    print(f"h2d {xp.nbytes/1e6:.1f} MB: {dt*1e3:.0f} ms "
          f"({xp.nbytes/dt/1e6:.0f} MB/s)", flush=True)
    xd = jax.block_until_ready(jax.device_put(xp))

    # d2h probe (small result-sized transfer)
    small = jnp.zeros((8, 8192), jnp.uint32) + 1
    np.asarray(small)
    dt = t(lambda: np.asarray(small))
    print(f"d2h {small.nbytes/1e3:.0f} KB: {dt*1e3:.1f} ms "
          f"({small.nbytes/dt/1e6:.0f} MB/s)", flush=True)

    # 2. packer alone (force a tiny d2h to prove completion)
    packer, n_ch, _ = make_score_packer_planes(key, t_total, "float32")
    pk = jax.jit(lambda a: jnp.sum(
        jax.vmap(packer)(a).reshape(batch * n_ch, t_total)[:, ::1024]))
    np.asarray(pk(xd))
    dt = t(lambda: np.asarray(pk(xd)))
    print(f"packer(+reduce): {dt*1e3:.1f} ms -> {audio_sec/dt:.0f}x",
          flush=True)
    pk2 = jax.jit(lambda a: jax.vmap(packer)(a).reshape(batch * n_ch, t_total))
    packed = jax.block_until_ready(pk2(xd))

    # 3. mega kernel alone, forcing the scalar counters to host
    kern, max_events, e_pad = build_mega_rx(key, t_total, False, batch)
    thr2 = jnp.asarray([1.5, 2.3], np.float32)
    td = jnp.asarray(totals)
    ci0 = jnp.zeros((batch, 8), jnp.int32)
    cf0 = jnp.zeros((batch, 4), jnp.float32)

    def run_kern():
        with jax.enable_x64(False):
            out = kern(packed, td, thr2, ci0, cf0)
        return np.asarray(out[3])

    nby = run_kern()
    dt = t(run_kern)
    nfr = int(nby.sum()) + 1
    print(f"mega kernel(+nbytes d2h): {dt*1e3:.1f} ms -> {audio_sec/dt:.0f}x "
          f"({dt*1e6/nfr:.2f} us/frame, {nfr} frames)", flush=True)

    # 4. full result materialization (events + bytes)
    def run_full():
        with jax.enable_x64(False):
            out = kern(packed, td, thr2, ci0, cf0)
        return [np.asarray(o) for o in out]

    run_full()
    dt = t(run_full)
    print(f"mega kernel(full d2h {batch*9*e_pad*4/1e3:.0f} KB): "
          f"{dt*1e3:.1f} ms -> {audio_sec/dt:.0f}x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
