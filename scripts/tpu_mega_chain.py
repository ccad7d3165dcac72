"""Device-time mega measurement: K chained kernel runs in one jit
(cancels the ~30 ms axon round-trip)."""
import sys, time
import numpy as np

def t(fn, n=4):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    return best

def main():
    audio_seconds, batch, K = 60.0, 64, 4
    import jax, jax.numpy as jnp
    from minimodem_tpu.bench import _bench_payload
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.device_rx import (
        _round_up_pow2, device_rx_key, geometry_from_config,
        make_score_packer_planes)
    from minimodem_tpu.ops.pallas_rx import build_mega_rx
    import minimodem_tpu.ops.pallas_rx as prx

    m = FskModem("1200", precision="float32")
    base = _bench_payload(m.cfg, audio_seconds)
    payloads = [bytes((c + i) % 94 + 33 for c in base) for i in range(batch)]
    waves = [m.modulate(p) for p in payloads]
    L = max(len(w) for w in waves)
    totals = np.asarray([len(w) for w in waves], np.int32)
    audio_sec = float(totals.sum()) / m.cfg.sample_rate
    key = device_rx_key(m.cfg, "float32")
    geo = geometry_from_config(m.cfg, "float32")
    t_total = _round_up_pow2(int(totals.max()) + m.cfg.nsamples_overscan + 1)
    xp = np.zeros((batch, t_total + geo.halo), np.float32)
    for i, w in enumerate(waves):
        xp[i, :len(w)] = w
    xd = jax.block_until_ready(jax.device_put(xp))

    packer, n_ch, _ = make_score_packer_planes(key, t_total, "float32")
    pk2 = jax.jit(lambda a: jax.vmap(packer)(a).reshape(batch * n_ch, t_total))
    packed = jax.block_until_ready(pk2(xd))

    kern, max_events, e_pad = build_mega_rx(key, t_total, False, batch)

    # combined production composite (packer at mega_score_len + kern,
    # no wrapper pad) via _mega_run_fn
    from minimodem_tpu.ops.pallas_rx import _mega_run_fn, mega_score_len
    fn_c, _, t_score = _mega_run_fn(key, t_total, batch, False, "float32")
    xp2 = np.zeros((batch, t_score + geo.halo), np.float32)
    for i, w in enumerate(waves):
        xp2[i, :len(w)] = w
    xd2 = jax.block_until_ready(jax.device_put(xp2))
    thr2 = jnp.asarray([1.5, 2.3], np.float32)
    td = jnp.asarray(totals)
    ci0 = jnp.zeros((batch, 8), jnp.int32)
    cf0 = jnp.zeros((batch, 4), jnp.float32)

    from minimodem_tpu.utils.aot import jit_mosaic

    def once(p, ci, cf):
        return kern(p, td, thr2, ci, cf)

    def chainK(p):
        def body(i, acc):
            out = once(p, ci0 + (acc[:, :1] & 0), cf0)
            return acc + out[2]    # ci carry-out as dependency
        return jax.lax.fori_loop(0, K, body, jnp.zeros((batch, 8), jnp.int32))

    f1 = jit_mosaic(lambda p: once(p, ci0, cf0)[2])
    fK = jit_mosaic(chainK)
    np.asarray(f1(packed)); np.asarray(fK(packed))
    d1 = t(lambda: np.asarray(f1(packed)[0, 0:1]))
    dK = t(lambda: np.asarray(fK(packed)[0, 0:1]))
    per = (dK - d1) / (K - 1)
    print(f"mega x1 {d1*1e3:.1f} ms, x{K} {dK*1e3:.1f} ms -> "
          f"{per*1e3:.1f} ms/run device -> {audio_sec/per:.0f}x", flush=True)

    # packer the same way
    def pchain(a):
        def body(i, acc):
            out = jax.vmap(packer)(a + (acc[0:1, 0:1] & 0).astype(a.dtype))
            return acc + out.reshape(batch * n_ch, t_total)[:, :8].astype(jnp.uint32)
        return jax.lax.fori_loop(0, K, body, jnp.zeros((batch * n_ch, 8), jnp.uint32))
    p1 = jit_mosaic(lambda a: jax.vmap(packer)(a).reshape(batch * n_ch, t_total)[:, :8])
    pK = jit_mosaic(pchain)
    np.asarray(p1(xd)); np.asarray(pK(xd))
    d1 = t(lambda: np.asarray(p1(xd)[0, 0:1]))
    dK = t(lambda: np.asarray(pK(xd)[0, 0:1]))
    per = (dK - d1) / (K - 1)
    print(f"packer x1 {d1*1e3:.1f} ms, x{K} {dK*1e3:.1f} ms -> "
          f"{per*1e3:.1f} ms/run device -> {audio_sec/per:.0f}x", flush=True)

    packer2, n_ch2, _ = make_score_packer_planes(key, t_score, "float32")
    def c1(a):
        packed = jax.vmap(packer2)(a).reshape(batch * n_ch2, t_score)
        return kern(packed, td, thr2, ci0, cf0)[2]
    def cK(a):
        def body(i, acc):
            packed = jax.vmap(packer2)(
                a + acc[0:1, 0:1].astype(a.dtype) * 0).reshape(
                    batch * n_ch2, t_score)
            out = kern(packed, td, thr2, ci0, cf0)
            return acc + out[2].astype(jnp.float32)[:1, :1]
        return jax.lax.fori_loop(0, K, body, jnp.zeros((1, 1), jnp.float32))
    f1c = jit_mosaic(c1); fKc = jit_mosaic(cK)
    np.asarray(f1c(xd2)); np.asarray(fKc(xd2))
    d1 = t(lambda: np.asarray(f1c(xd2)[0, 0:1]))
    dK = t(lambda: np.asarray(fKc(xd2)[0, 0:1]))
    per = (dK - d1) / (K - 1)
    print(f"combo x1 {d1*1e3:.1f} ms, x{K} {dK*1e3:.1f} ms -> "
          f"{per*1e3:.1f} ms/run device -> {audio_sec/per:.0f}x", flush=True)

if __name__ == "__main__":
    main()
