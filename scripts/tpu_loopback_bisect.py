"""Stage-split the headline bench path (DeviceLoopback.run_events_batch):
h2d of the bit schedules, device compute (synth+packer+mega), d2h of the
compact results, host _collect_results decode.

Timing per CLAUDE.md: block_until_ready is dispatch-only under axon;
every leg is closed with a dependent device->host transfer.
"""

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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    import jax.numpy as jnp

    from minimodem_tpu.bench import _bench_payload
    from minimodem_tpu.codecs import Ascii8Codec
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.device_rx import (
        DeviceLoopback, _collect_results, zero_carry)
    from minimodem_tpu.ops.tx_device import tx_bit_schedule

    m = FskModem("1200", precision="float32")
    base = _bench_payload(m.cfg, audio_seconds)
    payloads = [bytes((b + i) % 94 + 33 for b in base)
                for i in range(batch)]
    scheds = [tx_bit_schedule(p, m.cfg, Ascii8Codec()) for p in payloads]
    audio_sec = sum(len(s) for s in scheds) * m.cfg.bit_nsamples_tx \
        / m.cfg.sample_rate

    lb = DeviceLoopback(m.cfg, "float32")
    b_real = [len(s) for s in scheds]
    b_pad = ((max(b_real) + 4095) // 4096) * 4096
    bits = np.zeros((len(scheds), b_pad), np.uint8)
    for i, s in enumerate(scheds):
        bits[i, :len(s)] = s
    bits = np.packbits(bits, axis=1, bitorder="little")
    totals = np.asarray([n * lb.bit_ns for n in b_real], np.int32)
    fn, compact, use_mega = lb._fn_for(b_pad, batch)
    print(f"audio={audio_sec:.0f}s bits={bits.nbytes/1e6:.1f}MB "
          f"use_mega={use_mega}", flush=True)

    # 1. h2d of the schedules alone (dependent d2h closes the timing)
    probe = jax.jit(lambda a: jnp.sum(a[:, ::4096].astype(jnp.int32)))

    def h2d():
        d = jnp.asarray(bits)
        return np.asarray(probe(d))

    h2d()
    dt = t(h2d)
    print(f"h2d schedules: {dt*1e3:7.1f} ms "
          f"({bits.nbytes/dt/1e6:.0f} MB/s)", flush=True)

    args = (jnp.asarray(bits), jnp.asarray(totals), np.float32(1.5),
            np.float32(2.3), zero_carry(batch))

    # 2. full device program, tiny dependent d2h (compute only)
    def compute_only():
        out = fn(*args)
        return np.asarray(out[0][0:1])

    compute_only()
    dt = t(compute_only)
    print(f"device compute (tiny d2h): {dt*1e3:7.1f} ms "
          f"-> {audio_sec/dt:.0f}x", flush=True)

    # 3. compute + full result d2h
    def with_d2h():
        out = fn(*args)
        return [np.asarray(o) for o in out]

    res = with_d2h()
    nb = sum(r.nbytes for r in res)
    dt = t(with_d2h)
    print(f"compute + result d2h ({nb/1e6:.1f} MB): {dt*1e3:7.1f} ms "
          f"-> {audio_sec/dt:.0f}x", flush=True)

    # 4. the production call (adds host _collect_results)
    def full():
        out = fn(*args)
        return _collect_results(out, batch, compact)

    full()
    dt = t(full)
    print(f"full run_events_batch body: {dt*1e3:7.1f} ms "
          f"-> {audio_sec/dt:.0f}x", flush=True)

    # 5. everything incl. schedule h2d (what the bench times)
    def e2e():
        out = fn(jnp.asarray(bits), jnp.asarray(totals), np.float32(1.5),
                 np.float32(2.3), zero_carry(batch))
        return _collect_results(out, batch, compact)

    dt = t(e2e)
    print(f"bench-equivalent (h2d + compute + collect): {dt*1e3:7.1f} ms "
          f"-> {audio_sec/dt:.0f}x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
