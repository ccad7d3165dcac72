"""Round-5 diagnosis: per-stage split of the pipelined headline batch.

The r4 VERDICT attributed the 28.5k-vs-42.3k gap to a ~25 ms fixed
per-execute cost and prescribed chaining; the chained grid measured
SLOWER (tpu_chain_headline.py).  This probe splits the pipelined
steady-state ms/batch into compute / h2d schedule upload / d2h result
collect by toggling each leg:

  A. baseline pipeline (host inputs, full collect)    — the headline
  B. device-resident inputs, full collect             — removes h2d
  C. device-resident inputs, dispatch-only (block on a 1-element tap)
                                                      — removes d2h+unpack
  D. device-resident inputs, chained K=4, full collect
  E. host inputs, async device_put 2 batches ahead    — overlapped h2d

Run on the real TPU:  python scripts/tpu_stage_split.py [audio_s] [batch]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

AUDIO = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
PIPE = 8


def main() -> int:
    import jax
    import jax.numpy as jnp

    from minimodem_tpu.bench import _bench_payload
    from minimodem_tpu.codecs import Ascii8Codec
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.device_rx import (
        DeviceLoopback, _collect_results, _sched_pad, zero_carry)
    from minimodem_tpu.ops.tx_device import tx_bit_schedule

    m = FskModem("1200")
    base = _bench_payload(m.cfg, AUDIO)
    sets = []
    for j in range(PIPE):
        payloads = [bytes((b + i + 7 * j) % 94 + 33 for b in base)
                    for i in range(BATCH)]
        scheds = [tx_bit_schedule(p, m.cfg, Ascii8Codec())
                  for p in payloads]
        sets.append(scheds)
    lb = DeviceLoopback(m.cfg)
    audio_one = (sum(len(s) for s in sets[0])
                 * lb.bit_ns / 48000.0)

    # pre-pack host arrays once (identical to dispatch_events_batch)
    b_pad = _sched_pad(max(len(s) for ss in sets for s in ss))
    packed = []
    for scheds in sets:
        bits = np.zeros((BATCH, b_pad), np.uint8)
        for i, s in enumerate(scheds):
            bits[i, :len(s)] = s
        totals = np.asarray([len(s) * lb.bit_ns for s in scheds], np.int32)
        packed.append((np.packbits(bits, axis=1, bitorder="little"),
                       totals))
    fn, compact, _ = lb._fn_for(b_pad, BATCH)
    carry = zero_carry(BATCH)
    thr, lim = np.float32(1.5), np.float32(2.3)

    dev = [(jnp.asarray(pk), jnp.asarray(tt)) for pk, tt in packed]
    jax.block_until_ready(dev[0][0])
    np.asarray(dev[-1][1][0:1])        # real sync (CLAUDE.md)

    out0 = fn(dev[0][0], dev[0][1], thr, lim, carry)  # compile
    _collect_results(out0, BATCH, compact)

    def report(name, dt, batches=PIPE):
        ms = dt / batches * 1000.0
        print(json.dumps({
            "cfg": name, "ms_per_batch": round(ms, 1),
            "rtf": round(audio_one * batches / dt, 1)}), flush=True)

    def pipe_loop(inputs, collect=True):
        outs, res = [], []
        t0 = time.perf_counter()
        for j in range(PIPE):
            outs.append(fn(inputs[j][0], inputs[j][1], thr, lim, carry))
            if j >= 1:
                o = outs[j - 1]
                for x in ((o[0],) if compact else (o[0], o[1])):
                    x.copy_to_host_async()
            if j >= 2 and collect:
                res.append(_collect_results(outs[j - 2], BATCH, compact))
        if collect:
            for o in outs[-2:]:
                res.append(_collect_results(o, BATCH, compact))
        else:
            np.asarray(outs[-1][0].ravel()[0:1])   # dependent sync tap
        return time.perf_counter() - t0, res

    # A. baseline: host inputs (device_put inside the loop, like the
    # bench's dispatch path)
    host_in = [(jnp.asarray(pk), jnp.asarray(tt)) for pk, tt in packed]
    del host_in
    dt, _ = pipe_loop([(jnp.asarray(pk), jnp.asarray(tt))
                       for pk, tt in packed])
    report("A_host_inputs_full", dt)
    dt, _ = pipe_loop([(jnp.asarray(pk), jnp.asarray(tt))
                       for pk, tt in packed])
    report("A_host_inputs_full_rep2", dt)

    # B. device-resident inputs
    dt, _ = pipe_loop(dev)
    report("B_device_inputs_full", dt)
    dt, _ = pipe_loop(dev)
    report("B_device_inputs_full_rep2", dt)

    # C. device-resident, dispatch-only
    dt, _ = pipe_loop(dev, collect=False)
    report("C_device_inputs_nocollect", dt)
    dt, _ = pipe_loop(dev, collect=False)
    report("C_device_inputs_nocollect_rep2", dt)

    # D. chained K=4 on device-resident stacked inputs
    K = 4
    fnk, compactk, _ = lb._fn_for(b_pad, BATCH, chain=K)
    stacked = []
    for g in range(PIPE // K):
        pk = jnp.asarray(np.stack(
            [packed[g * K + j][0] for j in range(K)]))
        tt = jnp.asarray(np.stack(
            [packed[g * K + j][1] for j in range(K)]))
        stacked.append((pk, tt))
    outk = fnk(stacked[0][0], stacked[0][1], thr, lim, carry)  # compile
    jax.block_until_ready(outk[0])
    t0 = time.perf_counter()
    outs = [fnk(s[0], s[1], thr, lim, carry) for s in stacked]
    for o in outs:
        for j in range(K):
            _collect_results((o[0][j], o[1][j]), BATCH, compactk)
    dt = time.perf_counter() - t0
    report("D_device_chain4_full", dt)

    # E. host inputs uploaded 2 batches ahead (async device_put)
    t0 = time.perf_counter()
    ins = [(jnp.asarray(packed[0][0]), jnp.asarray(packed[0][1])),
           (jnp.asarray(packed[1][0]), jnp.asarray(packed[1][1]))]
    outs, res = [], []
    for j in range(PIPE):
        outs.append(fn(ins[j][0], ins[j][1], thr, lim, carry))
        if j + 2 < PIPE:
            ins.append((jnp.asarray(packed[j + 2][0]),
                        jnp.asarray(packed[j + 2][1])))
        if j >= 1:
            o = outs[j - 1]
            for x in ((o[0],) if compact else (o[0], o[1])):
                x.copy_to_host_async()
        if j >= 2:
            res.append(_collect_results(outs[j - 2], BATCH, compact))
    for o in outs[-2:]:
        res.append(_collect_results(o, BATCH, compact))
    dt = time.perf_counter() - t0
    report("E_host_prefetch2_full", dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
