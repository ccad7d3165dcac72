"""Attribute the pipelined serving loop's per-batch wall time.

The 64 x 60 s Bell202 steady state measured ~146 ms/batch (26.2k) while
device compute is ~117 ms — this probe times each host-side phase of
the dispatch/prefetch/collect loop (schedule packbits, h2d + enqueue,
async-copy kick, blocking collect) across N batches so the unhidden
~30 ms can be attributed and attacked.  Uses the exact bench shapes so
the jit cache from bench.py is reused.

Usage: python scripts/tpu_pipe_probe.py [audio_seconds] [batch] [depth]
"""

import sys
import time

sys.path.insert(0, ".")

from minimodem_tpu.bench import _bench_payload  # noqa: E402
from minimodem_tpu.codecs import Ascii8Codec  # noqa: E402
from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.ops.device_rx import DeviceLoopback  # noqa: E402
from minimodem_tpu.ops.tx_device import tx_bit_schedule  # noqa: E402


def main() -> int:
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    m = FskModem("1200", sample_rate=48000, precision="auto")
    base = _bench_payload(m.cfg, audio_seconds)
    sets = []
    for j in range(depth):
        payloads = [bytes((b + i + 7 * j) % 94 + 33 for b in base)
                    for i in range(batch)]
        scheds = [tx_bit_schedule(p, m.cfg, Ascii8Codec())
                  for p in payloads]
        sets.append(scheds)
    audio_one = (sum(len(s) for s in sets[0])
                 * m.cfg.bit_nsamples_tx / 48000.0)

    lb = DeviceLoopback(m.cfg, "auto")
    lb.run_events_batch(sets[0])  # compile

    tdisp, tpref, tcoll = [], [], []
    handles = []
    t_loop0 = time.perf_counter()
    for j in range(depth):
        t0 = time.perf_counter()
        handles.append(lb.dispatch_events_batch(sets[j]))
        t1 = time.perf_counter()
        if j >= 1:
            lb.prefetch_events_batch(handles[j - 1])
        t2 = time.perf_counter()
        if j >= 2:
            lb.collect_events_batch(handles[j - 2])
        t3 = time.perf_counter()
        tdisp.append(t1 - t0)
        tpref.append(t2 - t1)
        tcoll.append(t3 - t2)
    for h in handles[-2:]:
        lb.collect_events_batch(h)
    wall = time.perf_counter() - t_loop0

    def ms(x):
        return f"{1e3 * x:7.1f}"

    print(f"depth={depth} batch={batch} audio_one={audio_one:.1f}s "
          f"wall={wall * 1e3:.1f}ms per_batch={wall / depth * 1e3:.1f}ms "
          f"rtf={audio_one * depth / wall:.0f}x")
    print(" j  dispatch prefetch  collect")
    for j in range(depth):
        print(f"{j:2d} {ms(tdisp[j])} {ms(tpref[j])} {ms(tcoll[j])}")
    # steady-state rows only (skip fill)
    n = max(1, depth - 3)
    print(f"steady avg: dispatch {ms(sum(tdisp[3:]) / n)} "
          f"prefetch {ms(sum(tpref[3:]) / n)} "
          f"collect {ms(sum(tcoll[3:]) / n)}")

    # ---- staged variant: dispatch (packbits + h2d + enqueue) runs on a
    # single staging thread one batch ahead, overlapping the main
    # thread's blocking collect (both release the GIL while waiting) ----
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as ex:
        t0 = time.perf_counter()
        futs = [ex.submit(lb.dispatch_events_batch, sets[0])]
        handles = []
        for j in range(depth):
            if j + 1 < depth:
                futs.append(ex.submit(lb.dispatch_events_batch,
                                      sets[j + 1]))
            handles.append(futs[j].result())
            if j >= 1:
                lb.prefetch_events_batch(handles[j - 1])
            if j >= 2:
                lb.collect_events_batch(handles[j - 2])
        for h in handles[-2:]:
            lb.collect_events_batch(h)
        wall2 = time.perf_counter() - t0
    print(f"staged: wall={wall2 * 1e3:.1f}ms "
          f"per_batch={wall2 / depth * 1e3:.1f}ms "
          f"rtf={audio_one * depth / wall2:.0f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
