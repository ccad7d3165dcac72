"""Real-TPU megakernel check: parity vs the XLA device receiver + timing.

Usage: python scripts/tpu_mega_bench.py [audio_seconds] [batch]
"""

import sys
import time

import numpy as np


def main():
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from minimodem_tpu.bench import _bench_payload
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.device_rx import DeviceReceiver
    from minimodem_tpu.ops.pallas_rx import MegaReceiver

    m = FskModem("1200", precision="float32")
    base = _bench_payload(m.cfg, audio_seconds)
    payloads = [
        bytes((c + i) % 94 + 33 for c in base) for i in range(batch)
    ]
    waves = [m.modulate(p) for p in payloads]
    L = max(len(w) for w in waves)
    x = np.zeros((batch, L), np.float32)
    for i, w in enumerate(waves):
        x[i, : len(w)] = w
    totals = [len(w) for w in waves]
    audio_sec = sum(totals) / m.cfg.sample_rate

    import os

    os.environ["MINIMODEM_TPU_MEGAKERNEL"] = "0"   # force the XLA path
    xla_rx = DeviceReceiver(m.cfg, "float32")
    del os.environ["MINIMODEM_TPU_MEGAKERNEL"]
    t0 = time.perf_counter()
    ref, _ = xla_rx.run_events_batch(x, totals, 1.5, 2.3)
    print(f"xla compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    ref, _ = xla_rx.run_events_batch(x, totals, 1.5, 2.3)
    dt_x = time.perf_counter() - t0
    print(f"xla warm: {dt_x*1e3:.1f} ms -> {audio_sec/dt_x:.0f}x", flush=True)

    mr = MegaReceiver(m.cfg, "float32")
    t0 = time.perf_counter()
    mega, _ = mr.run_events_batch(x, totals, 1.5, 2.3)
    print(f"mega compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    mega, _ = mr.run_events_batch(x, totals, 1.5, 2.3)
    dt_m = time.perf_counter() - t0
    print(f"mega warm: {dt_m*1e3:.1f} ms -> {audio_sec/dt_m:.0f}x", flush=True)

    ok = True
    for i in range(batch):
        for a, b in zip(ref[i], mega[i]):
            if not np.array_equal(a, b):
                ok = False
    print(f"parity (exact): {'OK' if ok else 'MISMATCH'}")

    # decision-level parity: rendered bytes + stats lines.  The XLA
    # receiver rides the v2 8-row fused scorer (VPU pass 1) while mega
    # rides the planes scorer (MXU pass 1) — conf/ampl floats can
    # drift in the last bits between those lowerings, so exact event
    # equality can fail while every DECISION (bytes, frame boundaries,
    # stats strings, which round to %.2f/%.3f) is identical.
    import io

    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.rx.engine import Receiver

    def render(ev):
        sink = io.BytesIO()
        stats = []
        rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                      sink.write, stats.append)
        rx.render_events(*ev)
        return sink.getvalue(), stats

    dok = True
    for i in range(batch):
        ra, sa = render(ref[i])
        rb, sb = render(mega[i])
        if ra != rb or sa != sb:
            dok = False
            print(f"  stream {i}: bytes {'==' if ra == rb else '!='} "
                  f"stats {'==' if sa == sb else '!='}")
    ok = dok
    print(f"parity (decisions): {'OK' if dok else 'MISMATCH'}")
    n_frames = sum(len(e[2]) for e in mega)
    print(f"frames={n_frames}  mega us/frame={dt_m*1e6/max(n_frames,1):.2f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
