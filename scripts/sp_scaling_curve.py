"""Round-5 measurement: sp (time-axis) sharding scaling curve.

VERDICT r4 item 6: the sp>1 design all_gathers the packed score
channels and replicates the sequential state machine on every sp rank
(parallel/service.py) — scoring scales, the state machine does not.
This script records the honest curve: full-decode wall for the SAME
total work at sp = 1/2/4/8 (dp=1) on the virtual 8-device CPU mesh
(the only multi-device mesh this harness has; real-ICI numbers scale
the gather term down, not up, since ICI >> shared-L3 bandwidth).

Run:
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/sp_scaling_curve.py [audio_seconds] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402

AUDIO = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def main() -> int:
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.parallel.service import ShardedReceiver
    from minimodem_tpu.parallel.sharding import make_mesh

    m = FskModem("1200")
    rate = float(m.cfg.data_rate)
    n = max(16, int(AUDIO * rate / m.cfg.frame_n_bits))
    payloads = [bytes((33 + (i + 3 * s) % 94) for i in range(n))
                for s in range(BATCH)]
    waves = [m.modulate(p) for p in payloads]
    L = max(len(w) for w in waves)
    x = np.zeros((BATCH, L), np.float32)
    for i, w in enumerate(waves):
        x[i, :len(w)] = w
    totals = [len(w) for w in waves]
    audio_sec = sum(totals) / 48000.0

    rows = []
    for sp in (1, 2, 4, 8):
        mesh = make_mesh(sp, dp=1, sp=sp)
        svc = ShardedReceiver(m.cfg, mesh)
        events, _ = svc.run_events_batch(x, totals, 1.5, 2.3)  # compile
        outs, _ = svc.decode_batch([w for w in waves])
        ok = all(o == p for o, p in zip(outs, payloads))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            svc.run_events_batch(x, totals, 1.5, 2.3)
            dt = min(dt, time.perf_counter() - t0)
        rows.append({"sp": sp, "batch": BATCH,
                     "wall_ms": round(dt * 1000.0, 1),
                     "rtf": round(audio_sec / dt, 1),
                     "decode_exact": bool(ok)})
        print(json.dumps(rows[-1]), flush=True)
    base = rows[0]["wall_ms"]
    for r in rows:
        r["speedup_vs_sp1"] = round(base / r["wall_ms"], 2)
    print(json.dumps({"curve": rows, "audio_seconds": audio_sec}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
