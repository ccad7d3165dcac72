"""Round-5: tunnel device_put throughput vs buffer size/alignment.

The dpack e2e residual attribution: raw segments upload ~65 MB/s
effective while dpack rows (426016 int16 = 832 KB) move ~38 MB/s.
Interleaved put timing across sizes separates link weather from a
per-put size/alignment effect.

Run on the real TPU:  python scripts/tpu_put_sizes.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

SIZES = {
    "raw_seg  524800": 524800,     # raw segment (+halo, even)
    "dpack row 426016": 426016,    # measured dpack row16
    "pow2      524288": 524288,
    "dpack pad 458752": 458752,    # row padded to 64K int16 multiple
    "small     131072": 131072,
}

bufs = {k: np.ones(n, np.int16) for k, n in SIZES.items()}
# warm
for v in bufs.values():
    np.asarray(jax.device_put(v)[:1])

best = {k: float("inf") for k in SIZES}
for r in range(4):
    for kf, v in bufs.items():
        t0 = time.perf_counter()
        d = jax.device_put(v)
        np.asarray(d[:1])           # force completion (block is a no-op)
        dt = time.perf_counter() - t0
        best[kf] = min(best[kf], dt)

for kf, n in SIZES.items():
    mb = 2 * n / 1e6
    print(json.dumps({"buf": kf, "mb": round(mb, 2),
                      "best_ms": round(best[kf] * 1e3, 1),
                      "mbps": round(mb / best[kf], 1)}), flush=True)
