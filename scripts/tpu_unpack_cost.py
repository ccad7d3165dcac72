"""Round-5: attribute the dpack e2e residual — time the device-side
unpack_expand (k inclusive scans + shift decode + exception scatter)
chained on the real chip, per 512K-sample segment.

Context (tpu_wirepack_ab.py, interleaved best-of-3, 120 s PCM16):
raw 678.7x vs dpack 494.5x with the NATIVE packer (pack runs 413 MB/s
host-side, ~7x the tunnel, so host prep no longer paces).  The wire
saves ~19% of ~11.5 MB at ~60 MB/s ~= 36 ms; this probe measures what
the unpack costs the device per call.

Run on the real TPU:  python scripts/tpu_unpack_cost.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.bench import _bench_payload  # noqa: E402
from minimodem_tpu.ops import wirepack as wp  # noqa: E402

SEG = 1 << 19

m = FskModem("1200", sample_rate=48000)
payload = _bench_payload(m.cfg, 120.0)
x = np.clip(m.modulate(payload) * 32768.0, -32768,
            32767).astype(np.int16)
dp = wp.choose_params(x)
k, w = dp
e_cap = wp.exc_capacity(wp.count_exceptions(x[:SEG], k, w))
print(json.dumps({"k": k, "w": w, "e_cap": e_cap,
                  "row_bytes": wp.row_bytes(SEG, k, w, e_cap),
                  "raw_bytes": 2 * SEG}), flush=True)

wire = wp.pack(x[:SEG], SEG, k, w, e_cap).view(np.int16)[None, :]
totals = np.asarray([SEG], np.int32)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 64


@jax.jit
def chained(wirev, tot):
    def body(i, acc):
        # fake data dependency so the K unpacks cannot fuse/CSE away
        wv = wirev + (acc[0, 0] * 0).astype(jnp.int16)
        out = wp.unpack_expand(wv, tot, k, w, SEG, e_cap, SEG)
        return acc + out[:, :128]

    return jax.lax.fori_loop(0, K, body, jnp.zeros((1, 128), jnp.float32))


dev = jax.device_put(wire)
tot = jax.device_put(totals)
out = chained(dev, tot)
np.asarray(out[0, :1])                      # warm + sync
t0 = time.perf_counter()
out = chained(dev, tot)
np.asarray(out[0, :1])
dt = time.perf_counter() - t0
print(json.dumps({"chained_runs": K,
                  "ms_per_unpack": round(dt * 1e3 / K, 3),
                  "note": "per 512K-sample segment"}), flush=True)
