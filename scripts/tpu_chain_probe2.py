"""Round-5 probe: why did chaining regress the headline?

Isolates the pieces: (a) pipeline=16 chain=1 control, (b) longer audio
per program (same fixed cost over 2-4x work), (c) device-only timing of
the chained program vs back-to-back batch programs on device-resident
inputs (the fixed-cost measurement the ROADMAP cites).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.bench import batched_loopback_throughput  # noqa: E402


def row(tag, **kw):
    r = batched_loopback_throughput("1200", **kw)
    print(json.dumps({"tag": tag, "rtf": round(r["real_time_factor"], 1),
                      "wall_s": round(r["wall_seconds"], 4),
                      "audio_s": round(r["audio_seconds"], 1),
                      "decode_exact": r["decode_exact"]}), flush=True)


row("pl16-ch1-60s-b64", audio_seconds=60, batch=64, pipeline=16, chain=1)
try:
    row("pl8-ch1-120s-b64", audio_seconds=120, batch=64, pipeline=8,
        chain=1)
except Exception as e:
    print(json.dumps({"tag": "pl8-ch1-120s-b64", "error": str(e)[:200]}),
          flush=True)
try:
    row("pl8-ch1-240s-b32", audio_seconds=240, batch=32, pipeline=8,
        chain=1)
except Exception as e:
    print(json.dumps({"tag": "pl8-ch1-240s-b32", "error": str(e)[:200]}),
          flush=True)

# --- device-side isolation: chained program vs back-to-back batches on
# device-resident inputs (no h2d in the timed region) ------------------
from minimodem_tpu.codecs import Ascii8Codec  # noqa: E402
from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.ops.device_rx import DeviceLoopback, _sched_pad, \
    zero_carry  # noqa: E402
from minimodem_tpu.ops.tx_device import tx_bit_schedule  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

AUDIO, BATCH, K = 60.0, 64, 4
m = FskModem("1200")
from minimodem_tpu.bench import _bench_payload  # noqa: E402

base = _bench_payload(m.cfg, AUDIO)
sets = []
for j in range(K):
    payloads = [bytes((b + i + 7 * j) % 94 + 33 for b in base)
                for i in range(BATCH)]
    sets.append([tx_bit_schedule(p, m.cfg, Ascii8Codec())
                 for p in payloads])

lb = DeviceLoopback(m.cfg, "auto")
b_real = [[len(s) for s in scheds] for scheds in sets]
b_pad = _sched_pad(max(max(r) for r in b_real))
bits = np.zeros((K, BATCH, b_pad), np.uint8)
for k, scheds in enumerate(sets):
    for i, s in enumerate(scheds):
        bits[k, i, :len(s)] = s
bits_pk = np.packbits(bits, axis=2, bitorder="little")
totals = np.asarray([[n * lb.bit_ns for n in r] for r in b_real],
                    np.int32)

fn1, compact, _ = lb._fn_for(b_pad, BATCH)
fnK, _, _ = lb._fn_for(b_pad, BATCH, chain=K)

dev_bits = jax.device_put(jnp.asarray(bits_pk))
dev_tot = jax.device_put(jnp.asarray(totals))
carry = zero_carry(BATCH)
thr, lim = np.float32(1.5), np.float32(2.3)


def sync(out):
    # CLAUDE.md: block_until_ready doesn't sync on axon; force a small
    # dependent d2h
    leaf = out[0] if isinstance(out, tuple) else out
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


# warm both programs
sync(fn1(dev_bits[0], dev_tot[0], thr, lim, carry))
sync(fnK(dev_bits, dev_tot, thr, lim, carry))

for name, reps in (("batch-x%d" % K, None), ("chain-%d" % K, None)):
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        if name.startswith("batch"):
            outs = [fn1(dev_bits[k], dev_tot[k], thr, lim, carry)
                    for k in range(K)]
            sync(outs[-1])
        else:
            sync(fnK(dev_bits, dev_tot, thr, lim, carry))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"tag": name, "best_wall_ms": round(best * 1e3, 1),
                      "per_batch_ms": round(best * 1e3 / K, 1)}),
          flush=True)
