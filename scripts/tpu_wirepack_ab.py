"""Round-5: interleaved raw-vs-dpack e2e A/B on the real chip.

The tunnel swings 7-60 MB/s run to run, so a sequential A/B confounds
link weather with the wire format.  This probe interleaves the two
variants round-by-round and reports per-round and best-of walls.

Run on the real TPU:  python scripts/tpu_wirepack_ab.py [audio_s] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.bench import _bench_payload  # noqa: E402

audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

m = FskModem("1200", sample_rate=48000)
payload = _bench_payload(m.cfg, audio_seconds)
samples = np.clip(m.modulate(payload) * 32768.0, -32768, 32767).astype(np.int16)
audio_sec = len(samples) / 48000

# warm both compiled variants
os.environ["MINIMODEM_TPU_WIREPACK"] = "0"
assert m.demodulate(samples) == payload, "raw decode mismatch"
os.environ["MINIMODEM_TPU_WIREPACK"] = "1"
assert m.demodulate(samples) == payload, "dpack decode mismatch"

best = {"raw": float("inf"), "dpack": float("inf")}
for r in range(rounds):
    for label, env in (("raw", "0"), ("dpack", "1")):
        os.environ["MINIMODEM_TPU_WIREPACK"] = env
        t0 = time.perf_counter()
        out = m.demodulate(samples)
        dt = time.perf_counter() - t0
        ok = out == payload
        best[label] = min(best[label], dt)
        print(json.dumps({"round": r, "label": label,
                          "wall_s": round(dt, 4),
                          "rtf": round(audio_sec / dt, 1),
                          "decode_exact": bool(ok)}), flush=True)

print(json.dumps({"summary": {k: {"best_wall_s": round(v, 4),
                                  "best_rtf": round(audio_sec / v, 1)}
                              for k, v in best.items()}}), flush=True)
