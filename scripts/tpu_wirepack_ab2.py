"""Round-5: wirepack A/B variant with choose_params hoisted (static
spec, the serving deployment shape) — is the dpack residual the
per-call chooser, or the pipeline itself?

Run on the real TPU:  python scripts/tpu_wirepack_ab2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.bench import _bench_payload  # noqa: E402
from minimodem_tpu.ops import wirepack as wp  # noqa: E402

m = FskModem("1200", sample_rate=48000)
payload = _bench_payload(m.cfg, 120.0)
samples = np.clip(m.modulate(payload) * 32768.0, -32768,
                  32767).astype(np.int16)
audio_sec = len(samples) / 48000

dp = wp.choose_params(samples)
print(json.dumps({"dp": dp}), flush=True)
wp.choose_params = lambda x, **kw: dp          # hoist: static spec

os.environ["MINIMODEM_TPU_WIREPACK"] = "0"
assert m.demodulate(samples) == payload
os.environ["MINIMODEM_TPU_WIREPACK"] = "1"
assert m.demodulate(samples) == payload

best = {"raw": float("inf"), "dpack-static": float("inf")}
for r in range(3):
    for label, env in (("raw", "0"), ("dpack-static", "1")):
        os.environ["MINIMODEM_TPU_WIREPACK"] = env
        t0 = time.perf_counter()
        out = m.demodulate(samples)
        dt = time.perf_counter() - t0
        best[label] = min(best[label], dt)
        print(json.dumps({"round": r, "label": label,
                          "wall_s": round(dt, 4),
                          "rtf": round(audio_sec / dt, 1),
                          "decode_exact": out == payload}), flush=True)

print(json.dumps({"summary": {k: round(audio_sec / v, 1)
                              for k, v in best.items()}}), flush=True)
