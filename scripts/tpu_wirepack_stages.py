"""Round-5: per-stage attribution of the dpack e2e residual.

Monkeypatch-times jax.device_put (upload worker), the dispatch fns,
and _collect_results (d2h sync) inside PipelinedReceiver.run for the
raw vs dpack variants.

Run on the real TPU:  python scripts/tpu_wirepack_stages.py
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.bench import _bench_payload  # noqa: E402
from minimodem_tpu.ops import device_rx  # noqa: E402

m = FskModem("1200", sample_rate=48000)
payload = _bench_payload(m.cfg, 120.0)
samples = np.clip(m.modulate(payload) * 32768.0, -32768,
                  32767).astype(np.int16)
audio_sec = len(samples) / 48000

import jax  # noqa: E402

stats = {"put_ms": 0.0, "put_mb": 0.0, "collect_ms": 0.0, "n_put": 0}
_real_put = jax.device_put
_real_collect = device_rx._collect_results


def timed_put(x, *a, **kw):
    t0 = time.perf_counter()
    out = _real_put(x, *a, **kw)
    stats["put_ms"] += (time.perf_counter() - t0) * 1e3
    try:
        stats["put_mb"] += x.nbytes / 1e6
        stats["n_put"] += 1
    except Exception:
        pass
    return out


def timed_collect(*a, **kw):
    t0 = time.perf_counter()
    out = _real_collect(*a, **kw)
    stats["collect_ms"] += (time.perf_counter() - t0) * 1e3
    return out


jax.device_put = timed_put
device_rx.jax = jax
device_rx._collect_results = timed_collect

# warm both
os.environ["MINIMODEM_TPU_WIREPACK"] = "0"
assert m.demodulate(samples) == payload
os.environ["MINIMODEM_TPU_WIREPACK"] = "1"
assert m.demodulate(samples) == payload

for r in range(2):
    for label, env in (("raw", "0"), ("dpack", "1")):
        os.environ["MINIMODEM_TPU_WIREPACK"] = env
        for k in stats:
            stats[k] = 0
        t0 = time.perf_counter()
        out = m.demodulate(samples)
        dt = (time.perf_counter() - t0) * 1e3
        print(json.dumps({
            "round": r, "label": label, "wall_ms": round(dt, 1),
            "put_ms": round(stats["put_ms"], 1),
            "put_mb": round(stats["put_mb"], 2),
            "n_put": stats["n_put"],
            "collect_ms": round(stats["collect_ms"], 1),
            "other_ms": round(dt - stats["collect_ms"], 1),
            "decode_exact": out == payload,
        }), flush=True)
