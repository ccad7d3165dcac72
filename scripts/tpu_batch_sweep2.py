"""Round-5: widen the headline batch past 128 (192 fails remote
compile; probe the 144/160 middle) at the bucket-filling 64.3 s.

Run on the real TPU:  python scripts/tpu_batch_sweep2.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from minimodem_tpu.bench import batched_loopback_throughput  # noqa: E402

for audio, batch, pipe in [(64.3, 144, 8), (64.3, 160, 8),
                           (64.3, 128, 16)]:
    try:
        r = batched_loopback_throughput(
            "1200", audio_seconds=audio, batch=batch, pipeline=pipe)
        print(json.dumps({
            "audio": audio, "batch": batch, "pipeline": pipe,
            "rtf": round(r["real_time_factor"], 1),
            "wall_s": round(r["wall_seconds"], 4),
            "decode_exact": r["decode_exact"],
        }), flush=True)
    except Exception as e:
        print(json.dumps({"audio": audio, "batch": batch, "pipeline": pipe,
                          "error": repr(e)[:200]}), flush=True)
