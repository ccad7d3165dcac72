"""Round-5: e2e PCM16 probe — PipelinedReceiver with h2d put-ahead
depth 2 (uploads for segments i+1 and i+2 ride on segment i's decode),
chasing the >=650x VERDICT bar (r4 recorded 594.64x best-of-3).

Run on the real TPU:  python scripts/tpu_e2e_probe.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from minimodem_tpu.bench import decode_throughput  # noqa: E402


for audio, enc in [(120.0, None), (120.0, "ulaw")]:
    try:
        r = decode_throughput("1200", audio_seconds=audio, repeats=3,
                              encoding=enc)
        print(json.dumps({
            "audio": audio, "encoding": enc,
            "rtf": round(r["real_time_factor"], 1),
            "wall_s": round(r["wall_seconds"], 4),
            "decode_exact": r["decode_exact"],
        }), flush=True)
    except Exception as e:
        print(json.dumps({"audio": audio, "encoding": enc,
                          "error": repr(e)[:300]}), flush=True)
