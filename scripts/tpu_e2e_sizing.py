"""Round-5: e2e PCM16 sizing — amortize the fixed per-call link cost
(~30 ms round trip) over stream length.  At 120 s the fixed cost is
~17% of the ~180 ms wall; longer files push the row toward the pure
link floor (~96 KB/audio-s over the measured ~60 MB/s tunnel ~= 760x).

Run on the real TPU:  python scripts/tpu_e2e_sizing.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from minimodem_tpu.bench import decode_throughput  # noqa: E402

for audio in (128.6, 240.0, 480.0):
    try:
        r = decode_throughput("1200", audio_seconds=audio, repeats=3)
        print(json.dumps({
            "audio": round(r["audio_seconds"], 1),
            "rtf": round(r["real_time_factor"], 1),
            "wall_s": round(r["wall_seconds"], 4),
            "decode_exact": r["decode_exact"],
        }), flush=True)
    except Exception as e:
        print(json.dumps({"audio": audio,
                          "error": repr(e)[:200]}), flush=True)
