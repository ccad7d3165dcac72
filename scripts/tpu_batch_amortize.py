"""Round-5: amortize the ~28 ms fixed per-execute cost over bigger
programs — batch width and bucket-filling audio length — after the
stage-split probe showed transfers already overlap (B~=C~=headline) and
lax.scan chaining slows the program itself (tpu_stage_split.py,
tpu_chain_headline.py).

Run on the real TPU:  python scripts/tpu_batch_amortize.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from minimodem_tpu.bench import batched_loopback_throughput  # noqa: E402


def row(audio, batch, pipeline=8):
    r = batched_loopback_throughput(
        "1200", audio_seconds=audio, batch=batch, pipeline=pipeline)
    print(json.dumps({
        "audio": audio, "batch": batch, "pipeline": pipeline,
        "rtf": round(r["real_time_factor"], 1),
        "wall_s": round(r["wall_seconds"], 4),
        "audio_s": round(r["audio_seconds"], 1),
        "decode_exact": r["decode_exact"],
    }), flush=True)


for audio, batch in [(60.0, 64), (64.3, 64), (60.0, 128), (64.3, 128)]:
    try:
        row(audio, batch)
    except Exception as e:
        print(json.dumps({"audio": audio, "batch": batch,
                          "error": repr(e)[:200]}), flush=True)
