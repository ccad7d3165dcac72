"""Round-5 experiment: chained pipelined headline configurations.

Measures batched_loopback_throughput across (pipeline, chain) grids to
close the 28.5k-vs-42.3k device-bound gap (VERDICT r4 item 1): the
~25 ms fixed per-execute cost is paid once per chain instead of once
per batch.  Run on the real TPU.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from minimodem_tpu.bench import batched_loopback_throughput  # noqa: E402

AUDIO = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def row(pipeline, chain):
    r = batched_loopback_throughput(
        "1200", audio_seconds=AUDIO, batch=BATCH,
        pipeline=pipeline, chain=chain)
    print(json.dumps({
        "pipeline": pipeline, "chain": chain,
        "rtf": round(r["real_time_factor"], 1),
        "wall_s": round(r["wall_seconds"], 4),
        "audio_s": round(r["audio_seconds"], 1),
        "decode_exact": r["decode_exact"],
    }), flush=True)
    return r


for pl, ch in [(8, 1), (8, 2), (8, 4), (16, 4), (16, 8)]:
    row(pl, ch)
