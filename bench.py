"""Headline benchmark: real-time factor of 48 kHz Bell-202 decode per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
North star (BASELINE.json): >1000x real-time per TPU v5e chip.

Two measurements:
- value / "device" = the on-device pipeline (audio originates on device;
  only ~28-byte frame events cross the host link) — the decode engine's
  real throughput.
- "e2e" = host WAV samples in, decoded bytes out, including the
  host<->device link (which in this harness is a ~10-40 MB/s tunnel).
"""

import json
import sys


def main() -> int:
    from minimodem_tpu.bench import (
        batched_loopback_throughput,
        decode_throughput,
        fleet_ingest_throughput,
        fleet_loopback_throughput,
        loopback_throughput,
    )

    # Headline defaults (round 5, measured sweep scripts/tpu_batch_amortize.py):
    # the ~25-28 ms fixed per-execute cost amortizes over PROGRAM SIZE, not
    # chaining (lax.scan-chained programs measured slower — see ROADMAP), so
    # the headline runs the widest batch that compiles (128; 192 fails) and
    # fills the 12 x 256K-sample score bucket (64.3 s: 77160 bits pad to
    # 77824, the largest _sched_pad bucket whose synth fits the bucket).
    # Measured: (60, 64) 28.4k -> (64.3, 128) 36.0k, decode_exact.
    audio_seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 64.3
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    # synchronous single call (compile + correctness + the one-call number)
    blb = batched_loopback_throughput("1200", audio_seconds=audio_seconds,
                                      batch=batch)
    # steady-state serving loop: 8 batches pipelined depth-2 with async
    # result prefetch, so the link transfer and host collection ride on
    # device compute — the headline (every one of the 8*batch streams
    # is decode-verified)
    blb2 = batched_loopback_throughput("1200", audio_seconds=audio_seconds,
                                       batch=batch, pipeline=8)
    best = max(blb["real_time_factor"], blb2["real_time_factor"])

    # link-bound rows: best-of-3 (tunnel speed swings 7-60 MB/s run to
    # run; one slow sample is link weather, not a decode regression).
    # e2e PCM16 pipelines upload against decode (PipelinedReceiver
    # segments); the u-law row measures the 1-byte/sample telephony
    # ingest with on-device G.711 expansion.  e2e rows use a 2x-length
    # file: the per-program fixed cost (~30 ms tunnel round trip)
    # amortizes over stream length, and the artifact records the
    # audio_seconds measured
    lb = loopback_throughput("1200", audio_seconds=audio_seconds, repeats=3)
    # fleet path: the sharded service's per-chip program (dp = devices)
    fleet = fleet_loopback_throughput("1200", audio_seconds=audio_seconds,
                                      batch=batch)
    # fleet INGEST: u8 telephony wire in through ShardedReceiver's
    # per-chip megakernel (link-bound on this harness — 1 byte/sample
    # uploads ride the tunnel; a deployment NIC makes it device-bound)
    fleet_in = fleet_ingest_throughput("1200", audio_seconds=30.0,
                                       batch=8, repeats=3)
    e2e = decode_throughput("1200", audio_seconds=2 * audio_seconds,
                            repeats=3)
    e2e_u = decode_throughput("1200", audio_seconds=2 * audio_seconds,
                              repeats=3, encoding="ulaw")

    # per-mode matrix: fractional-stop-bit geometries (rtty/tdd ride the
    # frame-schedule device TX), the sync-preamble mode (same), and a
    # caller-id burst row — each decode-exact on its own codec
    from minimodem_tpu.bench import callerid_throughput, mode_loopback_throughput

    modes = {}
    for mode_name in ("rtty", "same"):
        r = mode_loopback_throughput(mode_name, audio_seconds=15.0, batch=8)
        modes[mode_name] = {
            "real_time_factor": round(r["real_time_factor"], 2),
            "decode_exact": r["decode_exact"],
            "audio_seconds": round(r["audio_seconds"], 2),
        }
    r = callerid_throughput(batch=128, pipeline=4)
    modes["callerid"] = {
        "real_time_factor": round(r["real_time_factor"], 2),
        "decode_exact": r["decode_exact"],
        "audio_seconds": round(r["audio_seconds"], 2),
        "batch": r["batch"],
        "batch_latency_ms": round(r["batch_latency_ms"], 1),
        "single_burst_latency_ms": round(r["single_burst_latency_ms"], 1),
    }

    ok = all(r["decode_exact"]
             for r in (blb, blb2, lb, e2e, e2e_u, fleet, fleet_in)) \
        and all(m["decode_exact"] for m in modes.values())
    out = {
        "metric": "bell202_48k_decode_realtime_factor",
        "value": round(best, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(best / 1000.0, 4),
        "decode_exact": ok,
        "batch": batch,
        "single_stream_realtime_factor": round(lb["real_time_factor"], 2),
        "e2e_realtime_factor": round(e2e["real_time_factor"], 2),
        "e2e_ulaw_realtime_factor": round(e2e_u["real_time_factor"], 2),
        "e2e_audio_seconds": round(e2e["audio_seconds"], 2),
        "audio_seconds_total": round(blb["audio_seconds"], 2),
        "single_call_batched_realtime_factor": round(
            blb["real_time_factor"], 2),
        "pipelined_batches": blb2["pipeline"],
        "pipelined_realtime_factor": round(blb2["real_time_factor"], 2),
        "fleet_realtime_factor": round(fleet["real_time_factor"], 2),
        "fleet_devices": fleet["devices"],
        "fleet_ingest_realtime_factor": round(
            fleet_in["real_time_factor"], 2),
        "fleet_ingest_mega": fleet_in["mega"],
        "modes": modes,
    }
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
