"""Round-5: chained device-program A/B at the real e2e segment shapes
(2M samples) — raw int16 token vs dpack token through the SAME mega
program builder PipelinedReceiver.run uses.  Isolates whether the
dpack executable itself (unpack prologue included) is the residual.

Run on the real TPU:  python scripts/tpu_wirepack_prog.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from minimodem_tpu.models.modem import FskModem  # noqa: E402
from minimodem_tpu.bench import _bench_payload  # noqa: E402
from minimodem_tpu.ops import device_rx as drx  # noqa: E402
from minimodem_tpu.ops import wirepack as wp  # noqa: E402
from minimodem_tpu.ops.pallas_rx import MegaReceiver, _mega_run_fn  # noqa: E402
from minimodem_tpu.utils.cfloat import trunc_i  # noqa: E402

m = FskModem("1200", sample_rate=48000)
payload = _bench_payload(m.cfg, 120.0)
samples = np.clip(m.modulate(payload) * 32768.0, -32768,
                  32767).astype(np.int16)

pr = drx.PipelinedReceiver(m.cfg)
cfg = m.cfg
geo = pr.geo
total_nf = pr.segment_len - pr._lookahead + cfg.expect_nsamples
t_total = drx._round_up_pow2(total_nf + cfg.nsamples_overscan + 1)
u8x = max(0, pr.segment_len - total_nf)
thr2 = np.asarray([1.5, 2.3], np.float32)
totals = np.asarray([total_nf], np.int32)
seg = samples[:pr.segment_len]

dp = wp.choose_params(samples)
k, w = dp
e_cap = wp.exc_capacity(wp.count_exceptions(seg, k, w))
tok = wp.spec_str(k, w, pr.segment_len, e_cap)

import jax  # noqa: E402

carry0 = MegaReceiver.carry_to_arrays(None, 1)
K = 16


def build_chained(token, extra, wire_of_tscore):
    """K back-to-back executes with a carry data dependency; the
    per-execute fixed dispatch cost (~25-30 ms on this tunnel) is the
    same for both variants, so the raw-vs-dpack DELTA per segment is
    the program+transfer difference."""
    f, _, t_score = _mega_run_fn(pr.key, t_total, 1, False, token, False,
                                 u8_extra=extra)
    wire = wire_of_tscore(t_score)

    def run_k(dev, tot, ci, cf):
        out = None
        for _ in range(K):
            out = f(dev, tot, thr2, ci, cf)
            ci, cf = out[2], out[3]
        return out

    dev = jax.device_put(wire)
    tot = jax.device_put(totals)
    ci = jax.device_put(carry0[0])
    cf = jax.device_put(carry0[1])
    out = run_k(dev, tot, ci, cf)
    np.asarray(out[2][:1, :1])          # warm + real sync (ci carry)
    t0 = time.perf_counter()
    out = run_k(dev, tot, ci, cf)
    np.asarray(out[2][:1, :1])
    return (time.perf_counter() - t0) * 1e3 / K


def raw_wire(t_score):
    x = np.zeros((1, t_score + geo.halo), np.int16)
    nraw = min(len(seg), x.shape[1])
    x[0, :nraw] = seg[:nraw]
    return x


ms_raw = build_chained("int16", 0, raw_wire)
print(json.dumps({"label": "raw program", "ms_per_seg": round(ms_raw, 2)}),
      flush=True)

ms_dp = build_chained(
    tok, u8x,
    lambda t: wp.pack(seg, pr.segment_len, k, w,
                      e_cap).view(np.int16)[None, :])
print(json.dumps({"label": "dpack program", "tok": tok,
                  "ms_per_seg": round(ms_dp, 2)}), flush=True)
