"""Batched FSK demodulation scoring.

TPU-first re-design of the reference demodulator's hot path.  The reference
runs, per candidate frame offset, per bit, one zero-padded FFTW r2c transform
and reads two bins (reference: src/fsk.c:117-174 fsk_bit_analyze, 178-446
fsk_frame_analyze, 449-538 fsk_find_frame) — a scalar triple loop.

Here the same math is restructured into two batched passes over a whole
audio chunk:

  pass 1 (per-sample):  correlate the audio against 4 basis vectors
      (mark/space x cos/sin, the two DFT bins actually read) — a sliding
      dot-product computed as a 4-filter convolution (direct for short
      filters, FFT overlap for long ones).  Yields mark/space magnitudes,
      the bit decision, and signal/noise magnitudes at EVERY sample offset.

  pass 2 (per-offset):  frame confidence (CONFIDENCE_ALGO 6 = frame SNR x
      (1 - divergence), reference: src/fsk.c:265-341) for every candidate
      frame-start offset, via static shifted slices of the pass-1 arrays —
      pure vector ops, no gathers.

The host carrier state machine (rx/engine.py) then *replays* the reference's
sequential decisions (center-out scan, early exit, squelch, tracking) over
these precomputed arrays; the decisions are identical because every scalar
the reference would have computed is present.

Precision: float32 end-to-end like the reference.  For "perfect-capable"
configurations (integer tone cycles per bit window, where the reference's
tests demand confidence=inf, reference: tests/10-verify-perfect.test) the
correlation runs in float64 and rounds to float32, which keeps the numeric
noise below FLT_EPSILON more robustly than the reference's own f32 FFT.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModemConfig
from ..utils.cfloat import F32_EPSILON, f32_div

# direct convolution above this filter length would waste FLOPs; use FFT
_DIRECT_CONV_MAX_NB = 4096


def _pallas_eligible(geo) -> bool:
    """Use the Pallas MXU kernel for float32 geometries on TPU backends.

    Default ON where supported: the banded-matmul kernel correlates
    ~2.6x faster than the FMA scan on a v5e (1.57 vs 0.62 Goffsets/s at
    4M offsets, nb=40) and batches under jax.vmap via a custom_vmap rule
    that folds the batch into the kernel grid.  MINIMODEM_TPU_PALLAS=0
    forces the XLA scan/FFT paths (debug escape hatch)."""
    import os

    if os.environ.get("MINIMODEM_TPU_PALLAS", "1") == "0":
        return False
    if geo.use_f64:
        return False
    from .pallas_demod import backend_supports_pallas, supported

    return supported(geo.nb) and backend_supports_pallas()
# float64 scoring only pays off when confidence=inf is reachable and the
# filter is short
_F64_MAX_NB = 4096


def _is_perfect_capable(cfg: ModemConfig) -> bool:
    """True when both tones complete integer cycles inside one bit window
    and land exactly on their DFT bins — the precondition for the
    reference's confidence=inf ("rate perfect") decodes."""
    nb = cfg.bit_nsamples_rx
    n = cfg.fftsize
    rate = float(cfg.sample_rate)

    def near_int(x):
        return abs(x - round(x)) < 1e-9

    return all(
        near_int(v)
        for v in (
            nb * float(cfg.mark_f) / rate,
            nb * float(cfg.space_f) / rate,
            nb * cfg.b_mark / n,
            nb * cfg.b_space / n,
        )
    )


@dataclass(frozen=True)
class DemodGeometry:
    """Static scoring geometry extracted from a ModemConfig."""

    nb: int                       # bit window length (DFT input length)
    fftsize: int
    b_mark: int
    b_space: int
    magscalar: float              # 2.0f / bit_nsamples (f32)
    bit_begin: tuple              # per-bit window start offsets
    n_bits: int
    req_data: tuple               # per-bit: -1 dontcare, 0/1 required value
    req_sync: tuple
    use_f64: bool

    @property
    def max_begin(self) -> int:
        return self.bit_begin[-1]

    @property
    def halo(self) -> int:
        """Extra samples needed past the last scored offset."""
        return self.max_begin + self.nb


def geometry_from_config(cfg: ModemConfig, precision: str = "auto") -> DemodGeometry:
    def reqs(expect: str):
        return tuple(-1 if c == "d" else int(c) for c in expect)

    if precision == "float64":
        use_f64 = True
    elif precision == "float32":
        use_f64 = False
    else:
        use_f64 = _is_perfect_capable(cfg) and cfg.bit_nsamples_rx <= _F64_MAX_NB

    return DemodGeometry(
        nb=cfg.bit_nsamples_rx,
        fftsize=cfg.fftsize,
        b_mark=cfg.b_mark,
        b_space=cfg.b_space,
        magscalar=float(f32_div(2.0, cfg.bit_nsamples_rx)),
        bit_begin=tuple(cfg.bit_begin_samples),
        n_bits=cfg.expect_n_bits,
        req_data=reqs(cfg.expect_data_string),
        req_sync=reqs(cfg.expect_sync_string),
        use_f64=use_f64,
    )


def make_basis(geo: DemodGeometry, dtype=np.float64) -> np.ndarray:
    """[4, nb] correlation basis: rows = (cos_m, sin_m, cos_s, sin_s).

    Angles are computed from the *reduced* index (b*n mod fftsize), so that
    windows of periodic signals cancel bit-exactly (this is what lets
    integer-ratio signals reach confidence=inf)."""
    n = np.arange(geo.nb, dtype=np.int64)
    out = np.empty((4, geo.nb), dtype=np.float64)
    for row, band in ((0, geo.b_mark), (2, geo.b_space)):
        k = (band * n) % geo.fftsize
        ang = 2.0 * np.pi * (k.astype(np.float64) / geo.fftsize)
        out[row] = np.cos(ang)
        out[row + 1] = np.sin(ang)
    return out.astype(dtype)


# ======================================================================
# pass 1: sliding correlations
# ======================================================================

def _correlate_direct(x, basis, s_len: int):
    """Direct sliding correlation as a scan of shifted vector FMAs.

    corr[c, s] = sum_j basis[c, j] * x[s + j]  for s in [0, s_len).

    Expressed as nb accumulated vector multiply-adds (VPU work) rather than
    a conv: XLA compiles `conv(..., precision=HIGHEST)` pathologically
    slowly, while this scan compiles in seconds and is numerically exact
    float32/float64.  x: [s_len + nb], basis: [4, nb] -> [4, s_len]."""
    nb = basis.shape[1]

    def body(acc, j):
        win = jax.lax.dynamic_slice_in_dim(x, j, s_len)
        acc = acc + basis[:, j][:, None] * win[None, :]
        return acc, None

    acc0 = jnp.zeros((4, s_len), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(nb))
    return acc


def _correlate_fft(x, basis, s_len: int):
    """FFT cross-correlation for long filters.  float32 path only."""
    nb = basis.shape[1]
    L = int(x.shape[0])
    fft_len = 1 << (L - 1).bit_length()
    xf = jnp.fft.rfft(x, fft_len)
    bf = jnp.fft.rfft(basis, fft_len, axis=1)
    prod = xf[None, :] * jnp.conj(bf)
    corr = jnp.fft.irfft(prod, fft_len, axis=1)
    return corr[:, :s_len]


# ======================================================================
# pass 1 + 2 combined, jitted per (geometry, chunk length)
# ======================================================================

def correlate_any(x, geo: DemodGeometry, basis_np: np.ndarray,
                  s_len: int):
    """Stage 1: 4-basis sliding correlation by the best available route
    (Pallas MXU kernel / FFT overlap / direct conv)."""
    if _pallas_eligible(geo):
        from .pallas_demod import correlate_pallas
        return correlate_pallas(x, basis_np, s_len)
    basis = jnp.asarray(basis_np)
    if geo.nb > _DIRECT_CONV_MAX_NB:
        return _correlate_fft(x, basis, s_len)
    return _correlate_direct(x, basis, s_len)


def score_frame_channels(corr, geo: DemodGeometry, t_len: int, dtype):
    """Stages 1b+2: band magnitudes -> per-offset frame channels.

    THE one implementation of the parity-critical frame-analysis math
    (reference: src/fsk.c:107-174 bit analysis, :178-446 frame analysis
    / CONFIDENCE_ALGO 6), shared by the chunked host scorer and the
    device score packer.  (ops/pallas_score.py is the VMEM-resident
    re-derivation of the same formulas; tests pin it bit-identical.)
    Returns the dict of six [t_len] channels.
    """
    eps = np.float32(F32_EPSILON)
    # band magnitudes (reference: src/fsk.c:107-114,130-159)
    scal = jnp.asarray(geo.magscalar, dtype)
    mag_mark = (jnp.hypot(corr[0], corr[1]) * scal).astype(jnp.float32)
    mag_space = (jnp.hypot(corr[2], corr[3]) * scal).astype(jnp.float32)

    bit = mag_mark > mag_space                       # fsk.c:161 strict
    sig = jnp.where(bit, mag_mark, mag_space)
    noise = jnp.where(bit, mag_space, mag_mark)
    noise_gated = jnp.where(noise > eps, noise, jnp.float32(0.0))

    # ---- pass 2: shifted-slice frame analysis ----
    def sl(arr, b):
        off = int(geo.bit_begin[b])
        return jax.lax.dynamic_slice_in_dim(arr, off, t_len)

    bits_f = jnp.stack([sl(bit, b) for b in range(geo.n_bits)])
    sigs = jnp.stack([sl(sig, b) for b in range(geo.n_bits)])
    noises = jnp.stack([sl(noise_gated, b) for b in range(geo.n_bits)])

    bits_i = bits_f.astype(jnp.uint32)
    total_sig = jnp.sum(sigs, axis=0)
    total_noise = jnp.sum(noises, axis=0)
    n_mark = jnp.sum(bits_i, axis=0).astype(jnp.float32)
    n_space = jnp.float32(geo.n_bits) - n_mark
    mark_sig = jnp.sum(jnp.where(bits_f, sigs, 0.0), axis=0)
    space_sig = total_sig - mark_sig
    # averages guarded like C (division skipped when count==0,
    # reference: src/fsk.c:298-301); a zero average only feeds
    # divergence terms for bits of that polarity, which then can't occur
    avg_mark = jnp.where(n_mark > 0, mark_sig / n_mark, jnp.float32(0.0))
    avg_space = jnp.where(n_space > 0, space_sig / n_space,
                          jnp.float32(0.0))

    avg_own = jnp.where(bits_f, avg_mark[None, :], avg_space[None, :])
    divergence = jnp.sum(jnp.abs(sigs - avg_own) / avg_own, axis=0)
    divergence = divergence * jnp.float32(2.0) / jnp.float32(geo.n_bits)

    snr = total_sig / total_noise            # IEEE: x/0 = inf, 0/0 = nan
    conf = snr * (jnp.float32(1.0) - divergence)
    ampl = total_sig / jnp.float32(geo.n_bits)

    def mask_for(req):
        ok = jnp.ones((t_len,), bool)
        for b in range(geo.n_bits):
            r = int(req[b])
            if r >= 0:
                ok = ok & (bits_f[b] == bool(r))
        return ok

    ok_data = mask_for(geo.req_data)
    ok_sync = mask_for(geo.req_sync)
    zero = jnp.float32(0.0)
    # when the frame is rejected the reference leaves ampl at 0
    # (reference: src/fsk.c:211-212, minimodem.c:1253 init)
    out = {
        "conf_data": jnp.where(ok_data, conf, zero),
        "conf_sync": jnp.where(ok_sync, conf, zero),
        "ampl_data": jnp.where(ok_data, ampl, zero),
        "ampl_sync": jnp.where(ok_sync, ampl, zero),
    }

    # pack frame bits LSB-first (reference: src/fsk.c:439-441)
    weights_lo = jnp.asarray(
        [np.uint32(1 << b) if b < 32 else np.uint32(0)
         for b in range(geo.n_bits)], jnp.uint32)
    weights_hi = jnp.asarray(
        [np.uint32(1 << (b - 32)) if b >= 32 else np.uint32(0)
         for b in range(geo.n_bits)], jnp.uint32)
    out["bits_lo"] = jnp.sum(bits_i * weights_lo[:, None], axis=0,
                             dtype=jnp.uint32)
    out["bits_hi"] = jnp.sum(bits_i * weights_hi[:, None], axis=0,
                             dtype=jnp.uint32)
    return out


@functools.lru_cache(maxsize=64)
def _build_score_fn(geo: DemodGeometry, t_len: int, platform: Optional[str]):
    """Compile the scoring function for a fixed chunk length.

    Input:  samples [t_len + halo] float32
    Output: dict of [t_len] arrays:
        conf_data, conf_sync, ampl (f32), bits_lo, bits_hi (uint32),
        and per-sample sig/noise diagnostics are folded in already.
    """
    dtype = jnp.float64 if geo.use_f64 else jnp.float32
    # NB: keep all closure constants as NumPy values — capturing a jax.Array
    # in a jitted closure forces a device-constant path that lowers
    # pathologically slowly in this environment (~70s per constant).
    basis_np = make_basis(geo, np.float64 if geo.use_f64 else np.float32)
    s_len = t_len + geo.max_begin  # offsets where bit windows may start

    def score(samples):
        x = samples.astype(dtype)
        corr = correlate_any(x, geo, basis_np, s_len)
        return score_frame_channels(corr, geo, t_len, dtype)

    if platform is not None:
        # pin to a specific backend (e.g. "cpu" scoring beside a busy TPU)
        return jax.jit(score, device=jax.devices(platform)[0])
    return jax.jit(score)


class DemodScorer:
    """Chunked scoring driver: feed absolute-position sample data, query
    per-offset score arrays."""

    def __init__(self, cfg: ModemConfig, precision: str = "auto",
                 chunk_len: int = 1 << 17, platform: Optional[str] = None):
        self.geo = geometry_from_config(cfg, precision)
        # amortize huge halos (very low baud rates) with bigger chunks
        self.chunk_len = max(chunk_len, self.geo.halo // 2)
        self.platform = platform
        self._fn = _build_score_fn(self.geo, self.chunk_len, platform)

    def score(self, samples: np.ndarray) -> dict:
        """Score offsets [0, chunk_len) of ``samples``; the array is
        zero-padded/truncated to chunk_len + halo."""
        need = self.chunk_len + self.geo.halo
        x = np.zeros(need, dtype=np.float32)
        n = min(len(samples), need)
        x[:n] = samples[:n]
        out = self._fn(jnp.asarray(x))
        return {k: np.asarray(v) for k, v in out.items()}
