"""Fully device-resident receiver.

Runs the ENTIRE receive pipeline on TPU in one XLA program:

  stage 1: sliding 4-basis correlation -> per-sample mark/space magnitudes
  stage 2: per-offset frame confidence/bits (same math as ops/demod.py)
  stage 3: the sequential carrier state machine as a lax.while_loop over
           the score arrays, emitting a compact per-frame EVENT stream

Only the event stream (~28 bytes per decoded frame) returns to host, where
the byte-level codecs and stderr protocol lines are produced.  This removes
the device->host transfer of per-offset arrays — the bottleneck of the
chunked host engine (per-offset arrays are ~1.2 MB per audio-second, and
the host link in this environment moves ~10 MB/s).

Stage 3 replays, decision-for-decision, the same reference logic as
rx/engine.py (reference: src/minimodem.c:1137-1463 and src/fsk.c:449-538):
center-out frame search with strict-improvement and early exit, confidence
squelch, amplitude-drop squelch, carrier acquisition/loss bookkeeping, fine
rescan, and float32 stats accumulation in reference order.

Not covered here (host engine handles these modes): carrier autodetect
(-a), which retunes the correlation basis mid-stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModemConfig
from .demod import (
    DemodGeometry,
    correlate_any,
    geometry_from_config,
    make_basis,
    score_frame_channels,
)

FSK_ANALYZE_NSTEPS = 3          # reference: src/minimodem.c:1248
FSK_ANALYZE_NSTEPS_FINE = 8     # reference: src/minimodem.c:1365
FSK_MAX_NOCONFIDENCE_BITS = 20  # reference: src/minimodem.c:1290

# event types in the output stream
EV_FRAME = 0
EV_CARRIER = 1
EV_NOCARRIER = 2
# flag folded into the device event-type word (host expands to EV_CARRIER)
EV_FLAG_ACQUIRED = 1 << 8


def unpack_events(ev_8e: np.ndarray, n: int):
    """Unpack a device event log [8, E] uint32 (columns = records) into the
    host event-stream form (ev_type [M] i32, ev_pay [M, 6] u32), expanding
    ACQUIRED-flagged frames into a CARRIER event followed by the frame."""
    rec = np.ascontiguousarray(ev_8e[:, :n].T)          # [n, 8]
    types = (rec[:, 6] & 0xFF).astype(np.int32)
    acq = (rec[:, 6] & EV_FLAG_ACQUIRED) != 0
    m = n + int(acq.sum())
    out_t = np.empty(m, np.int32)
    out_p = np.zeros((m, 6), np.uint32)
    ins = np.cumsum(acq) - acq.astype(np.int64)          # exclusive prefix
    idx = np.arange(n) + ins + acq                        # record positions
    out_t[idx] = types
    out_p[idx] = rec[:, :6]
    car_idx = idx[acq] - 1
    out_t[car_idx] = EV_CARRIER
    out_p[car_idx] = 0
    return out_t, out_p


def _scan_order(try_first: int, try_max: int, try_step: int) -> list:
    """The center-out candidate order of fsk_find_frame
    (reference: src/fsk.c:477-502), as a static offset list."""
    out = []
    j = 0
    while True:
        up = 1 if (j % 2) else -1
        t = try_first + up * ((j + 1) // 2) * try_step
        j += 1
        if t >= try_max:
            break
        if t < 0:
            continue
        out.append(t)
        if j > 8192:
            break
    return out


def device_rx_key(cfg: ModemConfig, precision: str = "auto"):
    """Hashable snapshot of everything the compiled receiver depends on."""
    geo = geometry_from_config(cfg, precision)
    return (
        cfg.sample_rate,
        int(np.float32(cfg.data_rate).view(np.uint32)),
        cfg.n_data_bits,
        cfg.nstartbits,
        int(np.float32(cfg.nstopbits).view(np.uint32)),
        geo.b_mark, geo.b_space, geo.fftsize, geo.nb,
        int(np.float32(geo.magscalar).view(np.uint32)),
        geo.bit_begin, geo.n_bits, geo.req_data, geo.req_sync, geo.use_f64,
        cfg.frame_nsamples, cfg.nsamples_overscan, cfg.expect_nsamples,
        cfg.msb_first, cfg.do_rx_sync, cfg.sync_byte,
    )


CARRY_FIELDS = (
    "pos", "carrier", "noconfidence", "track_amplitude", "peak_confidence",
    "conf_total", "ampl_total", "nframes", "carrier_nsamples", "stop",
)


def zero_carry(batch: int) -> dict:
    """Fresh per-stream state machine carry (all counters zero)."""
    zf = np.zeros(batch, np.float32)
    zi = np.zeros(batch, np.int32)
    zb = np.zeros(batch, bool)
    return {
        "pos": zi.copy(), "carrier": zb.copy(), "noconfidence": zi.copy(),
        "track_amplitude": zf.copy(), "peak_confidence": zf.copy(),
        "conf_total": zf.copy(), "ampl_total": zf.copy(),
        "nframes": zi.copy(), "carrier_nsamples": zi.copy(),
        "stop": zb.copy(),
    }


def geo_from_key(cfg_key) -> DemodGeometry:
    (sample_rate, data_rate_bits, n_data_bits, nstartbits, nstopbits_bits,
     b_mark, b_space, fftsize, nb, magscalar_bits, bit_begin, n_bits,
     req_data, req_sync, use_f64, frame_nsamples, overscan,
     expect_nsamples, msb_first, do_rx_sync, sync_byte) = cfg_key
    return DemodGeometry(
        nb=nb, fftsize=fftsize, b_mark=b_mark, b_space=b_space,
        magscalar=float(np.uint32(magscalar_bits).view(np.float32)),
        bit_begin=bit_begin, n_bits=n_bits, req_data=req_data,
        req_sync=req_sync, use_f64=use_f64)


def normalize_input(x, input_dtype: str):
    """Device-side sample normalization for compact wire encodings.

    "int16" halves the host->device transfer for PCM16 sources; "ulaw" /
    "alaw" / "pcm8" quarter it (1 byte/sample) for the telephony
    subformats the reference reads transparently via sf_readf_float
    (src/simpleaudio-sndfile.c:46-70).  The G.711 expansions are the
    same integer algebra as the host tables (sigio/containers.py
    _ULAW_DEC/_ALAW_DEC) so device values are bit-identical to a
    host-expanded float read."""
    if input_dtype == "int16":
        return x.astype(jnp.float32) / jnp.float32(32768.0)
    if input_dtype == "ulaw":
        b = x.astype(jnp.int32)
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        v = jnp.where((u & 0x80) != 0, 0x84 - t, t - 0x84)
        return v.astype(jnp.float32) / jnp.float32(32768.0)
    if input_dtype == "alaw":
        b = x.astype(jnp.int32)
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        t = jnp.where(seg == 0, t + 8,
                      jnp.where(seg == 1, t + 0x108,
                                (t + 0x108) << jnp.maximum(seg - 1, 0)))
        v = jnp.where((a & 0x80) != 0, t, -t)
        return v.astype(jnp.float32) / jnp.float32(32768.0)
    if input_dtype == "pcm8":                # unsigned WAV PCM8
        v = (x.astype(jnp.int32) - 128) << 8
        return v.astype(jnp.float32) / jnp.float32(32768.0)
    return x


# wire dtypes that arrive as raw uint8 and expand on device
U8_ENCODINGS = ("ulaw", "alaw", "pcm8")

# pad/fill byte per encoding: the scan window's deepest score reads up
# to ~try_max samples PAST a stream's total, so buffers need SOME valid
# codeword there.  u-law 0xFF and PCM8 0x80 decode to exactly 0.0;
# A-law has no zero codeword (0xD5 decodes to +8) — so the receivers
# additionally mask expanded u8 wires to exact 0.0 past each stream's
# total (expand_wire below), making the pad value decision-irrelevant
# and every u8 wire decode bit-identical to the host float path's
# zero fill (reference zero-refill: src/minimodem.c:1166-1174)
PAD_BYTE = {"ulaw": 0xFF, "alaw": 0xD5, "pcm8": 0x80}


def expand_wire(x, total, input_dtype, extra: int = 0):
    """Expand a raw-u8 wire buffer [B, T] on device and zero every
    position >= the stream's real-sample end (total + extra).

    G.711 A-law has no exact-zero codeword, so pad bytes past
    end-of-stream would otherwise expand to +-8/32768 DC where the
    float path (and the host engine's samplebuf refill,
    src/minimodem.c:1166-1174) holds exact zeros — trailing-frame
    confidences would drift between engines.  The mask restores
    decision-exact parity for all three u8 encodings.

    extra: static count of REAL samples past `total` (segmented decode
    feeds lookahead beyond the scan bound — PipelinedReceiver — which
    must not be clipped); 0 for one-shot calls, where `total` IS the
    end of real data."""
    v = normalize_input(x, input_dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    bound = total + np.int32(extra) if extra else total
    return jnp.where(idx < bound[:, None], v, jnp.float32(0.0))


def alloc_wire(shape, samples_dtype, in_encoding: str = None):
    """Zero-signal-filled host buffer for a wire upload: np.zeros for
    int16/float32, the encoding's silence codeword for raw u8, zero
    bytes for dpack (zero header seeds + zero deltas reconstruct exact
    silence; a truncated payload zero-extends to the same values a
    longer pack of the zero tail would produce)."""
    from .wirepack import parse_spec

    if in_encoding and parse_spec(in_encoding):
        # zero bytes decode as exact silence in either wire framing
        # (u8 or the faster int16 view)
        return np.zeros(shape, samples_dtype)
    if in_encoding:
        return np.full(shape, PAD_BYTE[in_encoding], np.uint8)
    return np.zeros(shape, samples_dtype)


def wire_dtype(samples: np.ndarray, in_encoding: str = None) -> str:
    """Wire encoding of a host sample array: an explicit u8 encoding
    (U8_ENCODINGS) or a dpack spec (ops/wirepack.py) wins; else
    int16/float32 by dtype."""
    from .wirepack import parse_spec

    if in_encoding and parse_spec(in_encoding):
        return in_encoding
    if in_encoding:
        assert in_encoding in U8_ENCODINGS, in_encoding
        assert samples.dtype == np.uint8, samples.dtype
        return in_encoding
    return "int16" if samples.dtype == np.int16 else "float32"


def make_score_packer(cfg_key, t_total: int, input_dtype: str):
    """Traced fn x[t_total + halo] -> packed scores [8, t_total] uint32.

    Channel layout (floats bitcast): 0 conf_data, 1 conf_sync, 2 ampl_data,
    3 ampl_sync, 4 bits_lo, 5 bits_hi, 6/7 zero.  Shared by the XLA
    receiver (stage 3 while_loop) and the Pallas megakernel."""
    geo = geo_from_key(cfg_key)
    basis_np = make_basis(geo, np.float64 if geo.use_f64 else np.float32)
    dtype = jnp.float64 if geo.use_f64 else jnp.float32

    # the fused Pallas kernel does stages 1+2 tile-resident in VMEM
    # (ops/pallas_score.py) — the XLA pipeline below materializes every
    # intermediate plane in HBM and is kept for f64 / CPU / long filters
    fused = None
    from .pallas_score import fused_packer_eligible, make_fused_packer
    if fused_packer_eligible(geo, t_total):
        fused = make_fused_packer(geo, basis_np, t_total)

    # score in T-tiles via lax.map: the per-bit [n_bits, T] float planes
    # then only ever exist at tile size, bounding scoring memory to
    # O(n_bits * T_TILE) per stream instead of O(n_bits * T)
    T_TILE = min(t_total, 1 << 18)
    # t_total need not divide evenly (pad-free mega score lengths are
    # multiples of the fused scorer's 32K tile, not this 256K one):
    # score a zero-padded tail tile and slice the garbage offsets off
    t_pad = (-t_total) % T_TILE
    N_TILES = (t_total + t_pad) // T_TILE

    def score_arrays(x):
        """stages 1+2 -> packed per-offset channels [8, t_total] uint32."""
        x = normalize_input(x, input_dtype)
        if fused is not None:
            return fused(x)
        xd = x.astype(dtype)
        if N_TILES == 1:
            return _score_tile(xd, t_total, t_total + geo.max_begin)
        if t_pad:
            xd = jnp.pad(xd, (0, t_pad))
        tiles = jnp.stack([
            xd[k * T_TILE: k * T_TILE + T_TILE + geo.halo]
            for k in range(N_TILES)])
        packed_tiles = jax.lax.map(
            lambda xt: _score_tile(xt, T_TILE, T_TILE + geo.max_begin),
            tiles)                                  # [N_TILES, 8, T_TILE]
        packed = packed_tiles.transpose(1, 0, 2).reshape(
            8, N_TILES * T_TILE)
        return packed[:, :t_total] if t_pad else packed

    def _score_tile(xd, t_len, tile_s_len):
        corr = correlate_any(xd, geo, basis_np, tile_s_len)
        ch = score_frame_channels(corr, geo, t_len, dtype)
        # pack all six per-offset channels as one [8, T] uint32 array so the
        # while loop fetches a whole score window with ONE dynamic slice per
        # stream per iteration.  Channel layout (floats bitcast):
        #   0 conf_data  1 conf_sync  2 ampl_data  3 ampl_sync
        #   4 bits_lo    5 bits_hi    6,7 zero
        # (T must stay the minormost dim: tiny minor dims make XLA pick an
        # (8,128)-tiled layout that inflates memory ~16-32x)
        u = jax.lax.bitcast_convert_type
        zeros = jnp.zeros_like(ch["bits_lo"])
        return jnp.stack([
            u(ch["conf_data"], jnp.uint32), u(ch["conf_sync"], jnp.uint32),
            u(ch["ampl_data"], jnp.uint32), u(ch["ampl_sync"], jnp.uint32),
            ch["bits_lo"], ch["bits_hi"], zeros, zeros], axis=0)

    return score_arrays


def make_score_packer_planes(cfg_key, t_total: int, input_dtype: str):
    """Traced fn x[t_total + halo] -> channel planes [n_ch, t_total]
    uint32 (pallas_score.plane_rows layout) — the megakernel's input
    form (round 3).  The v2 8-row packed form moves 32 B/offset where
    the common geometry carries 12 B of information (conf_sync/ampl_sync
    alias the data channels without --sync-byte, bits_hi is zero for
    n_bits <= 32, rows 6/7 are always zero); emitting only the distinct
    planes (+1 never-written DMA-alignment pad row) attacks the
    measured ~110 GB/s scorer write wall (ROADMAP item 1; reference hot
    loop analogue: src/fsk.c:117-174).

    Dual-expect / wide-bits geometries return the v2 8-row layout
    unchanged (rows match v2 order).  Uses the fused Pallas scorer's
    planes mode when eligible; otherwise gathers the planes from the
    legacy 8-row packer (CPU/interpret paths).
    Returns (fn, n_ch, rows)."""
    from .pallas_score import (
        fused_packer_eligible,
        make_fused_packer,
        plane_rows,
    )

    geo = geo_from_key(cfg_key)
    n_ch, rows = plane_rows(geo.n_bits, geo.req_data, geo.req_sync)
    if n_ch == 8:
        # v2 layout IS the plane layout here (legacy row order)
        return (make_score_packer(cfg_key, t_total, input_dtype),
                n_ch, rows)

    if fused_packer_eligible(geo, t_total):
        basis_np = make_basis(geo, np.float32)
        fused = make_fused_packer(geo, basis_np, t_total, planes=True)

        def score_planes(x):
            return fused(normalize_input(x, input_dtype))

        return score_planes, n_ch, rows

    legacy = make_score_packer(cfg_key, t_total, input_dtype)
    # gather [cd, ad, bl, pad] from the legacy 8-row form (row 6 is the
    # always-zero pad source)
    gather_np = np.asarray([0, 2, 4, 6], np.int32)

    def score_planes(x):
        return legacy(x)[jnp.asarray(gather_np)]

    return score_planes, n_ch, rows


def hybrid_default_on() -> bool:
    """Hybrid harvester dispatch: on by default for compact geometries;
    MINIMODEM_TPU_HYBRID=0 falls back to the plain while_loop."""
    import os

    return os.environ.get("MINIMODEM_TPU_HYBRID", "1") not in (
        "0", "", "off")


@functools.lru_cache(maxsize=32)
def _build_device_rx(cfg_key, t_total: int, rx_one: bool,
                     input_dtype: str = "float32",
                     finalize: bool = True,
                     compact: bool = False,
                     packed_input: bool = False,
                     stop_on_overflow: bool = False,
                     u8_extra: int = 0):
    """Compile the full device receiver for a fixed scored length
    t_total (>= stream length in samples).

    input_dtype "int16" accepts raw PCM16 samples and normalizes them on
    device (x/32768, the libsndfile convention the reference relies on,
    reference: sf_readf_float in src/simpleaudio-sndfile.c:49) — halving
    the host->device transfer for S16 sources.

    packed_input=True: the receiver's first argument is pre-packed score
    channels [B, 8, t_total] uint32 (make_score_packer layout) instead of
    audio samples — the entry point for callers that shard the scoring
    stage over a mesh (parallel/service.py) and feed the state machine
    from gathered shards.

    compact=True (requires n_data_bits <= 8): frame bits are post-processed
    to data bytes ON DEVICE (stop-strip, bit window, msb reversal,
    sync-byte suppression — reference: src/minimodem.c:1414-1443) into a
    1-byte-per-frame stream; only carrier-transition control events use the
    wide event log.  This shrinks the device->host result from ~32 bytes
    per frame to ~1, which is what the host link actually bounds."""
    (sample_rate, data_rate_bits, n_data_bits, nstartbits, nstopbits_bits,
     b_mark, b_space, fftsize, nb, magscalar_bits, bit_begin, n_bits,
     req_data, req_sync, use_f64, frame_nsamples, overscan,
     expect_nsamples, msb_first, do_rx_sync, sync_byte) = cfg_key

    nstop_shift = 0 if np.uint32(nstopbits_bits).view(np.float32) == 0 else 1
    if compact:
        assert n_data_bits <= 8, "compact mode needs <=8 data bits"
        assert nstop_shift + nstartbits + n_data_bits <= 32

    geo = DemodGeometry(
        nb=nb, fftsize=fftsize, b_mark=b_mark, b_space=b_space,
        magscalar=float(np.uint32(magscalar_bits).view(np.float32)),
        bit_begin=bit_begin, n_bits=n_bits, req_data=req_data,
        req_sync=req_sync, use_f64=use_f64)

    # ---- static search geometry (reference: src/minimodem.c:1236-1251) ----
    data_rate_f = np.uint32(data_rate_bits).view(np.float32)
    nspb = np.float32(np.float32(sample_rate) / data_rate_f)
    geom = {}
    for carrier in (0, 1):
        if carrier:
            try_max = int(np.trunc(np.float32(
                nspb * np.float32(0.75)) + np.float32(0.5))) + overscan
            try_first = overscan
        else:
            try_max = int(np.trunc(nspb)) + overscan
            try_first = 0
        coarse = max(try_max // FSK_ANALYZE_NSTEPS, 1)
        fine = max(try_max // FSK_ANALYZE_NSTEPS_FINE, 1)
        geom[carrier] = dict(
            try_max=try_max,
            coarse_step=coarse,
            coarse=_scan_order(try_first, try_max, coarse),
            fine=_scan_order(try_first, try_max, fine),
        )

    # pad candidate lists into one [geo_carrier, fine?, K] static array
    K = max(len(g[k]) for g in geom.values() for k in ("coarse", "fine"))
    cand_np = np.full((2, 2, K), -1, np.int32)
    for carrier in (0, 1):
        cand_np[carrier, 0, :len(geom[carrier]["coarse"])] = geom[carrier]["coarse"]
        cand_np[carrier, 1, :len(geom[carrier]["fine"])] = geom[carrier]["fine"]

    min_advance = max(1, min(frame_nsamples - overscan,
                             geom[0]["try_max"], geom[1]["try_max"]))
    # multiple of 8 so the packed-result bitcast covers every byte slot
    max_events = ((t_total // min_advance + 16 + 7) // 8) * 8

    # ---- hybrid harvester statics -----------------------------------
    # In the locked steady state (carrier on, no-confidence run = 0) the
    # scan's candidate 0 is try_first == overscan, and fsk_find_frame's
    # early-exit rule (fsk.c:505-516: stop at the FIRST candidate whose
    # running-max crosses the search limit) means candidate 0 wins
    # outright whenever its own confidence crosses.  Every such frame
    # advances by exactly frame_nsamples, so the whole locked run lives
    # at an arithmetic progression of score offsets — which a strided
    # slice gathers in one vectorized read, and a lax.scan replays the
    # per-frame f32 update chain (track/peak/conf_total) bit-exactly,
    # lane-parallel across streams.  Frames that fail any commit
    # condition fall back to the per-frame while_loop (exact by
    # construction), so decisions replay the sequential engine
    # bit-for-bit.  This is the TPU-native answer to the reference's
    # per-frame hot loop (src/minimodem.c:1248-1463).
    harvest_adv = frame_nsamples
    use_hybrid = (compact and hybrid_default_on()
                  and harvest_adv > 0
                  and t_total // harvest_adv >= 16
                  and len(geom[1]["coarse"]) > 0
                  and geom[1]["coarse"][0] == overscan)

    # u8 wires expand + tail-mask to float32 in the receiver itself
    # (expand_wire) so the packer sees the same zeros-past-total the
    # host float path guarantees; dpack wires (ops/wirepack.py)
    # unpack + tail-mask the same way
    from .wirepack import parse_spec as _wp_parse
    from .wirepack import unpack_expand as _wp_unpack

    dp_spec = _wp_parse(input_dtype)
    pk_dtype = ("float32" if (dp_spec or input_dtype in U8_ENCODINGS)
                else input_dtype)
    score_arrays = (None if packed_input
                    else make_score_packer(cfg_key, t_total, pk_dtype))

    # ------------------------------------------------------------------
    def receiver(x, total, conf_threshold, conf_search_limit, carry):
        """Batched receiver with streaming state carry.

        x: [B, t_total + halo] (zero-padded past end-of-stream);
        total: [B] i32 valid lengths; carry: dict of [B] state-machine
        fields (see zero_carry) from a previous segment.  Returns
        (ev_type [B, E] i32, ev_pay [B, E, 6] u32, n_events [B] i32,
        carry_out).

        All B streams run the state machine in lockstep — each stream's
        decisions are independent and identical to the single-stream
        replay; inactive (finished) streams are mask-frozen.  With
        finalize=False the end-of-stream NOCARRIER report is suppressed
        and carry_out continues into the next segment.
        """
        # flatten to 2-D [B*8, T]: a 3-D [B, 8, T] form tempts XLA into an
        # (8,128)-tiling over the two small dims (~16-32x memory inflation)
        if packed_input:
            B = x.shape[0]
            packed = x.reshape(B * 8, -1)
        else:
            B = x.shape[0]
            if dp_spec:
                x = _wp_unpack(x, total, *dp_spec,
                               t_total + geo.halo, u8_extra)
            elif input_dtype in U8_ENCODINGS:
                x = expand_wire(x, total, input_dtype, u8_extra)
            packed = jax.vmap(score_arrays)(x).reshape(B * 8, -1)
        brange = jnp.arange(B)
        row0 = (brange * 8).astype(jnp.int32)

        # all candidate offsets lie in [0, W): slice one contiguous window
        # per stream per iteration and do every lookup as one-hot vector
        # math — no gathers inside the while loop (TPU gathers degrade to
        # scalar loads and dominated the loop otherwise)
        W = max(geom[0]["try_max"], geom[1]["try_max"])
        witer = np.arange(W, dtype=np.int32)                   # [W] static
        # one-hot candidate masks [geo, fine, K, W], built statically
        onehot_np = (cand_np[:, :, :, None] == witer[None, None, None, :])
        valid_np = cand_np >= 0                                 # [2, 2, K]

        def slice_windows(pos):
            """ONE packed-window slice per stream: [B, 8, W] uint32."""
            return jax.vmap(
                lambda r0, p: jax.lax.dynamic_slice(packed, (r0, p), (8, W))
            )(row0, pos)

        def find_frame(wins, geo_i, expect_i, fine_i, limit):
            """Replay fsk_find_frame's ordered scan with early exit
            (reference: src/fsk.c:477-502), vectorized over candidates AND
            streams.  Sequential semantics — strict improvement, earlier
            candidate wins ties, stop at the first running-max >= limit —
            via prefix-max + first-crossing argmax over the window.
            wins: packed score windows [B, 8, W] uint32;
            geo_i/expect_i: [B]; fine_i scalar; limit scalar."""
            f = lambda ch: jax.lax.bitcast_convert_type(  # noqa: E731
                wins[:, ch, :], jnp.float32)
            wconf_d, wconf_s = f(0), f(1)
            wampl_d, wampl_s = f(2), f(3)
            wblo, wbhi = wins[:, 4, :], wins[:, 5, :]
            onehot = jnp.asarray(onehot_np[:, fine_i])         # [2, K, W]
            oh = jnp.where(geo_i[:, None, None] == 1,
                           onehot[1][None], onehot[0][None])   # [B, K, W]
            valid = jnp.where(geo_i[:, None] == 1,
                              jnp.asarray(valid_np[1, fine_i])[None],
                              jnp.asarray(valid_np[0, fine_i])[None])
            clist = jnp.where(geo_i[:, None] == 1,
                              jnp.asarray(cand_np[1, fine_i])[None],
                              jnp.asarray(cand_np[0, fine_i])[None])

            ce = jnp.where(expect_i[:, None] == 0, wconf_d, wconf_s)
            c = jnp.sum(jnp.where(oh, ce[:, None, :], 0.0), axis=2,
                        dtype=jnp.float32)
            # NaN confidences are never selected sequentially (best < NaN
            # is false); sentinel to -1 so vector max ignores them too
            c = jnp.where(
                jnp.logical_or(~valid, jnp.isnan(c)), jnp.float32(-1.0), c)
            prefix_max = jax.lax.associative_scan(jnp.maximum, c, axis=1)
            # the sequential scan only checks the limit after a STRICT
            # improvement over best_c = 0 (fsk.c:505-516), so a
            # non-positive limit must not cross on c <= 0 candidates
            # (expect-mask zeros / the -1 NaN sentinel)
            crossed = jnp.logical_and(prefix_max >= limit,
                                      prefix_max > jnp.float32(0.0))
            any_cross = jnp.any(crossed, axis=1)
            k_stop = jnp.where(any_cross,
                               jnp.argmax(crossed, axis=1).astype(jnp.int32),
                               jnp.int32(K - 1))
            best_c = jnp.max(
                jnp.where(jnp.arange(K)[None, :] == k_stop[:, None],
                          prefix_max, -jnp.inf), axis=1)
            # first candidate attaining best_c (<= k_stop by construction)
            selhot = c == best_c[:, None]                      # [B, K]
            first = (jnp.cumsum(selhot.astype(jnp.int32), axis=1)
                     == 1) & selhot                            # [B, K]
            got = best_c > jnp.float32(0.0)
            t = jnp.sum(jnp.where(first, clist, 0), axis=1,
                        dtype=jnp.int32)
            # one-hot of the selected *window position* for value fetches
            poshot = jnp.any(first[:, :, None] & oh, axis=1)   # [B, W]
            ae = jnp.where(expect_i[:, None] == 0, wampl_d, wampl_s)
            a_sel = jnp.sum(jnp.where(poshot, ae, 0.0), axis=1,
                            dtype=jnp.float32)
            blo_sel = jnp.sum(jnp.where(poshot, wblo, jnp.uint32(0)),
                              axis=1, dtype=jnp.uint32)
            bhi_sel = jnp.sum(jnp.where(poshot, wbhi, jnp.uint32(0)),
                              axis=1, dtype=jnp.uint32)
            zero_f = jnp.float32(0.0)
            conf = jnp.where(got, best_c, zero_f)
            a = jnp.where(got, a_sel, zero_f)
            blo = jnp.where(got, blo_sel, jnp.uint32(0))
            bhi = jnp.where(got, bhi_sel, jnp.uint32(0))
            t = jnp.where(got, t, jnp.int32(0))
            return conf, a, blo, bhi, t

        try_max_arr = jnp.asarray(
            [geom[0]["try_max"], geom[1]["try_max"]], jnp.int32)
        coarse_step_arr = jnp.asarray(
            [geom[0]["coarse_step"], geom[1]["coarse_step"]], jnp.int32)

        state0 = dict(carry)
        state0["n_events"] = jnp.zeros((B,), jnp.int32)
        if use_hybrid:
            state0["h_failed"] = jnp.zeros((B,), bool)
        # packed event log [8, B, E] uint32: channels 0-5 payload,
        # 6 = type | flags<<8, 7 unused.  (channel dim majormost so the
        # (8,128) tiling lands on (B, E) without padding blowup; one
        # scatter per iteration.)
        state0["ev"] = jnp.zeros((8, B, max_events), jnp.uint32)
        if compact:
            state0["n_bytes"] = jnp.zeros((B,), jnp.int32)
            state0["bytes_buf"] = jnp.zeros((B, max_events), jnp.uint8)

        def emit_if(pred, st, record8):
            """Per-stream conditional append: blend the new record with the
            existing column at each stream's slot, write back with ONE
            scatter.  pred: [B]; record8: [B, 8]."""
            i = st["n_events"]
            st = dict(st)
            old = st["ev"][:, brange, i]                  # [8, B]
            new = jnp.where(pred[None, :], record8.T, old)
            st["ev"] = st["ev"].at[:, brange, i].set(new)
            st["n_events"] = i + jnp.where(pred, jnp.int32(1), jnp.int32(0))
            return st

        def active_of(st):
            return jnp.logical_and(
                jnp.logical_not(st["stop"]),
                jnp.logical_and(
                    st["pos"] + expect_nsamples <= total,
                    st["n_events"] < max_events - 2))

        def harvestable(st):
            """Streams eligible for a harvest attempt: on carrier with a
            clean confidence run, and not already refused at this pos."""
            return jnp.logical_and(
                st["carrier"],
                jnp.logical_and(st["noconfidence"] == 0,
                                jnp.logical_not(st["h_failed"])))

        def active_m(st):
            # hybrid M-phase: freeze harvest-eligible streams (the
            # vectorized harvester advances them); h_failed streams run
            # one per-frame step, which clears the flag
            return jnp.logical_and(active_of(st),
                                   jnp.logical_not(harvestable(st)))

        active_fn = active_m if use_hybrid else active_of

        def cond(st):
            return jnp.any(active_fn(st))

        def body(st):
            active = active_fn(st)
            pos = st["pos"]
            carrier = st["carrier"]
            geo_i = carrier.astype(jnp.int32)
            expect_i = 1 - geo_i               # carrier->data(0) else sync(1)
            try_step = coarse_step_arr[geo_i]
            try_max = try_max_arr[geo_i]

            wins = slice_windows(pos)
            conf, ampl, blo, bhi, fstart = find_frame(
                wins, geo_i, expect_i, 0, conf_search_limit)

            refine = jnp.logical_and(
                active, conf < st["peak_confidence"] * jnp.float32(0.75))
            peak_confidence = jnp.where(
                refine, jnp.float32(0.0), st["peak_confidence"])
            ampl_drop = ampl < st["track_amplitude"] * jnp.float32(0.25)
            conf = jnp.where(ampl_drop, jnp.float32(0.0), conf)

            no_conf = jnp.logical_and(active, conf <= conf_threshold)
            got = jnp.logical_and(active, conf > conf_threshold)

            # ---- no-confidence path (reference: :1292-1321) ----
            noconfidence = jnp.where(
                no_conf, st["noconfidence"] + 1,
                jnp.where(got, jnp.int32(0), st["noconfidence"]))
            drop = jnp.logical_and(
                no_conf, noconfidence > FSK_MAX_NOCONFIDENCE_BITS)
            drop_report = jnp.logical_and(drop, carrier)

            # ---- frame path ----
            acquired = jnp.logical_and(got, jnp.logical_not(carrier))
            do_refine = jnp.logical_or(refine, acquired)
            # carrier_nsamples accounting uses the COARSE frame start — the
            # reference adjusts it before the fine rescan
            # (src/minimodem.c:1324-1330 precedes :1357-1389)
            fstart_coarse = fstart
            # fine rescan: same scan window (geo_i), data expect (carrier
            # is now logically on), limit=inf (reference: :1357-1389)
            do_fine = jnp.logical_and(
                got,
                jnp.logical_and(
                    do_refine,
                    jnp.logical_and(conf < jnp.float32(np.inf),
                                    try_step > 1)))
            c2, a2, blo2, bhi2, fs2 = find_frame(
                wins, geo_i, jnp.zeros((B,), jnp.int32),
                1, jnp.float32(np.inf))
            take2 = jnp.logical_and(do_fine, c2 > conf)
            # NB: confidence itself is NOT updated (reference: :1383-1387)
            ampl = jnp.where(take2, a2, ampl)
            blo = jnp.where(take2, blo2, blo)
            bhi = jnp.where(take2, bhi2, bhi)
            fstart = jnp.where(take2, fs2, fstart)

            # stats + tracking (frame path only)
            carrier_nsamples = st["carrier_nsamples"] + jnp.where(
                got,
                jnp.int32(frame_nsamples)
                + jnp.where(carrier, fstart_coarse - overscan, 0),
                0)
            track_amplitude = jnp.where(
                got, (st["track_amplitude"] + ampl) / jnp.float32(2.0),
                st["track_amplitude"])
            peak_confidence = jnp.where(
                jnp.logical_and(got, peak_confidence < conf),
                conf, peak_confidence)
            conf_total = jnp.where(got, st["conf_total"] + conf,
                                   st["conf_total"])
            ampl_total = jnp.where(got, st["ampl_total"] + ampl,
                                   st["ampl_total"])
            nframes = jnp.where(got, st["nframes"] + 1, st["nframes"])

            advance = jnp.where(
                got, fstart + jnp.int32(frame_nsamples) - overscan,
                jnp.where(no_conf, try_max, jnp.int32(0)))

            # ---- event emission ----
            zb_u = jnp.zeros((B,), jnp.uint32)
            if compact:
                # NOCARRIER/CARRIER control records carry the byte-stream
                # position; frame data goes to the byte stream instead
                bpos = st["n_bytes"].view(jnp.uint32)
                drop_rec = jnp.stack([
                    st["nframes"].view(jnp.uint32),
                    st["conf_total"].view(jnp.uint32),
                    st["ampl_total"].view(jnp.uint32),
                    st["carrier_nsamples"].view(jnp.uint32),
                    bpos, zb_u,
                    jnp.full((B,), EV_NOCARRIER, jnp.uint32),
                    zb_u], axis=1)
                carrier_rec = jnp.stack([
                    bpos, zb_u, zb_u, zb_u, zb_u, zb_u,
                    jnp.full((B,), EV_CARRIER, jnp.uint32),
                    zb_u], axis=1)
                record = jnp.where(drop_report[:, None], drop_rec,
                                   carrier_rec)
                st2 = emit_if(jnp.logical_or(acquired, drop_report), st,
                              record)

                # device-side frame-bit post-processing
                # (reference: src/minimodem.c:1414-1443)
                word = (blo >> jnp.uint32(nstop_shift + nstartbits)) \
                    & jnp.uint32((1 << n_data_bits) - 1)
                if msb_first:
                    rev = jnp.zeros_like(word)
                    for k in range(n_data_bits):
                        rev = rev | (((word >> jnp.uint32(k))
                                      & jnp.uint32(1))
                                     << jnp.uint32(n_data_bits - 1 - k))
                    word = rev
                emit_byte = got
                # suppress sync bytes (reference: src/minimodem.c:1436-1439);
                # a sync value wider than the data mask can never match
                if do_rx_sync and 0 <= sync_byte < (1 << n_data_bits):
                    emit_byte = jnp.logical_and(
                        got, word != jnp.uint32(sync_byte))
                ib = st["n_bytes"]
                oldb = st2["bytes_buf"][brange, ib]
                newb = jnp.where(emit_byte, word.astype(jnp.uint8), oldb)
                st2["bytes_buf"] = st2["bytes_buf"].at[brange, ib].set(newb)
                st2["n_bytes"] = ib + jnp.where(emit_byte, jnp.int32(1),
                                                jnp.int32(0))
            else:
                # wide records: frame payload inline (with the ACQUIRED
                # flag folded in; the host renderer expands it to a
                # CARRIER event + codec reset before the frame)
                drop_rec = jnp.stack([
                    st["nframes"].view(jnp.uint32),
                    st["conf_total"].view(jnp.uint32),
                    st["ampl_total"].view(jnp.uint32),
                    st["carrier_nsamples"].view(jnp.uint32),
                    zb_u,
                    pos.view(jnp.uint32) if stop_on_overflow else zb_u,
                    jnp.full((B,), EV_NOCARRIER, jnp.uint32),
                    zb_u], axis=1)
                frame_type = (jnp.uint32(EV_FRAME)
                              + jnp.where(acquired,
                                          jnp.uint32(EV_FLAG_ACQUIRED),
                                          jnp.uint32(0)))
                frame_rec = jnp.stack([
                    blo, bhi, conf.view(jnp.uint32), ampl.view(jnp.uint32),
                    fstart.view(jnp.uint32),
                    pos.view(jnp.uint32) if stop_on_overflow else zb_u,
                    frame_type, zb_u], axis=1)
                record = jnp.where(drop_report[:, None], drop_rec, frame_rec)
                st2 = emit_if(jnp.logical_or(got, drop_report), st, record)

            # ---- state update (inactive streams freeze) ----
            reset_stats = drop_report
            st2["pos"] = pos + advance
            st2["carrier"] = jnp.where(got, True,
                                       jnp.where(drop, False, carrier))
            st2["noconfidence"] = noconfidence
            st2["track_amplitude"] = jnp.where(
                reset_stats, jnp.float32(0.0), track_amplitude)
            st2["peak_confidence"] = peak_confidence
            st2["conf_total"] = jnp.where(
                reset_stats, jnp.float32(0.0), conf_total)
            st2["ampl_total"] = jnp.where(
                reset_stats, jnp.float32(0.0), ampl_total)
            st2["nframes"] = jnp.where(reset_stats, jnp.int32(0), nframes)
            st2["carrier_nsamples"] = jnp.where(
                reset_stats, jnp.int32(0), carrier_nsamples)
            if rx_one:
                st2["stop"] = jnp.logical_or(st["stop"], drop_report)
            if stop_on_overflow:
                # -a re-arms carrier detection at EVERY no-confidence
                # overflow, reported or not (minimodem.c:1295-1297 resets
                # carrier_band before the carrier check) — the segment
                # must end here so the host can retune
                st2["stop"] = jnp.logical_or(st2["stop"], drop)
            if use_hybrid:
                # a processed frame re-arms the harvest attempt
                st2["h_failed"] = jnp.where(active, False, st["h_failed"])
            return st2

        # ---- hybrid harvest phase (vectorized locked-run decode) ----
        kt_grid = t_total // harvest_adv       # global stride-grid rows

        def harvest(st):
            adv = jnp.int32(harvest_adv)
            elig = jnp.logical_and(active_of(st), harvestable(st))
            start = st["pos"] + jnp.int32(overscan)  # candidate-0 offset
            q = start // adv                         # grid row of frame 0
            r = start - q * adv                      # per-stream phase

            # candidate-0 values for EVERY grid row j at each stream's
            # phase r: a static reshape of the packed row plus a masked
            # integer reduce over the stride (exact — single nonzero
            # uint32 term).  No dynamic slice starts, so XLA emits a
            # plain fused masked-reduction over the array instead of a
            # scalarized gather (the vmap(dynamic_slice) form measured
            # 70x slower on TPU).
            rsel = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, harvest_adv), 2) == r[:, None, None]

            # chunk the grid rows so the (B, chunk, adv) relayout temp
            # stays ~tens of MB — a single whole-array reshape made XLA
            # materialize a second 6 GB copy of `packed` (measured OOM
            # at B=64 x 60 s)
            j_chunk = max(64, (1 << 22) // max(harvest_adv, 1))

            def phase_select(ch):
                p3 = packed.reshape(B, 8, t_total)
                outs = []
                for j0 in range(0, kt_grid, j_chunk):
                    j1 = min(kt_grid, j0 + j_chunk)
                    seg = p3[:, ch, j0 * harvest_adv:j1 * harvest_adv]
                    seg = seg.reshape(B, j1 - j0, harvest_adv)
                    outs.append(jnp.sum(
                        jnp.where(rsel, seg, jnp.uint32(0)),
                        axis=2, dtype=jnp.uint32))
                return jnp.concatenate(outs, axis=1)       # [B, Kt]

            c_all = jax.lax.bitcast_convert_type(
                phase_select(0), jnp.float32)            # conf_data
            a_all = jax.lax.bitcast_convert_type(
                phase_select(2), jnp.float32)            # ampl_data
            b_all = phase_select(4)                      # bits_lo

            # frame bits -> data word (compact post-processing, same as
            # the per-frame path)
            word_all = (b_all >> jnp.uint32(nstop_shift + nstartbits)) \
                & jnp.uint32((1 << n_data_bits) - 1)
            if msb_first:
                rev = jnp.zeros_like(word_all)
                for k in range(n_data_bits):
                    rev = rev | (((word_all >> jnp.uint32(k))
                                  & jnp.uint32(1))
                                 << jnp.uint32(n_data_bits - 1 - k))
                word_all = rev
            if do_rx_sync and 0 <= sync_byte < (1 << n_data_bits):
                # a sync byte is suppressed, not emitted: it would
                # desync the contiguous byte write — end the chain and
                # let the per-frame path process it exactly
                nonsync = word_all != jnp.uint32(sync_byte)
            else:
                nonsync = jnp.ones_like(word_all, dtype=bool)

            # last grid row each stream may commit (position bound)
            nmax = (total - jnp.int32(expect_nsamples) - st["pos"]) // adv
            jmax = q + nmax                            # inclusive bound

            # exact replay of the per-frame f32 update chain over the
            # global grid index j (stream b's frame k sits at row
            # q_b + k), all streams lane-parallel; step j commits iff
            # every condition of the frame path holds with the EXACT
            # running track/peak values (no refine, no amplitude
            # squelch, candidate-0 early exit, in bounds)
            jtab = jnp.arange(kt_grid, dtype=jnp.int32)

            def step(carryv, xs):
                alive, track, peak, ctot, atot, L = carryv
                c, a, ns, j = xs
                started = j >= q
                commit = alive & elig & started & (j <= jmax) & ns
                commit &= c >= conf_search_limit
                commit &= c > jnp.float32(0.0)
                commit &= c >= peak * jnp.float32(0.75)
                commit &= a >= track * jnp.float32(0.25)
                commit &= c > conf_threshold
                track = jnp.where(commit, (track + a) / jnp.float32(2.0),
                                  track)
                peak = jnp.where(jnp.logical_and(commit, peak < c), c,
                                 peak)
                ctot = jnp.where(commit, ctot + c, ctot)
                atot = jnp.where(commit, atot + a, atot)
                L = L + jnp.where(commit, jnp.int32(1), jnp.int32(0))
                alive = jnp.where(started, commit, alive)
                return (alive, track, peak, ctot, atot, L), None

            carry0 = (elig, st["track_amplitude"], st["peak_confidence"],
                      st["conf_total"], st["ampl_total"],
                      jnp.zeros((B,), jnp.int32))
            (alive, track, peak, ctot, atot, L), _ = jax.lax.scan(
                step, carry0,
                (c_all.T, a_all.T, nonsync.T, jtab), unroll=32)

            st = dict(st)
            # contiguous byte write: stream b's harvested words live at
            # grid rows q_b..q_b+L-1.  Shift the whole word row into a
            # ZERO scratch so row q lands at byte position n_bytes, then
            # blend only [n_bytes, n_bytes+L) into the real buffer —
            # rows before q / after q+L-1 must not clobber neighbors
            cap = st["bytes_buf"].shape[1]
            scratch = jnp.zeros((B, kt_grid + cap + kt_grid), jnp.uint8)
            scratch = jax.vmap(
                lambda row, w, s0: jax.lax.dynamic_update_slice(
                    row, w, (s0,)))(
                scratch, word_all.astype(jnp.uint8),
                jnp.int32(kt_grid) + st["n_bytes"] - q)
            cand = scratch[:, kt_grid:kt_grid + cap]
            idx = jnp.arange(cap, dtype=jnp.int32)[None, :]
            in_run = jnp.logical_and(idx >= st["n_bytes"][:, None],
                                     idx < (st["n_bytes"] + L)[:, None])
            st["bytes_buf"] = jnp.where(in_run, cand, st["bytes_buf"])
            st["n_bytes"] = st["n_bytes"] + L
            st["pos"] = st["pos"] + L * adv
            st["track_amplitude"] = track
            st["peak_confidence"] = peak
            st["conf_total"] = ctot
            st["ampl_total"] = atot
            st["nframes"] = st["nframes"] + L
            st["carrier_nsamples"] = st["carrier_nsamples"] + L * adv
            # a refused harvest forces one per-frame step before retry
            st["h_failed"] = jnp.where(elig, L == 0, st["h_failed"])
            return st

        if use_hybrid:
            def outer_body(st):
                st = jax.lax.while_loop(cond, body, st)
                return harvest(st)

            def outer_cond(st):
                return jnp.any(active_of(st))

            st = jax.lax.while_loop(outer_cond, outer_body, state0)
        else:
            st = jax.lax.while_loop(cond, body, state0)

        if finalize:
            # end-of-stream: final NOCARRIER stats if still on carrier
            zb_u = jnp.zeros((B,), jnp.uint32)
            bpos = (st["n_bytes"].view(jnp.uint32) if compact else zb_u)
            final_rec = jnp.stack([
                st["nframes"].view(jnp.uint32),
                st["conf_total"].view(jnp.uint32),
                st["ampl_total"].view(jnp.uint32),
                st["carrier_nsamples"].view(jnp.uint32),
                bpos, zb_u,
                jnp.full((B,), EV_NOCARRIER, jnp.uint32),
                zb_u], axis=1)
            st = emit_if(st["carrier"], st, final_rec)

        carry_out = {k: st[k] for k in CARRY_FIELDS}
        if compact:
            flat = pack_compact_results(
                st["ev"], st["n_events"], st["bytes_buf"], st["n_bytes"])
            return flat, st["ev"], carry_out
        return st["ev"], st["n_events"], carry_out

    return jax.jit(receiver), max_events, geo


# device->host transfers on this link cost ~28 ms latency each (plus
# ~30 MB/s), so compact results are packed into ONE flat u32 buffer on
# device and fetched with a single transfer.  The event log is capped at
# EV_CAP records in the packed form (events are carrier transitions —
# rare); the full log rides along on-device for the overflow fallback.
EV_CAP = 32


def pack_compact_results(ev, n_events, bytes_buf, n_bytes):
    """Device-side epilogue: flat u32 = [n_events(B), n_bytes(B),
    ev[:, :, :cap] flattened, bytes_buf bitcast to u32 flattened]."""
    b = n_events.shape[0]
    cap = min(EV_CAP, ev.shape[2])
    ev_c = ev[:, :, :cap]
    e4 = bytes_buf.shape[1] // 4
    by_u32 = jax.lax.bitcast_convert_type(
        bytes_buf[:, :e4 * 4].reshape(b, e4, 4), jnp.uint32)
    return jnp.concatenate([
        n_events.astype(jnp.uint32), n_bytes.astype(jnp.uint32),
        ev_c.reshape(-1), by_u32.reshape(-1)])


def _collect_compact(out, b: int):
    """One-transfer collection of packed compact results.
    out = (flat, ev_full); ev_full is only fetched if some stream logged
    more than EV_CAP events."""
    flat_dev, ev_dev = out[0], out[1]
    flat = np.ascontiguousarray(np.asarray(flat_dev))
    max_events = ev_dev.shape[2]
    cap = min(EV_CAP, max_events)
    nev = flat[:b].astype(np.int32)
    nby = flat[b: 2 * b].astype(np.int32)
    ev = flat[2 * b: 2 * b + 8 * b * cap].reshape(8, b, cap)
    by = flat[2 * b + 8 * b * cap:].reshape(b, -1).view(np.uint8)
    kmax = int(nev.max(initial=0))
    if kmax > cap:                      # rare: fetch the full event log
        ev = np.asarray(ev_dev[:, :, :kmax])
    return [
        (*unpack_events(ev[:, i, :], int(nev[i])), by[i, :int(nby[i])])
        for i in range(b)
    ]


def _collect_results(out, b: int, compact: bool):
    """Pull device results.  Compact outputs are (flat, ev_full) from
    pack_compact_results — one transfer; wide outputs are (ev, n) —
    event logs sliced to the used prefix before crossing the host link.
    Returns per-stream tuples — (ev_type, ev_pay) or (ev_type, ev_pay,
    byte_stream)."""
    if compact:
        return _collect_compact(out, b)
    ev, n = out
    n = np.asarray(n)
    kmax = max(int(n.max(initial=0)), 1)
    ev = np.asarray(ev[:, :, :kmax])
    return [unpack_events(ev[:, i, :], int(n[i])) for i in range(b)]


def _sched_pad(n_bits: int) -> int:
    """Bit-schedule pad bucket: powers of two from 512 up to 4096 (so a
    short burst — e.g. one ~300-bit Caller-ID message — doesn't score
    8x its audio), then multiples of 4096 (512 packed bytes/stream over
    the host link)."""
    v = 512
    while v < n_bits and v < 4096:
        v *= 2
    if v < n_bits:
        v = ((n_bits + 4095) // 4096) * 4096
    return v


def _round_up_pow2(n: int, floor: int = 1 << 14) -> int:
    """Bucket sizes to limit recompiles without inflating memory: powers of
    two up to 256K, then multiples of 256K."""
    v = floor
    while v < n and v < (1 << 18):
        v *= 2
    if v < n:
        step = 1 << 18
        v = ((n + step - 1) // step) * step
    return v


class DeviceLoopback:
    """On-device TX->RX pipeline: a compact bit schedule goes up, decoded
    frame events come back; audio never crosses the host link.

    This is the pure decode-throughput configuration (and a building block
    for on-TPU modem pipelines where audio originates on device)."""

    def __init__(self, cfg: ModemConfig, precision: str = "auto",
                 amplitude: float = 1.0, rx_one: bool = False):
        import jax
        import jax.numpy as jnp

        from .tx_device import frame_synth_params, uniform_bits_supported

        self.cfg = cfg
        self.key = device_rx_key(cfg, precision)
        self.bit_ns = cfg.bit_nsamples_tx
        self.uniform = uniform_bits_supported(cfg)
        self.frame_len = frame_synth_params(cfg)["frame_len"]
        self._fns = {}
        self._amplitude = amplitude
        self._rx_one = rx_one
        self._geo = geometry_from_config(cfg, precision)

    def _fn_for(self, b_pad: int, batch: int, frames_mode: bool = False,
                lead_trail: tuple = (2, 2), chain: int = 1):
        import jax

        cache_key = (b_pad, batch, frames_mode, lead_trail, chain)
        fn = self._fns.get(cache_key)
        if fn is not None:
            return fn
        run, compact, use_mega = self.build_loop(
            b_pad, batch, frames_mode, lead_trail, chain)
        if use_mega:
            # f64 synth + Pallas kernel in one program: trace under the
            # ambient x64 config, lower under x64-off (utils/aot.py)
            from ..utils.aot import jit_mosaic

            fn = jit_mosaic(run)
        else:
            fn = jax.jit(run, static_argnames=())
        self._fns[cache_key] = (fn, compact, use_mega)
        return fn, compact, use_mega

    def build_loop(self, b_pad: int, batch: int, frames_mode: bool = False,
                   lead_trail: tuple = (2, 2), chain: int = 1):
        """Build the (unjitted) synth+decode device program — (run,
        compact, use_mega).  _fn_for jits it directly; the sharded
        service layer (parallel/service.py ShardedLoopback) wraps it in
        shard_map so every mesh shard runs this exact per-chip program."""
        import jax
        import jax.numpy as jnp

        from .pallas_rx import build_mega_rx, mega_default_on, mega_supported
        from .tx_device import device_synthesize, device_synthesize_frames

        cfg = self.cfg
        if frames_mode:
            n_samples = (lead_trail[0] * self.bit_ns
                         + b_pad * self.frame_len
                         + lead_trail[1] * self.bit_ns)
        else:
            n_samples = b_pad * self.bit_ns
        t_total = _round_up_pow2(n_samples + cfg.nsamples_overscan + 1)
        compact = cfg.n_data_bits <= 8
        use_mega = (compact and mega_supported(self.key)
                    and mega_default_on())
        t_score = t_total
        if use_mega:
            from .pallas_rx import mega_score_len

            # packer scores mega_score_len extra zero-signal tiles so
            # the kernel's w_res refill slack needs no pad copy
            t_score = mega_score_len(self.key, t_total)
            packer, n_ch_mega, _ = make_score_packer_planes(
                self.key, t_score, "float32")
            kern, _, _ = build_mega_rx(
                self.key, t_total, self._rx_one, batch)
        else:
            rx_fn, _, _ = _build_device_rx(
                self.key, t_total, self._rx_one, "float32", True, compact)
        geo = self._geo
        pad_to = t_score + geo.halo
        amp = self._amplitude

        def loop(bits, total, thr, lim, carry, n_frames=None):
            # bits: [B, b_pad//8] packed flat bit schedules (LSB-first,
            # np.packbits bitorder='little' — 1/8th the h2d bytes; the
            # schedule upload measured ~97 ms of the 60 s x64 bench at
            # the tunnel's ~49 MB/s) — or, in frames mode, [B, b_pad,
            # n_data_bits] unpacked per-frame data-bit rows
            if frames_mode:
                s = jax.vmap(lambda fb, nf: device_synthesize_frames(
                    fb, nf, cfg, lead_trail[0], lead_trail[1], amp))(
                        bits, n_frames)
            else:
                n = jax.lax.iota(jnp.int32, b_pad)
                sh = (n & 7).astype(jnp.uint8)
                unpacked = (jnp.repeat(bits, 8, axis=1)
                            >> sh[None, :]) & jnp.uint8(1)
                s = jax.vmap(
                    lambda bb: device_synthesize(bb, cfg, amp))(unpacked)
            bsz = bits.shape[0]
            x = jnp.zeros((bsz, pad_to), jnp.float32)
            x = jax.lax.dynamic_update_slice(x, s, (0, 0))
            if use_mega:
                packed = jax.vmap(packer)(x).reshape(
                    bsz * n_ch_mega, t_score)
                ci = jnp.zeros((bsz, 8), jnp.int32)
                cf = jnp.zeros((bsz, 4), jnp.float32)
                return kern(packed, total, jnp.stack([thr, lim]),
                            ci, cf)[:2]
            out = rx_fn(x, total, thr, lim, carry)
            return out[:-1]  # drop carry

        run = loop
        if chain > 1:
            # K sub-batches sequenced INSIDE one device program: each
            # fn() call on this harness pays ~25 ms of fixed per-execute
            # cost (remote-service dispatch; measured 142 ms/call
            # back-to-back on device-resident inputs vs ~117 ms of
            # chained in-jit device compute for the 64 x 60 s Bell202
            # batch) — a lax.scan over stacked schedules pays it once
            # per K batches.  Memory stays flat: scan runs sub-batches
            # sequentially, so only one ~3 GB score buffer is live.
            assert not frames_mode, "chain rides the flat-bits path"

            def loop_k(bits_k, totals_k, thr, lim, carry):
                def body(_, args):
                    bits_j, total_j = args
                    return 0, loop(bits_j, total_j, thr, lim, carry)

                _, outs = jax.lax.scan(body, 0, (bits_k, totals_k))
                return outs

            run = loop_k
        return run, compact, use_mega

    def dispatch_events_batch(self, sched_list, conf_threshold: float = 1.5,
                              conf_search_limit: float = 2.3):
        """Async half of run_events_batch: upload + enqueue the device
        program and return an opaque handle WITHOUT waiting for results
        (jax dispatch is asynchronous).  A serving loop that dispatches
        batch i+1 before collecting batch i overlaps the host-side event
        collection and the link round trip with device compute — the
        steady-state pipelined configuration (this harness pays ~30 ms
        of tunnel latency per synchronous call; see CLAUDE.md)."""
        import jax.numpy as jnp

        assert self.uniform, (
            "flat bit schedules need uniform bit segments; use "
            "run_events_frames_batch for fractional stop bits")
        b_real = [len(s) for s in sched_list]
        b_pad = _sched_pad(max(b_real))
        bits = np.zeros((len(sched_list), b_pad), np.uint8)
        for i, s in enumerate(sched_list):
            bits[i, :len(s)] = s
        # 8 bits/byte over the host link (unpacked on device in loop())
        bits_pk = np.packbits(bits, axis=1, bitorder="little")
        totals = np.asarray([n * self.bit_ns for n in b_real], np.int32)
        fn, compact, use_mega = self._fn_for(b_pad, len(sched_list))
        out = fn(
            jnp.asarray(bits_pk), jnp.asarray(totals),
            np.float32(conf_threshold), np.float32(conf_search_limit),
            zero_carry(len(sched_list)))
        return out, len(sched_list), compact

    def prefetch_events_batch(self, handle):
        """Start the device->host copy of a dispatched batch's results
        without blocking.  In a pipelined serving loop, prefetching
        batch j right after dispatching batch j+1 rides the ~0.5 MB
        result transfer on top of batch j+1's device compute, so the
        later collect_events_batch pays only the host unpack (measured:
        steady-state 133 -> ~105 ms/batch on the 64 x 60 s Bell202
        loopback — the link leg was the only unhidden cost left)."""
        out, b, compact = handle
        leaves = (out[0],) if compact else (out[0], out[1])
        for x in leaves:
            fn = getattr(x, "copy_to_host_async", None)
            if fn is not None:
                fn()
        return handle

    def collect_events_batch(self, handle):
        """Blocking half of run_events_batch: pull one dispatched batch's
        results over the link and unpack per-stream event tuples."""
        out, b, compact = handle
        return _collect_results(out, b, compact)

    def run_events_batch(self, sched_list, conf_threshold: float = 1.5,
                         conf_search_limit: float = 2.3):
        """sched_list: list of uint8 bit schedules (one per stream).
        Returns per-stream event tuples (see _collect_results)."""
        return self.collect_events_batch(self.dispatch_events_batch(
            sched_list, conf_threshold, conf_search_limit))

    def dispatch_events_chain(self, sched_lists, conf_threshold: float = 1.5,
                              conf_search_limit: float = 2.3):
        """Dispatch K equal-width batches as ONE device program (a
        lax.scan over stacked schedules).  Each fn() call on this
        harness pays ~25 ms of fixed per-execute cost regardless of
        pipelining (measured: 12 back-to-back 64-stream dispatches on
        device-resident inputs run 142 ms/batch vs ~117 ms of in-jit
        device compute); chaining pays it once per K batches.  Results
        arrive together when the whole chain finishes — pipeline chains,
        not batches, for latency overlap."""
        import jax.numpy as jnp

        assert self.uniform, (
            "flat bit schedules need uniform bit segments; use "
            "run_events_frames_batch for fractional stop bits")
        K = len(sched_lists)
        assert K >= 2, (
            "dispatch_events_chain needs >= 2 sub-batches (the chained "
            "program scans a leading K axis); use dispatch_events_batch "
            "for a single batch")
        batch = len(sched_lists[0])
        assert all(len(s) == batch for s in sched_lists), \
            "chained batches must be equal width"
        b_real = [[len(s) for s in scheds] for scheds in sched_lists]
        mx = max(max(r) for r in b_real)
        b_pad = _sched_pad(mx)
        bits = np.zeros((K, batch, b_pad), np.uint8)
        for k, scheds in enumerate(sched_lists):
            for i, s in enumerate(scheds):
                bits[k, i, :len(s)] = s
        bits_pk = np.packbits(bits, axis=2, bitorder="little")
        totals = np.asarray(
            [[n * self.bit_ns for n in r] for r in b_real], np.int32)
        fn, compact, use_mega = self._fn_for(b_pad, batch, chain=K)
        out = fn(
            jnp.asarray(bits_pk), jnp.asarray(totals),
            np.float32(conf_threshold), np.float32(conf_search_limit),
            zero_carry(batch))
        return out, K, batch, compact

    def prefetch_events_chain(self, handle):
        """Async device->host copy kick for a dispatched chain (same
        contract as prefetch_events_batch).  Wide chains prefetch only
        the small n array — collect_events_chain transfers the event
        log as a device-sliced prefix, so kicking a copy of the full
        [K, 8, batch, max_events] log would ship hundreds of MB the
        collect then ignores."""
        out, K, batch, compact = handle
        leaves = (out[0],) if compact else (out[1],)
        for x in leaves:
            fn = getattr(x, "copy_to_host_async", None)
            if fn is not None:
                fn()
        return handle

    def collect_events_chain(self, handle):
        """Blocking collect of a dispatched chain: K * batch per-stream
        event tuples, chain-major (sub-batch 0's streams first).  The
        stacked result arrays cross the link ONCE (per-k device slices
        would each pay a dispatch round trip); only the rare
        event-overflow path touches the device again."""
        out, K, batch, compact = handle
        res = []
        if compact:
            flat_all = np.asarray(out[0])
            for k in range(K):
                res.extend(_collect_results(
                    (flat_all[k], out[1][k]), batch, True))
            return res
        # Wide events: the stacked log is [K, 8, batch, max_events] and
        # max_events ~ t_total // min_advance — hundreds of MB for long
        # audio on the ~10-40 MB/s link.  Fetch the small n array first,
        # then transfer one device-sliced prefix (two round trips total
        # instead of a full-buffer copy).
        ev_dev, n_dev = out
        n_all = np.asarray(n_dev)                      # [K, batch] i32
        kmax = max(int(n_all.max(initial=0)), 1)
        ev_all = np.asarray(ev_dev[:, :, :, :kmax])    # [K, 8, batch, kmax]
        for k in range(K):
            res.extend(
                unpack_events(ev_all[k][:, i, :], int(n_all[k, i]))
                for i in range(batch))
        return res

    def run_events_chain(self, sched_lists, conf_threshold: float = 1.5,
                         conf_search_limit: float = 2.3):
        return self.collect_events_chain(self.dispatch_events_chain(
            sched_lists, conf_threshold, conf_search_limit))

    def run_events_frames_batch(self, frame_sched_list,
                                lead_trail: tuple = (2, 2),
                                conf_threshold: float = 1.5,
                                conf_search_limit: float = 2.3):
        """frame_sched_list: list of [F_i, n_data_bits] uint8 frame-bit
        arrays (tx_device.tx_frame_schedule rows).  Works for ANY
        nstopbits, fractional included — the synthesis path is
        device_synthesize_frames."""
        import jax.numpy as jnp

        f_real = [fb.shape[0] for fb in frame_sched_list]
        f_pad = ((max(f_real) + 511) // 512) * 512
        nd = self.cfg.n_data_bits
        bits = np.zeros((len(frame_sched_list), f_pad, nd), np.uint8)
        for i, fb in enumerate(frame_sched_list):
            bits[i, :fb.shape[0]] = fb
        totals = np.asarray(
            [lead_trail[0] * self.bit_ns + n * self.frame_len
             + lead_trail[1] * self.bit_ns for n in f_real], np.int32)
        fn, compact, use_mega = self._fn_for(
            f_pad, len(frame_sched_list), True, tuple(lead_trail))
        out = fn(
            jnp.asarray(bits), jnp.asarray(totals),
            np.float32(conf_threshold), np.float32(conf_search_limit),
            zero_carry(len(frame_sched_list)),
            jnp.asarray(f_real, np.int32))
        return _collect_results(out, len(frame_sched_list), compact)

    def run_events(self, sched_bits: np.ndarray, conf_threshold: float = 1.5,
                   conf_search_limit: float = 2.3):
        return self.run_events_batch(
            [sched_bits], conf_threshold, conf_search_limit)[0]


class DeviceReceiver:
    """Host wrapper: pads the stream, runs the compiled device receiver,
    returns the event list."""

    def __init__(self, cfg: ModemConfig, precision: str = "auto",
                 rx_one: bool = False, compact: str = "auto",
                 stop_on_overflow: bool = False):
        self.cfg = cfg
        self.key = device_rx_key(cfg, precision)
        self.rx_one = rx_one
        self.stop_on_overflow = stop_on_overflow
        if compact == "auto":
            self.compact = cfg.n_data_bits <= 8 and not stop_on_overflow
        else:
            self.compact = bool(compact)
        # one-shot decodes route to the Pallas megakernel on TPU (same
        # events/bytes, ~50x less in-loop dispatch); streaming (carry) and
        # wide/f64/huge-scan geometries stay on the XLA while_loop
        self._mega = None
        if self.compact:
            from .pallas_rx import (
                MegaReceiver,
                mega_default_on,
                mega_supported,
            )

            if mega_supported(self.key) and mega_default_on():
                self._mega = MegaReceiver(cfg, precision, rx_one)

    def run_events_batch(self, samples: np.ndarray, totals,
                         conf_threshold: float, conf_search_limit: float,
                         carry=None, finalize: bool = True,
                         in_encoding: str = None):
        """samples: [B, L] (int16, float32, or uint8 with in_encoding in
        U8_ENCODINGS); totals: [B] valid lengths.
        Returns (events, carry_out) where events is a list of per-stream
        tuples — (ev_type, ev_pay) or, in compact mode, (ev_type, ev_pay,
        byte_stream).  Pass carry_out back in (with finalize=False on all
        but the last segment) for streaming decode."""
        b, L = samples.shape
        totals = np.asarray(totals, np.int32)
        if self._mega is not None:
            # megakernel serves one-shot AND carried/segmented decodes
            # (round 3: streaming carry + finalize flag in the kernel)
            return self._mega.run_events_batch(
                samples, totals, conf_threshold, conf_search_limit,
                carry=carry, finalize=finalize, in_encoding=in_encoding)
        t_total = _round_up_pow2(
            int(totals.max(initial=0)) + self.cfg.nsamples_overscan + 1)
        geo = geometry_from_config(self.cfg)
        in_dtype = wire_dtype(samples, in_encoding)
        fn, max_events, _ = _build_device_rx(
            self.key, t_total, self.rx_one, in_dtype, finalize,
            self.compact, stop_on_overflow=self.stop_on_overflow)
        from .wirepack import parse_spec as _wp_parse

        if _wp_parse(in_dtype):
            # dpack rows pass through at the caller's capacity
            x = np.ascontiguousarray(samples)
        else:
            row = t_total + geo.halo
            x = alloc_wire((b, row), samples.dtype, in_encoding)
            x[:, :min(L, row)] = samples[:, :row]
        if carry is None:
            carry = zero_carry(b)
        out = fn(
            jnp.asarray(x), jnp.asarray(totals),
            np.float32(conf_threshold), np.float32(conf_search_limit),
            carry)
        carry_out = out[-1]
        events = _collect_results(out[:-1], b, self.compact)
        return events, {k: np.asarray(v) for k, v in carry_out.items()}

    def run_events(self, samples: np.ndarray, conf_threshold: float,
                   conf_search_limit: float):
        """Single-stream convenience wrapper."""
        events, _ = self.run_events_batch(
            samples[None, :], [len(samples)],
            conf_threshold, conf_search_limit)
        return events[0]


class PipelinedReceiver:
    """Single-stream decode with the host->device transfer overlapped
    against compute: a known-length stream is cut into fixed-size
    segments, segment k+1's transfer is issued while segment k decodes,
    and the state machine carries across segments on device.

    Uses the compact byte path when eligible; byte positions are
    per-segment, so run() yields one event tuple per segment — render
    them in order (codec/stderr state persists across render calls).

    The reference reads audio in half-buffer chunks interleaved with
    decode (src/minimodem.c:1144-1174); this is that overlap, done with
    async device transfers instead of blocking reads.

    The default segment is large (~175 s of 48 kHz audio): each device
    call carries a fixed dispatch overhead (~30 ms on the axon tunnel),
    so segmentation only pays off once per-segment work dwarfs it; the
    segment bound also caps device memory for arbitrarily long files.
    """

    def __init__(self, cfg: ModemConfig, precision: str = "auto",
                 rx_one: bool = False, segment_len: int = 1 << 21):
        from ..utils.cfloat import trunc_i

        self.cfg = cfg
        self.precision = precision
        self.rx_one = rx_one
        self.key = device_rx_key(cfg, precision)
        self.compact = cfg.n_data_bits <= 8
        geo = geometry_from_config(cfg, precision)
        self.geo = geo
        scan_w = trunc_i(cfg.nsamples_per_bit) + cfg.nsamples_overscan + 1
        # a non-final segment is scanned only while every score it reads
        # came from real samples (same rule as DeviceStreamReceiver)
        self._lookahead = geo.halo + scan_w
        # worst-case distance between the scan-total and the final scan
        # position: one full advance (frame + scan window)
        max_adv = cfg.frame_nsamples + scan_w
        self.overlap = self._lookahead + max_adv
        self.segment_len = max(segment_len,
                               4 * (self.overlap + cfg.expect_nsamples))
        self.step = self.segment_len - self.overlap

    def run(self, samples: np.ndarray, conf_threshold: float,
            conf_search_limit: float, in_encoding: str = None,
            wire_pack="auto"):
        """Yield per-segment event tuples — (ev_type, ev_pay) or
        (ev_type, ev_pay, byte_stream) in compact mode.

        wire_pack: lossless delta-bitpack wire transport for int16
        sources (ops/wirepack.py) — bit-identical decode on ~25-30%
        fewer wire bytes.  "auto" engages it only on multi-segment
        streams AND only when MINIMODEM_TPU_WIREPACK=1 (measured
        negative on this harness's ~60 MB/s tunnel — see
        wirepack.default_on); True forces packing everywhere, False
        forces the raw int16 wire."""
        import jax

        from . import wirepack

        n = len(samples)
        dp = None
        if (wire_pack and in_encoding is None
                and samples.dtype == np.int16
                and (wire_pack is True
                     or (n > self.segment_len and wirepack.default_on()))):
            dp = wirepack.choose_params(samples)

        one_shot = DeviceReceiver(self.cfg, self.precision, self.rx_one,
                                  self.compact)
        if n <= self.segment_len:
            wire = samples[None, :]
            if dp is not None:
                k, w = dp
                e_cap = wirepack.exc_capacity(
                    wirepack.count_exceptions(samples, k, w))
                # pack at the same pow2 bucket the RX builder uses for
                # t_total so streams of nearby lengths share one
                # executable (the shortfall decodes as held deltas,
                # masked past totals — the multi-segment final-segment
                # path, which packs every tail at segment_len)
                n_packed = _round_up_pow2(
                    n + self.cfg.nsamples_overscan + 1)
                wire = wirepack.pack(
                    samples, n_packed, k, w, e_cap).view(np.int16)[None, :]
                in_encoding = wirepack.spec_str(k, w, n_packed, e_cap)
            events, _ = one_shot.run_events_batch(
                wire, [n], conf_threshold, conf_search_limit,
                in_encoding=in_encoding)
            yield events[0]
            return

        if dp is not None:
            # every segment (incl. the tail) packs at n_packed =
            # segment_len so one layout serves both fns; the exception
            # capacity comes from segment 0 + headroom — denser later
            # segments fall back to the raw wire below
            k, w = dp
            e_cap = wirepack.exc_capacity(wirepack.count_exceptions(
                samples[:self.segment_len], k, w))
            dp = (k, w, self.segment_len, e_cap)
            in_encoding = wirepack.spec_str(*dp)
            in_dtype = in_encoding
        else:
            in_dtype = wire_dtype(samples, in_encoding)
        total_nf = self.segment_len - self._lookahead + self.cfg.expect_nsamples
        # non-final segments carry REAL lookahead samples past the scan
        # bound `total_nf` (up to segment_len); u8 wires must not
        # tail-mask them away (expand_wire's `extra`)
        u8x = (max(0, self.segment_len - total_nf)
               if (in_dtype in U8_ENCODINGS or dp is not None) else 0)
        t_total = _round_up_pow2(total_nf + self.cfg.nsamples_overscan + 1)
        thr = np.float32(conf_threshold)
        lim = np.float32(conf_search_limit)

        starts = []
        s = 0
        while s + self.segment_len < n:
            starts.append(s)
            s += self.step
        tail_start = s                                # tail in (overlap, seg]
        tail_total = n - tail_start
        t_total_f = _round_up_pow2(
            tail_total + self.cfg.nsamples_overscan + 1)

        # segments ride the megakernel when eligible (round 3: it takes
        # the streaming carry + finalize flag), else the XLA while_loop
        from .pallas_rx import mega_default_on, mega_supported

        use_mega = (self.compact and mega_supported(self.key)
                    and mega_default_on())
        if use_mega:
            from .pallas_rx import MegaReceiver, _mega_run_fn

            thr2 = np.asarray([conf_threshold, conf_search_limit],
                              np.float32)

            def build_fns(tok, extra):
                f, _, tx = _mega_run_fn(self.key, t_total, 1,
                                        self.rx_one, tok, False,
                                        u8_extra=extra)
                ff, _, txf = _mega_run_fn(self.key, t_total_f, 1,
                                          self.rx_one, tok, True)

                def disp(dev, totals, carry, final):
                    ci, cf = carry
                    return (ff if final else f)(dev, totals, thr2,
                                                ci, cf)

                return disp, tx, txf

            # pos lives in ci[:, 0]; the rebase stays ON DEVICE so the
            # carry never forces a host sync between segments
            step_vec = np.zeros((1, 8), np.int32)
            step_vec[0, 0] = self.step

            def collect(out):
                return _collect_results(out[:2], 1, True)

            def carry_of(out):
                return (out[2], out[3])

            def rebase(carry):
                ci, cf = carry
                return (ci - step_vec, cf)

            carry0 = MegaReceiver.carry_to_arrays(None, 1)
        else:
            def build_fns(tok, extra):
                f, _, _ = _build_device_rx(
                    self.key, t_total, self.rx_one, tok, False,
                    self.compact, u8_extra=extra)
                ff, _, _ = _build_device_rx(
                    self.key, t_total_f, self.rx_one, tok, True,
                    self.compact)

                def disp(dev, totals, carry, final):
                    return (ff if final else f)(dev, totals, thr, lim,
                                                carry)

                return disp, t_total, t_total_f

            def collect(out):
                return _collect_results(out[:-1], 1, self.compact)

            def carry_of(out):
                return out[-1]

            def rebase(carry):
                carry = dict(carry)
                carry["pos"] = carry["pos"] - np.int32(self.step)
                return carry

            carry0 = zero_carry(1)

        dispatch0, t_x, t_x_f = build_fns(in_dtype, u8x)
        # a dpack segment whose exception records exceed the stream's
        # capacity (set by segment 0 + headroom, wirepack.exc_capacity)
        # falls back to the raw int16 wire for that segment; the raw
        # fns share the carry format, built lazily on first need
        raw_cell = [dispatch0 if dp is None else None]

        def dispatch_for(raw):
            if not raw:
                return dispatch0
            if raw_cell[0] is None:
                raw_cell[0] = build_fns("int16", 0)[0]
            return raw_cell[0]

        geo = self.geo

        def prep_raw(seg, tt, raw_flag):
            x = alloc_wire((1, tt + geo.halo), samples.dtype,
                           None if dp is not None else in_encoding)
            m = min(len(seg), x.shape[1])
            x[0, :m] = seg[:m]
            return x, raw_flag

        def prep(seg, tt):
            """Host wire buffer for one segment (no device calls)."""
            if dp is None:
                return prep_raw(seg, tt, False)
            if len(seg) > tt + geo.halo:
                # clipped segment: the raw buffer zero-fills where the
                # packed hold-tail would survive the mask — keep parity
                return prep_raw(seg, tt, True)
            # pack the real samples at the shared layout; the
            # receiver's zero-extended payload reconstructs the zero
            # fill bit-exactly and masks past totals+extra
            # (wirepack.unpack_expand)
            try:
                buf = wirepack.pack(seg, dp[2], dp[0], dp[1], dp[3])
            except ValueError:              # denser content: raw wire
                return prep_raw(seg, tt, True)
            # upload as int16 (measured ~17% faster per byte than u8
            # on the tunnel); row_bytes is even by construction
            return buf.view(np.int16)[None, :], False

        totals_nf = np.asarray([total_nf], np.int32)
        totals_f = np.asarray([tail_total], np.int32)
        # segment table: (start, scored length arg, totals, final)
        segs = [(s0, t_x, totals_nf, False) for s0 in starts]
        segs.append((tail_start, t_x_f, totals_f, True))

        def prep_seg(j):
            s0, tt, _, final = segs[j]
            end = len(samples) if final else s0 + self.segment_len
            return prep(samples[s0:end], tt)

        def upload(fut):
            x, raw = fut.result()
            return jax.device_put(x), raw

        # Two-stage put-ahead, depth 2: the link-bound e2e path must
        # keep the tunnel busy through the d2h collect + host render
        # gap between dispatches (a single put-ahead leaves the link
        # idle while collect blocks), so uploads for segments i+1 AND
        # i+2 ride on segment i's decode + collection.  Host prep
        # (wirepack pack / buffer copy) runs on its OWN 2-worker pool:
        # the pack runs ~62 MB/s single-thread — the same order as the
        # tunnel — so prep must parallelize across segments or it
        # paces the pipeline; device_put stays on ONE worker so
        # uploads hit the link in segment order.
        from concurrent.futures import ThreadPoolExecutor

        AHEAD = 2
        prep_ex = ThreadPoolExecutor(max_workers=2)
        up_ex = ThreadPoolExecutor(max_workers=1)
        try:
            packq = [prep_ex.submit(prep_seg, j)
                     for j in range(min(AHEAD, len(segs)))]
            devq = [up_ex.submit(upload, f) for f in packq]
            carry = carry0
            for i, (_, _, totals_i, final) in enumerate(segs):
                dev, raw = devq[i].result()
                out = dispatch_for(raw)(dev, totals_i, carry, final)
                if not final:
                    # rebase the device position onto the next
                    # segment's origin (on device — no host sync)
                    carry = rebase(carry_of(out))
                if i + AHEAD < len(segs):
                    f = prep_ex.submit(prep_seg, i + AHEAD)
                    devq.append(up_ex.submit(upload, f))
                devq[i] = None              # release the device buffer
                yield collect(out)[0]
        finally:
            up_ex.shutdown(wait=True)
            prep_ex.shutdown(wait=True)


class DeviceStreamReceiver:
    """Streaming decode: feed() audio segments of any size; events come out
    as they are decoded; finish() flushes the final stats.  State carries
    across segments on device (the analogue of the reference's sliding
    samplebuf, reference: src/minimodem.c:1144-1174, generalized to
    unbounded streams with bounded device memory)."""

    def __init__(self, cfg: ModemConfig, precision: str = "auto",
                 rx_one: bool = False, segment_len: int = 1 << 19,
                 conf_threshold: float = 1.5,
                 conf_search_limit: float = 2.3,
                 stop_on_overflow: bool = False,
                 initial_carry: dict = None):
        from ..utils.cfloat import trunc_i

        # compact events+bytes when eligible (round 3): byte positions
        # in compact records are per-segment, so feed() rebases the
        # CARRIER/NOCARRIER byte-position lanes onto the concatenated
        # byte stream it returns.  stop_on_overflow (-a) keeps the wide
        # path: its records carry scan positions instead
        self.rx = DeviceReceiver(cfg, precision, rx_one, compact="auto"
                                 if not stop_on_overflow else False,
                                 stop_on_overflow=stop_on_overflow)
        self.compact = self.rx.compact
        # with stop_on_overflow the wide records carry their scan
        # position in lane 5 (segment-relative); rebase it to the fed
        # stream's coordinates so -a can replay the samplebuf phase
        self._rebase_pos_lane = stop_on_overflow
        self.consumed_total = 0
        self.cfg = cfg
        geo = geometry_from_config(cfg, precision)
        # scanning a non-final segment must stop early enough that every
        # score it reads was computed from real (not yet-unseen) samples:
        # frame search reads offsets [pos, pos+W) whose windows extend
        # `halo` samples further
        scan_w = trunc_i(cfg.nsamples_per_bit) + cfg.nsamples_overscan + 1
        self._lookahead = geo.halo + scan_w
        self.segment_len = max(segment_len,
                               4 * (self._lookahead + cfg.expect_nsamples))
        self.thr = conf_threshold
        self.lim = conf_search_limit
        # a caller-provided carry seeds the state machine mid-stream
        # (-a re-arm: noconfidence counters persist across detection,
        # reference src/minimodem.c:1280-1297); its pos must be 0 in
        # this receiver's fed-stream coordinates
        self._carry = initial_carry
        self._buf = np.zeros(0, np.float32)
        self._done = False

    def _process(self, samples: np.ndarray, finalize: bool):
        if finalize:
            total = len(samples)
        else:
            total = max(
                0, len(samples) - self._lookahead + self.cfg.expect_nsamples)
            total = min(total, len(samples))
        events, carry = self.rx.run_events_batch(
            samples[None, :], [total], self.thr, self.lim,
            self._carry, finalize)
        self._carry = carry
        if self.compact:
            return events[0]                    # (et, ep, byte_stream)
        et, ep = events[0]
        if self._rebase_pos_lane and len(et):
            ep = ep.copy()
            ep[:, 5] = ep[:, 5] + np.uint32(self.consumed_total)
        return et, ep

    @property
    def stopped(self) -> bool:
        """True once a stop condition (rx_one / overflow) fired."""
        return self._carry is not None and bool(
            np.asarray(self._carry["stop"])[0])

    @property
    def abs_pos(self) -> int:
        """Current scan position in fed-stream coordinates."""
        if self._carry is None:
            return 0
        return self.consumed_total + int(np.asarray(self._carry["pos"])[0])

    @staticmethod
    def _concat_compact(parts):
        """Concatenate per-segment compact tuples, rebasing the
        byte-position lanes (CARRIER pay[0], NOCARRIER pay[4]) onto the
        concatenated byte stream so one render_events call consumes the
        whole thing."""
        evs_t, evs_p, evs_b = [], [], []
        off = 0
        for et, ep, by in parts:
            if len(et):
                ep = ep.copy()
                car = et == EV_CARRIER
                ep[car, 0] += np.uint32(off)
                ep[~car, 4] += np.uint32(off)
                evs_t.append(et)
                evs_p.append(ep)
            evs_b.append(np.asarray(by, np.uint8))
            off += len(by)
        by_all = (np.concatenate(evs_b) if evs_b
                  else np.zeros(0, np.uint8))
        if not evs_t:
            return (np.zeros(0, np.int32), np.zeros((0, 6), np.uint32),
                    by_all)
        return np.concatenate(evs_t), np.concatenate(evs_p), by_all

    def feed(self, samples: np.ndarray):
        """Returns the events decoded so far from complete segments:
        (ev_type, ev_pay) wide, or (ev_type, ev_pay, byte_stream) in
        compact mode."""
        assert not self._done
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, np.float32)])
        parts = []
        while len(self._buf) >= self.segment_len:
            seg = self._buf[:self.segment_len]
            parts.append(self._process(seg, finalize=False))
            # consume up to the carried position; keep the unscanned tail
            consumed = int(self._carry["pos"][0])
            if consumed <= 0:
                break
            self._buf = self._buf[consumed:]
            self._carry["pos"] = np.zeros_like(self._carry["pos"])
            self.consumed_total += consumed
        if self.compact:
            return self._concat_compact(parts)
        if parts:
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        return (np.zeros(0, np.int32), np.zeros((0, 6), np.uint32))

    def finish(self):
        """Process the remaining tail and flush final stats."""
        assert not self._done
        self._done = True
        return self._process(self._buf, finalize=True)
