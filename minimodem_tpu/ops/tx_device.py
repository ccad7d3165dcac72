"""Device-side FSK synthesis from a compact bit schedule.

The host expands a byte stream into the transmit *bit* schedule (leader,
sync preamble, start/data/stop bits, trailer — the keying logic of
reference src/minimodem.c:81-250) as one uint8 array; the device turns
bits into continuous-phase audio:

    phase[k]   = frac(n_mark[<k] * inc_mark + n_space[<k] * inc_space)
    sample[n]  = A * sin(2pi * (phase[bit(n)] + (n mod N)/wave_ns))

The per-bit phase is computed in closed form from exclusive prefix counts
of mark bits (exact integers), avoiding any sequential recurrence — fully
parallel, TPU-friendly, and phase-continuous to float64 accuracy.

The flat bit schedule covers uniform-bit framings (integer start/stop
lengths).  Fractional stop bits (Baudot 1.5 / TDD 2.0 with a truncated
sample count, reference src/minimodem.c:109-111 `bit_nsamples *
bfsk_nstopbits`) use the FRAME schedule path below: every frame has an
identical static segment template (start tone, n data bits, one stop
segment of trunc(bit_ns * nstopbits) samples), so per-frame base phases
come from one prefix sum and the sample expansion is a static gather —
no sequential recurrence, same closed-form-phase idea as the uniform
path.

Used by the on-device loopback pipeline (TX -> RX without touching the
host link) and available as a standalone fast TX backend.
"""

from __future__ import annotations

import numpy as np

from ..config import ModemConfig
from ..utils.cfloat import f32_mul, trunc_i


def uniform_bits_supported(cfg: ModemConfig) -> bool:
    """True when every keyed tone segment is exactly bit_nsamples_tx long."""
    return (float(cfg.nstopbits) == int(float(cfg.nstopbits))
            and cfg.nstartbits == int(cfg.nstartbits))


def tx_bit_schedule(data: bytes, cfg: ModemConfig, encoder,
                    leader_bits_len: int = 2,
                    trailer_bits_len: int = 2) -> np.ndarray:
    """Expand a byte stream into the transmit bit schedule (uint8: 1=mark
    tone, 0=space tone), mirroring the host transmitter's keying."""
    assert uniform_bits_supported(cfg), "fractional stop bits not uniform"
    nstop = int(float(cfg.nstopbits))
    start_bit = 1 if cfg.invert_start_stop else 0
    stop_bit = 1 - start_bit
    leader_bit = 0 if cfg.invert_start_stop else 1

    out: list = []

    def frame(word: int, msb_first: bool):
        out.extend([start_bit] * cfg.nstartbits)
        for i in range(cfg.n_data_bits):
            if msb_first:
                bit = (word >> (cfg.n_data_bits - i - 1)) & 1
            else:
                bit = (word >> i) & 1
            out.append(bit)
        out.extend([stop_bit] * nstop)

    # no leader tone when the frame has no start bits
    # (reference: src/minimodem.c:948-950)
    if cfg.nstartbits == 0:
        leader_bits_len = 0
    transmitting = 0
    for byte in data:
        words = encoder.encode(byte)
        if transmitting == 0:
            transmitting = 1
            out.extend([leader_bit] * leader_bits_len)
        if transmitting < 2:
            transmitting = 2
            for _ in range(cfg.do_tx_sync_bytes):
                frame(cfg.sync_byte, False)
        for w in words:
            frame(w, cfg.msb_first)
    if transmitting:
        out.extend([1] * trailer_bits_len)  # trailer is plain mark tone
    return np.asarray(out, np.uint8)


def synth_params(cfg: ModemConfig):
    """Static per-config synthesis constants."""
    rate = float(cfg.sample_rate)
    bit_ns = cfg.bit_nsamples_tx
    wave_mark = rate / float(cfg.mark_f)
    wave_space = rate / float(cfg.space_f)
    return dict(
        bit_ns=bit_ns,
        inv_wave_mark=1.0 / wave_mark,
        inv_wave_space=1.0 / wave_space,
        inc_mark=bit_ns / wave_mark,
        inc_space=bit_ns / wave_space,
    )


def tx_frame_schedule(data: bytes, cfg: ModemConfig, encoder,
                      leader_bits_len: int = 2,
                      trailer_bits_len: int = 2):
    """Expand a byte stream into per-frame data-bit rows for the frame
    synthesis path (any nstopbits, fractional included).

    -> (frame_bits [F, n_data_bits] uint8 in transmit order — msb
    resolution already applied, sync-preamble frames LSB-first exactly
    like the reference's literal 0 at src/minimodem.c:216-221 —
    leader_bits_len, trailer_bits_len)."""
    rows: list = []

    def frame(word: int, msb_first: bool):
        rows.append([
            (word >> (cfg.n_data_bits - i - 1)) & 1 if msb_first
            else (word >> i) & 1
            for i in range(cfg.n_data_bits)])

    if cfg.nstartbits == 0:
        leader_bits_len = 0  # reference: src/minimodem.c:948-950
    transmitting = 0
    for byte in data:
        words = encoder.encode(byte)
        if transmitting == 0:
            transmitting = 1
        if transmitting < 2:
            transmitting = 2
            for _ in range(cfg.do_tx_sync_bytes):
                frame(cfg.sync_byte, False)
        for w in words:
            frame(w, cfg.msb_first)
    if transmitting == 0:
        leader_bits_len = trailer_bits_len = 0
    return (np.asarray(rows, np.uint8).reshape(-1, cfg.n_data_bits),
            leader_bits_len, trailer_bits_len)


def frame_synth_params(cfg: ModemConfig):
    """Static frame-template constants: segment lengths/tones and the
    per-segment sample->segment maps."""
    bit_ns = cfg.bit_nsamples_tx
    nstart = int(cfg.nstartbits)
    ndata = cfg.n_data_bits
    stop_len = (trunc_i(f32_mul(bit_ns, cfg.nstopbits))
                if float(cfg.nstopbits) > 0 else 0)
    start_tone = 1 if cfg.invert_start_stop else 0
    seg_len = []
    seg_kind = []  # 0 = start const, 1..ndata = data bit, -1 = stop
    if nstart > 0:
        # the reference keys all start bits as ONE tone of
        # trunc(bit_ns * nstart) samples (minimodem.c:96-97)
        seg_len.append(trunc_i(f32_mul(bit_ns, float(nstart))))
        seg_kind.append(0)
    for i in range(ndata):
        seg_len.append(bit_ns)
        seg_kind.append(1 + i)
    if stop_len > 0:
        seg_len.append(stop_len)
        seg_kind.append(-1)
    seg_len = np.asarray(seg_len, np.int64)
    frame_len = int(seg_len.sum())
    seg_of = np.repeat(np.arange(len(seg_len), dtype=np.int32), seg_len)
    seg_start = np.concatenate([[0], np.cumsum(seg_len)[:-1]])
    off_in = (np.arange(frame_len, dtype=np.int64)
              - seg_start[seg_of]).astype(np.float32)
    rate = float(cfg.sample_rate)
    return dict(
        bit_ns=bit_ns, frame_len=frame_len,
        seg_len=seg_len, seg_kind=np.asarray(seg_kind, np.int32),
        seg_of=seg_of, off_in=off_in,
        start_tone=start_tone, stop_tone=1 - start_tone,
        inv_wave_mark=float(cfg.mark_f) / rate,
        inv_wave_space=float(cfg.space_f) / rate,
        leader_tone=0 if cfg.invert_start_stop else 1,
    )


def device_synthesize_frames(frame_bits, n_frames, cfg: ModemConfig,
                             leader_bits_len: int, trailer_bits_len: int,
                             amplitude: float = 1.0):
    """frame_bits: [F_pad, n_data_bits] uint8 on device (rows past
    n_frames are padding); n_frames: scalar i32 count of real frames.
    -> samples [leader + F_pad*frame_len + trailer] float32, with the
    mark trailer placed dynamically after the n_frames real frames
    (padded-frame audio beyond it is masked by the caller's `total`).

    Traced jax function (call inside jit)."""
    import jax.numpy as jnp

    p = frame_synth_params(cfg)
    F = frame_bits.shape[0]
    S = len(p["seg_len"])
    frame_len = p["frame_len"]
    iwm = np.float64(p["inv_wave_mark"])
    iws = np.float64(p["inv_wave_space"])

    # per-segment mark flags [F, S]: const for start/stop, data from bits
    kinds = p["seg_kind"]  # numpy [S]
    cols = []
    for k in kinds:
        if k == 0:
            cols.append(jnp.full((F,), p["start_tone"], jnp.float64))
        elif k == -1:
            cols.append(jnp.full((F,), p["stop_tone"], jnp.float64))
        else:
            cols.append(frame_bits[:, k - 1].astype(jnp.float64))
    is_mark = jnp.stack(cols, axis=1)                      # [F, S]
    seg_lens = jnp.asarray(p["seg_len"].astype(np.float64))  # [S]
    inv_wave = jnp.where(is_mark == 1, iwm, iws)           # [F, S]
    seg_turns = seg_lens[None, :] * inv_wave               # [F, S]

    # closed-form base phases: exclusive prefix over segments-in-frame
    # and over frames (f64; ~1e-11 turns/frame accumulation error)
    within = jnp.cumsum(seg_turns, axis=1) - seg_turns     # [F, S]
    per_frame = jnp.sum(seg_turns, axis=1)                 # [F]
    base = jnp.cumsum(per_frame) - per_frame               # [F]

    leader_len = leader_bits_len * p["bit_ns"]
    trailer_len = trailer_bits_len * p["bit_ns"]
    iw_leader = iwm if p["leader_tone"] == 1 else iws
    leader_phase = np.float64(leader_len) * iw_leader

    phase = leader_phase + base[:, None] + within          # [F, S]
    phase = phase - jnp.floor(phase)

    seg_of = jnp.asarray(p["seg_of"])                      # [frame_len]
    off_in = jnp.asarray(p["off_in"])                      # [frame_len]
    ph = jnp.take(phase.astype(jnp.float32), seg_of, axis=1)
    iw = jnp.take(inv_wave.astype(jnp.float32), seg_of, axis=1)
    turns = ph + off_in[None, :] * iw                      # [F, frame_len]
    frames_flat = jnp.sin(
        np.float32(2.0 * np.pi) * (turns - jnp.floor(turns))).reshape(-1)

    i_lead = jnp.arange(leader_len, dtype=jnp.float32)
    lead = jnp.sin(np.float32(2.0 * np.pi) * jnp.mod(
        i_lead * np.float32(iw_leader), np.float32(1.0)))

    # trailer: mark tone starting at the phase after the last REAL frame
    base_at_end = jnp.where(
        n_frames > 0,
        jnp.take(base + per_frame, jnp.maximum(n_frames - 1, 0)),
        jnp.float64(0.0))
    ph0 = leader_phase + base_at_end
    ph0 = jnp.float32(ph0 - jnp.floor(ph0))
    i_trail = jnp.arange(trailer_len, dtype=jnp.float32)
    trail_turns = ph0 + i_trail * np.float32(iwm)
    trail = jnp.sin(np.float32(2.0 * np.pi)
                    * (trail_turns - jnp.floor(trail_turns)))

    import jax

    out = jnp.concatenate([lead, frames_flat,
                           jnp.zeros((trailer_len,), jnp.float32)])
    out = jax.lax.dynamic_update_slice(
        out, trail, (leader_len + n_frames * frame_len,))
    return np.float32(amplitude) * out


def device_synthesize(bits, cfg: ModemConfig, amplitude: float = 1.0):
    """bits: [B] uint8 on device -> samples [B * bit_ns] float32.

    Traced jax function (call inside jit)."""
    import jax.numpy as jnp

    p = synth_params(cfg)
    bit_ns = p["bit_ns"]
    b = bits.astype(jnp.float64)
    # exclusive prefix counts of mark/space bits -> exact phase
    csum = jnp.cumsum(b)
    n_mark_excl = csum - b
    idx = jnp.arange(bits.shape[0], dtype=jnp.float64)
    n_space_excl = idx - n_mark_excl
    phase = (n_mark_excl * np.float64(p["inc_mark"])
             + n_space_excl * np.float64(p["inc_space"]))
    phase = phase - jnp.floor(phase)

    # per-sample phase within a bit stays < ~5 turns; float32 is plenty
    # (the per-bit base phase above is exact via integer prefix counts)
    phase32 = phase.astype(jnp.float32)
    inv_wave = jnp.where(bits == 1,
                         np.float32(p["inv_wave_mark"]),
                         np.float32(p["inv_wave_space"]))
    i = jnp.arange(bit_ns, dtype=jnp.float32)
    turns = phase32[:, None] + i[None, :] * inv_wave[:, None]
    frac = turns - jnp.floor(turns)
    samples = jnp.sin(np.float32(2.0 * np.pi) * frac)
    return (np.float32(amplitude) * samples).reshape(-1)
