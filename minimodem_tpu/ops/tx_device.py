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

This covers uniform-bit framings (integer start/stop lengths).  Fractional
stop bits (Baudot 1.5) take the host synthesis path.

Used by the on-device loopback pipeline (TX -> RX without touching the
host link) and available as a standalone fast TX backend.
"""

from __future__ import annotations

import numpy as np

from ..config import ModemConfig


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
