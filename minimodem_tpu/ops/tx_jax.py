"""Device-side tone synthesis: one fused elementwise/gather kernel.

TPU analogue of the reference's per-sample synthesis loop
(reference: src/simple-tone-generator.c:124-160).  The host supplies the
per-sample phase ("turns") array; the device does LUT gather or sin()
evaluation, amplitude scaling, and integer rounding in one jitted graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = np.float32(np.float32(3.141592653589793) * np.float32(2.0))


def _lroundf(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


@functools.partial(jax.jit, static_argnames=("sin_table_len",))
def _synth_lut(turns, silent, table, *, sin_table_len):
    tf = (jnp.float32(sin_table_len) * turns + jnp.float32(0.5))
    # int64 like the NumPy path (ops/tx.py): int32 truncation would wrap
    # for very long single-tone segments
    idx = (jnp.trunc(tf).astype(jnp.int64) % sin_table_len).astype(
        jnp.int32)
    out = table[idx]
    zero = jnp.array(0, out.dtype)
    return jnp.where(silent, zero, out)


@functools.partial(jax.jit, static_argnames=("tone_mag", "is_s16", "mag_s"))
def _synth_sin(turns, silent, *, tone_mag, is_s16, mag_s):
    s = jnp.sin(_TWO_PI * turns)
    if is_s16:
        out = _lroundf(jnp.float32(mag_s) * s).astype(jnp.int16)
        zero = jnp.int16(0)
    else:
        out = (jnp.float32(tone_mag) * s).astype(jnp.float32)
        zero = jnp.float32(0.0)
    return jnp.where(silent, zero, out)


def synthesize_device(turns, silent, table_short, table_float,
                      sin_table_len: int, tone_mag: float, is_s16: bool):
    turns = jnp.asarray(turns, jnp.float32)
    silent = jnp.asarray(silent)
    if sin_table_len:
        table = jnp.asarray(table_short if is_s16 else table_float)
        return _synth_lut(turns, silent, table,
                          sin_table_len=sin_table_len)
    # mirror the reference's S16 magnitude clamp (src/simple-tone-generator.c:146-150)
    from .tx import _mag_s16
    mag_s = _mag_s16(np.float32(tone_mag))
    return _synth_sin(turns, silent, tone_mag=tone_mag, is_s16=is_s16,
                      mag_s=mag_s)
