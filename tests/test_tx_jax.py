"""The JAX (device) TX synthesis backend must match the NumPy host path
bit-for-bit for float output and S16 LUT output (same LUT tables, same
phase schedule)."""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem


@pytest.mark.parametrize("lut", [4096, 16])
def test_jax_synth_matches_numpy_lut(lut):
    from minimodem_tpu.codecs import Ascii8Codec
    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.ops.tx import Transmitter
    from minimodem_tpu.sigio import SampleFormat

    m = FskModem("1200")
    payload = b"jax synth parity \x00\xff"

    outs = {}
    for backend in ("numpy", "jax"):
        tx = Transmitter(m.cfg, TxOptions(sin_table_len=lut), Ascii8Codec(),
                         SampleFormat.S16, synth_backend=backend)
        for b in payload:
            tx.send(b)
        tx.finish()
        outs[backend] = tx.drain(None)
    # LUT table lookups are exact integer gathers: bit-identical
    assert np.array_equal(outs["numpy"], outs["jax"])


def test_jax_synth_sinf_close():
    """Direct-sin path: device sin differs by ulps from the host float64
    path; the signal must still decode byte-exact."""
    from minimodem_tpu.codecs import Ascii8Codec
    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.ops.tx import Transmitter
    from minimodem_tpu.sigio import SampleFormat

    m = FskModem("1200")
    payload = b"no-lut jax synthesis"
    tx = Transmitter(m.cfg, TxOptions(sin_table_len=0), Ascii8Codec(),
                     SampleFormat.FLOAT, synth_backend="jax")
    for b in payload:
        tx.send(b)
    tx.finish()
    wav = tx.drain(None)
    assert m.demodulate(np.asarray(wav)) == payload
