"""Compact u8 wire encodings (u-law / A-law / PCM8): the device-side
expansion (ops/device_rx.normalize_input) must be bit-identical to the
host tables, and the CLI's raw-byte fast path must decode exactly like
the host-expanded float path.

The reference reads these subformats transparently via sf_readf_float
(src/simpleaudio-sndfile.c:46-70); shipping the raw bytes to the device
quarters the host-link traffic without changing a single sample value.
"""

import io

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.sigio.containers import (
    _ALAW_DEC,
    _ULAW_DEC,
    _alaw_encode,
    _ulaw_encode,
    expand_u8,
)

from .helpers import run_cli


@pytest.mark.parametrize("enc", ["ulaw", "alaw", "pcm8"])
def test_device_expansion_matches_host_tables(enc):
    """normalize_input on all 256 byte values == the host expansion."""
    import jax
    import jax.numpy as jnp

    from minimodem_tpu.ops.device_rx import normalize_input

    b = np.arange(256, dtype=np.uint8)
    want = expand_u8(b, enc)
    got = np.asarray(jax.jit(
        lambda x: normalize_input(x, enc))(jnp.asarray(b)))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_host_tables_match_g711_decode():
    np.testing.assert_array_equal(
        expand_u8(np.arange(256, dtype=np.uint8), "ulaw"),
        _ULAW_DEC.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(
        expand_u8(np.arange(256, dtype=np.uint8), "alaw"),
        _ALAW_DEC.astype(np.float32) / 32768.0)


def test_ulaw_encode_roundtrip():
    """Encoding any decode-table value must reproduce the byte — except
    u-law's negative zero 0x7F, which encoders canonicalize to 0xFF
    (both decode to 0)."""
    codes = np.arange(256, dtype=np.uint8)
    enc = _ulaw_encode(_ULAW_DEC[codes])
    keep = codes != 0x7F
    assert np.array_equal(enc[keep], codes[keep])
    assert enc[0x7F] == 0xFF
    assert np.array_equal(_alaw_encode(_ALAW_DEC[codes]), codes)


def _ulaw_wav(path: str, samples_f32: np.ndarray) -> None:
    """Minimal mono u-law WAV writer for the test fixtures."""
    import struct

    s16 = np.clip(np.rint(samples_f32 * 32768.0), -32768,
                  32767).astype(np.int16)
    data = _ulaw_encode(s16).tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 18, 7, 1, 48000, 48000, 1, 8)
    fmt += struct.pack("<H", 0)              # cbSize
    fact = struct.pack("<4sII", b"fact", 4, len(data))
    hdr = struct.pack("<4sI", b"data", len(data))
    riff = fmt + fact + hdr
    with open(path, "wb") as f:
        f.write(struct.pack("<4sI4s", b"RIFF", 4 + len(riff) + len(data),
                            b"WAVE") + riff + data)


def test_cli_ulaw_device_matches_host(tmp_path):
    """The CLI's raw-u8 device path and the host engine decode a u-law
    WAV to identical bytes AND identical stats lines."""
    payload = b"u8 wire parity check 0123456789\n"
    m = FskModem("1200")
    path = str(tmp_path / "u.wav")
    _ulaw_wav(path, m.modulate(payload))

    outs = {}
    for engine in ("device", "host"):
        code, out, err = run_cli(
            ["--rx", "--engine", engine, "--file", path, "1200"])
        assert code == 0, err
        outs[engine] = (out, err)
    assert outs["device"][0] == outs["host"][0] == payload
    assert outs["device"][1] == outs["host"][1]
    assert "### NOCARRIER" in outs["device"][1]


def test_receiver_in_encoding_api(tmp_path):
    """Library-level: Receiver.run with raw u-law bytes equals the
    float-expanded run event-for-event."""
    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.rx.engine import Receiver

    payload = b"encoding api"
    m = FskModem("1200")
    wav = m.modulate(payload)
    s16 = np.clip(np.rint(wav * 32768.0), -32768, 32767).astype(np.int16)
    raw = _ulaw_encode(s16)

    def run(samples, enc=None):
        sink, errs = io.BytesIO(), []
        rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                      sink.write, errs.append)
        rx.run(samples, in_encoding=enc)
        return sink.getvalue(), "".join(errs)

    got_raw = run(raw, "ulaw")
    got_float = run(expand_u8(raw, "ulaw"))
    assert got_raw == got_float
    assert got_raw[0] == payload
