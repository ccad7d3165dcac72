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


@pytest.mark.smoke
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


def test_pad_bytes_decode_to_silence():
    """Wire-buffer pad codewords are near-silence (u-law 0xFF and PCM8
    0x80 exact zeros; A-law's best is +-8 LSB) — and decision-exactness
    past a stream's total comes from the receivers' expand_wire tail
    mask, which zeroes every expanded sample >= total regardless of the
    pad value (see test_fuzz_parity.test_fuzz_u8_wire_parity[alaw])."""
    from minimodem_tpu.ops.device_rx import PAD_BYTE, alloc_wire

    for enc in ("ulaw", "pcm8"):
        buf = alloc_wire((4,), np.float32, enc)
        assert buf.dtype == np.uint8
        assert np.all(expand_u8(buf, enc) == 0.0), enc
    a = expand_u8(alloc_wire((4,), np.float32, "alaw"), "alaw")
    assert np.all(np.abs(a) <= 8.0 / 32768.0)
    assert alloc_wire((4,), np.int16).dtype == np.int16
    assert set(PAD_BYTE) == {"ulaw", "alaw", "pcm8"}


@pytest.mark.parametrize("dp,sp,enc", [(4, 1, "ulaw"), (2, 2, "ulaw"),
                                       (2, 2, "alaw")])
def test_sharded_service_u8_ingest(dp, sp, enc):
    """ShardedReceiver decodes raw u8 wire bytes on the virtual mesh
    to the same events as the float batch — including sp>1 (halo
    ppermute on the u8 wire) and A-law, whose padding past each
    stream's total has no zero codeword and relies on the shard-local
    tail mask."""
    import jax
    import pytest as _pytest

    from minimodem_tpu.ops.device_rx import PAD_BYTE
    from minimodem_tpu.parallel.service import ShardedReceiver
    from minimodem_tpu.parallel.sharding import make_mesh

    if len(jax.devices()) < dp * sp:
        _pytest.skip("needs the virtual CPU mesh")
    mesh = make_mesh(dp * sp, dp=dp, sp=sp)
    m = FskModem("1200")
    texts = [b"fleet ulaw zero", b"fu1!", b"fleet ulaw two"]
    enc_fn = _ulaw_encode if enc == "ulaw" else _alaw_encode
    streams, raws = [], []
    for t in texts:
        w = m.modulate(t)
        s16 = np.clip(np.rint(w * 32768.0), -32768, 32767).astype(np.int16)
        raws.append(enc_fn(s16))
        streams.append(expand_u8(raws[-1], enc))
    L = max(len(r) for r in raws)
    xr = np.full((len(raws), L), PAD_BYTE[enc], np.uint8)
    xf = np.zeros((len(raws), L), np.float32)
    for i, (r, s) in enumerate(zip(raws, streams)):
        xr[i, :len(r)] = r
        xf[i, :len(s)] = s
    totals = [len(r) for r in raws]

    svc = ShardedReceiver(m.cfg, mesh)
    ev_u8, stats_u8 = svc.run_events_batch(xr, totals, 1.5, 2.3,
                                           in_encoding=enc)
    ev_f, stats_f = svc.run_events_batch(xf, totals, 1.5, 2.3)
    assert stats_u8 == stats_f
    for tu, tf in zip(ev_u8, ev_f):
        for a, b in zip(tu, tf):
            np.testing.assert_array_equal(a, b)


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
