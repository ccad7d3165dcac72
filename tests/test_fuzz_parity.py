"""Randomized-geometry engine-parity fuzz: seeded random Bell-like
configs (rate / sample rate / mark / space / data bits / stop bits) must
produce identical decoded bytes AND identical protocol event lines from
all three RX engines (python host, XLA device, C++ native), clean and
under noise.

The preset suites pin parity at the reference's own operating points;
this net covers the C-float32 geometry derivation (utils/cfloat.py,
reference: src/minimodem.c:900-934 and src/fsk.c:57-104) across the
space of baudmodes a user can reach with `-M/-S/--stopbits {numeric}`.
Parity must hold even where the geometry decodes garbage — the engines
must agree on the garbage."""

import io

import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import RxOptions, TxOptions
from minimodem_tpu.models.presets import Preset, _finish
from minimodem_tpu.config import ModemConfig
from minimodem_tpu.ops.tx import Transmitter
from minimodem_tpu.rx.engine import Receiver
from minimodem_tpu.sigio import SampleFormat
from minimodem_tpu.utils.cfloat import f32

ENGINES = ["host", "device", "host-native"]


def _random_cfg(rng):
    sr = int(rng.choice([9600, 16000, 22050, 44100, 48000]))
    # keep samples/bit in a sane band so tests stay fast and the
    # filter sizes stay representative
    rate = float(np.round(rng.uniform(sr / 70.0, sr / 9.0), 2))
    mark = float(np.round(rng.uniform(500.0, sr / 2.0 - 900.0), 1))
    shift = float(np.round(rng.uniform(0.4, 1.8) * rate, 1))
    space = mark + shift if rng.random() < 0.5 else max(
        400.0, mark - shift)
    nd = int(rng.choice([7, 8]))
    stop = float(rng.choice([1.0, 1.5, 2.0]))
    cfg = ModemConfig(sample_rate=sr, data_rate=f32(rate),
                      n_data_bits=nd, mark_f=f32(mark),
                      space_f=f32(space))
    return _finish(cfg, rate, 1, stop), dict(
        sr=sr, rate=rate, mark=mark, space=space, nd=nd, stop=stop)


def _modulate(cfg, payload):
    txer = Transmitter(cfg, TxOptions(), get_codec("ascii8"),
                       SampleFormat.FLOAT, "numpy")
    for b in payload:
        txer.send(b)
    txer.finish()
    return txer.drain(None)


def _decode(cfg, samples, engine):
    sink = io.BytesIO()
    events = []
    rx = Receiver(cfg, RxOptions(), get_codec("ascii8"),
                  sink.write, events.append)
    rx.run(samples, engine=engine)
    return sink.getvalue(), "".join(events)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_engine_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    cfg, desc = _random_cfg(rng)
    nbytes = int(rng.integers(24, 96))
    payload = bytes(int(b) for b in rng.integers(33, 127, nbytes))
    samples = np.asarray(_modulate(cfg, payload), np.float32)
    if seed % 2 == 1:   # half the cases decode through noise
        samples = samples + rng.uniform(
            -0.3, 0.3, len(samples)).astype(np.float32)

    results = {e: _decode(cfg, samples, e) for e in ENGINES}
    outs = {r[0] for r in results.values()}
    evs = {r[1] for r in results.values()}
    assert len(outs) == 1, (
        f"decoded bytes differ across engines for {desc}: "
        f"{ {e: r[0][:40] for e, r in results.items()} }")
    assert len(evs) == 1, (
        f"event streams differ across engines for {desc}: {evs}")
    # clean runs must actually decode their payload (guards against a
    # fuzz space where every case degenerates to agreeing on nothing)
    if seed % 2 == 0:
        assert results["host"][0] == payload, desc


@pytest.mark.parametrize("enc", ["ulaw", "alaw", "pcm8"])
@pytest.mark.parametrize("seed", range(4))
def test_fuzz_u8_wire_parity(seed, enc):
    """Raw u8 wire decode (device-side G.711/PCM8 expansion) must equal
    the host-expanded float decode across random geometries — bytes AND
    event lines, clean and noisy-quantized.  A-law is the hard case: it
    has no exact-zero codeword, so parity past end-of-stream depends on
    the receiver's expand_wire tail mask (ops/device_rx.py)."""
    from minimodem_tpu.sigio.containers import (
        _alaw_encode, _ulaw_encode, expand_u8)

    rng = np.random.default_rng(7000 + seed)
    cfg, desc = _random_cfg(rng)
    nbytes = int(rng.integers(24, 64))
    payload = bytes(int(b) for b in rng.integers(33, 127, nbytes))
    samples = np.asarray(_modulate(cfg, payload), np.float32)
    if seed % 2 == 1:
        samples = samples + rng.uniform(
            -0.2, 0.2, len(samples)).astype(np.float32)
    s16 = np.clip(np.rint(samples * 32768.0), -32768,
                  32767).astype(np.int16)
    if enc == "ulaw":
        raw = _ulaw_encode(s16)
    elif enc == "alaw":
        raw = _alaw_encode(s16)
    else:
        raw = ((s16.astype(np.int32) >> 8) + 128).astype(np.uint8)

    def run(x, e=None):
        sink, events = io.BytesIO(), []
        rx = Receiver(cfg, RxOptions(), get_codec("ascii8"),
                      sink.write, events.append)
        rx.run(x, engine="device", in_encoding=e)
        return sink.getvalue(), "".join(events)

    got_u8 = run(raw, enc)
    got_f = run(expand_u8(raw, enc))
    # the invariant is WIRE parity: raw bytes expanded on device must
    # decode exactly like the host-expanded floats.  (Payload equality
    # is NOT asserted: G.711 is lossy, and a random near-Nyquist
    # geometry can legitimately lose frames to quantization noise.)
    assert got_u8 == got_f, (desc, got_u8[0][:40], got_f[0][:40])
    if seed % 2 == 0:      # clean runs still demodulate a carrier
        assert len(got_u8[0]) > 0, desc
