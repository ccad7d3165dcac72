"""Cross-engine parity: the python host engine, the device (XLA while_loop)
engine, and the C++ native engine must produce identical decoded bytes AND
identical protocol event lines for the same audio."""

import io

import numpy as np
import pytest

from minimodem_tpu.codecs import get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.rx.engine import Receiver

ENGINES = ["host", "device", "host-native"]


def _decode(m, samples, engine, codec_name="ascii8", **optkw):
    sink = io.BytesIO()
    events = []
    rx = Receiver(m.cfg, RxOptions(**optkw), get_codec(codec_name),
                  sink.write, events.append)
    rx.run(samples, engine=engine)
    return sink.getvalue(), "".join(events)


@pytest.mark.parametrize("mode,codec", [
    pytest.param("1200", "ascii8", marks=pytest.mark.smoke),
    ("300", "ascii8"),
    ("same", "ascii8"),
    ("rtty", "baudot"),
])
def test_engine_parity(mode, codec):
    m = FskModem(mode)
    if codec == "baudot":
        payload = b"PARITY CHECK 123 OK?\n"
    else:
        payload = bytes((33 + (i % 94)) for i in range(200)) + b"\n"
    samples = m.modulate(payload)
    results = {e: _decode(m, samples, e, codec) for e in ENGINES}
    outs = {r[0] for r in results.values()}
    evs = {r[1] for r in results.values()}
    assert len(outs) == 1, f"decoded bytes differ across engines: {results}"
    assert len(evs) == 1, f"event streams differ across engines: {evs}"
    assert results["host"][0] == payload


def test_engine_parity_with_noise():
    m = FskModem("1200")
    payload = bytes(range(33, 127)) * 3
    samples = m.modulate(payload)
    rng = np.random.default_rng(7)
    noisy = samples + rng.uniform(-0.4, 0.4, len(samples)).astype(np.float32)
    results = {e: _decode(m, noisy, e) for e in ENGINES}
    assert len({r[0] for r in results.values()}) == 1
    assert len({r[1] for r in results.values()}) == 1


def test_native_lib_builds():
    from minimodem_tpu import native
    lib = native.load()
    assert lib is not None, "C++ native library failed to build/load"
