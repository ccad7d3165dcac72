"""On-device loopback pipeline (TX bit schedule -> synth -> decode on
device): must reproduce the same bytes as host-TX + device-RX."""

import io

import pytest

from minimodem_tpu.codecs import Ascii8Codec, get_codec
from minimodem_tpu.config import RxOptions
from minimodem_tpu.models.modem import FskModem
from minimodem_tpu.ops.device_rx import DeviceLoopback
from minimodem_tpu.ops.tx_device import tx_bit_schedule, uniform_bits_supported
from minimodem_tpu.rx.engine import Receiver


@pytest.mark.parametrize("mode", ["1200", "300", "same"])
def test_loopback_roundtrip(mode):
    m = FskModem(mode)
    assert uniform_bits_supported(m.cfg)
    payload = bytes((33 + (i % 94)) for i in range(120)) + b"\n"

    sched = tx_bit_schedule(payload, m.cfg, Ascii8Codec())
    lb = DeviceLoopback(m.cfg)
    result = lb.run_events(sched)

    sink = io.BytesIO()
    events = []
    rx = Receiver(m.cfg, RxOptions(), get_codec("ascii8"),
                  sink.write, events.append)
    rx.render_events(*result)
    assert sink.getvalue() == payload, "".join(events)


def test_bit_schedule_matches_host_tx():
    """The device bit schedule expanded to tones must equal the host
    transmitter's schedule for uniform framings."""
    import numpy as np

    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.ops.tx import Transmitter
    from minimodem_tpu.sigio import SampleFormat

    m = FskModem("1200")
    payload = b"schedule equivalence"
    sched = tx_bit_schedule(payload, m.cfg, Ascii8Codec())

    tx = Transmitter(m.cfg, TxOptions(), Ascii8Codec(), SampleFormat.FLOAT)
    for b in payload:
        tx.send(b)
    tx.finish()
    tones = tx.gen.schedule
    bit_ns = m.cfg.bit_nsamples_tx
    host_bits = []
    for seg in tones:
        assert seg.nsamples % bit_ns == 0
        host_bits.extend(
            [1 if float(seg.freq) == float(m.cfg.mark_f) else 0]
            * (seg.nsamples // bit_ns))
    assert np.array_equal(np.asarray(host_bits, np.uint8), sched)
