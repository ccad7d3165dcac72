"""sndio backend (sigio/sndio.py) against a mock libsndio: par
construction (S16 native-endian, xrun=SIO_IGNORE), the FLOAT rejection
the reference leaves unimplemented, read/write byte accounting,
stop+close, and a full TX->decode loop through the fake device
(reference behavior: src/simpleaudio-sndio.c)."""

import ctypes

import numpy as np
import pytest

from minimodem_tpu.sigio import Direction, SampleFormat
from minimodem_tpu.sigio.sndio import (
    SIO_DEVANY,
    SIO_IGNORE,
    SIO_LE_NATIVE,
    SIO_PLAY,
    SIO_REC,
    SndioStream,
    sio_bps,
)


class FakeSndio:
    """In-memory libsndio: capture buffer for reads, list for writes."""

    def __init__(self, capture=None, fail_open=False, fail_setpar=False,
                 fail_start=False):
        self.capture = capture if capture is not None else np.zeros(0)
        self.rpos = 0
        self.fail_open = fail_open
        self.fail_setpar = fail_setpar
        self.fail_start = fail_start
        self.written = []
        self.started = False
        self.stopped = False
        self.closed = False

    # ---- API surface used by SndioStream ----
    def sio_open(self, device, mode, nbio):
        if self.fail_open:
            return None
        self.device = device
        self.mode = mode
        self.nbio = nbio
        return 0xBEEF  # truthy handle

    def sio_initpar(self, parp):
        p = parp._obj
        for name, _ in p._fields_:
            if name != "_pad":
                setattr(p, name, 0xFFFFFFFF)
        p._magic = 0xD1DCA4E  # as the real sio_initpar stamps it

    def sio_setpar(self, hdl, parp):
        if self.fail_setpar:
            return 0
        p = parp._obj
        self.par = {name: getattr(p, name) for name, _ in p._fields_
                    if name != "_pad"}
        return 1

    def sio_start(self, hdl):
        if self.fail_start:
            return 0
        self.started = True
        return 1

    def sio_read(self, hdl, ptr, nbytes):
        nvals = nbytes // 2
        avail = len(self.capture) - self.rpos
        n = min(nvals, avail)
        chunk = np.ascontiguousarray(self.capture[self.rpos:self.rpos + n],
                                     np.int16)
        self.rpos += n
        raw = chunk.tobytes()
        ctypes.memmove(ptr, raw, len(raw))
        return len(raw)

    def sio_write(self, hdl, ptr, nbytes):
        raw = ctypes.string_at(ptr, nbytes)
        self.written.append(np.frombuffer(raw, np.int16).copy())
        return nbytes

    def sio_stop(self, hdl):
        self.stopped = True
        return 1

    def sio_close(self, hdl):
        self.closed = True


def test_open_par():
    # reference: src/simpleaudio-sndio.c:84-111
    fake = FakeSndio()
    st = SndioStream(None, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                     lib=fake)
    assert fake.device == SIO_DEVANY
    assert fake.mode == SIO_PLAY
    assert fake.nbio == 0
    assert fake.par["bits"] == 16
    assert fake.par["bps"] == sio_bps(16) == 2
    assert fake.par["sig"] == 1
    assert fake.par["le"] == SIO_LE_NATIVE
    assert fake.par["rate"] == 48000
    assert fake.par["xrun"] == SIO_IGNORE
    assert fake.par["rchan"] == 1 and fake.par["pchan"] == 1
    assert fake.started
    st.close()
    assert fake.stopped and fake.closed


def test_record_direction_and_device_passthrough():
    fake = FakeSndio()
    SndioStream("rsnd/0", Direction.RECORD, SampleFormat.S16, 44100, 1,
                lib=fake)
    assert fake.device == b"rsnd/0"
    assert fake.mode == SIO_REC


def test_float_unsupported():
    # reference: src/simpleaudio-sndio.c:96-98 (FIXME + assert(0))
    with pytest.raises(RuntimeError, match="S16"):
        SndioStream(None, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1,
                    lib=FakeSndio())


def test_open_failures():
    with pytest.raises(RuntimeError, match="Cannot open"):
        SndioStream(None, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                    lib=FakeSndio(fail_open=True))
    with pytest.raises(RuntimeError, match="sio_setpar"):
        SndioStream(None, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                    lib=FakeSndio(fail_setpar=True))
    with pytest.raises(RuntimeError, match="sio_start"):
        SndioStream(None, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                    lib=FakeSndio(fail_start=True))


def test_read_frames():
    cap = (np.arange(4000) - 2000).astype(np.int16)
    fake = FakeSndio(capture=cap)
    st = SndioStream(None, Direction.RECORD, SampleFormat.S16, 48000, 1,
                     lib=fake)
    out = st.read(4000)
    assert out.dtype == np.int16
    assert np.array_equal(out, cap)
    # blocking sio_read returns short only at EOF
    assert st.read(100).size == 0


def test_sndio_modem_loopback():
    """TX into the fake device (S16), decode what it 'played'."""
    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.tx import Transmitter

    m = FskModem("1200")
    fake = FakeSndio()
    st = SndioStream(None, Direction.PLAYBACK, SampleFormat.S16,
                     48000, 1, lib=fake)
    txer = Transmitter(m.cfg, TxOptions(), get_codec("ascii8"),
                       SampleFormat.S16)
    txer.transmit_bytes(b"sndio loopback", st)
    st.close()
    audio = np.concatenate(fake.written)  # int16, decoded as-is
    assert m.demodulate(audio) == b"sndio loopback"


def test_open_stream_errors_without_libsndio(monkeypatch):
    import minimodem_tpu.sigio.sndio as Sn
    from minimodem_tpu.sigio import open_stream

    monkeypatch.setattr(Sn, "load_libsndio", lambda: None)
    with pytest.raises(RuntimeError, match="no system audio"):
        open_stream("sndio", None, Direction.RECORD, SampleFormat.S16,
                    48000, 1)
