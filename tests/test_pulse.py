"""PulseAudio backend (sigio/pulse.py) against a mock libpulse-simple:
sample-spec / buffer-attr construction, S16/FLOAT formats, read/write
frame accounting, drain+free on close, error paths, and a full
TX->decode loop through the fake device (reference behavior:
src/simpleaudio-pulse.c)."""

import ctypes

import numpy as np
import pytest

from minimodem_tpu.sigio import Direction, SampleFormat
from minimodem_tpu.sigio.pulse import (
    PA_SAMPLE_FLOAT32LE,
    PA_SAMPLE_S16LE,
    PA_STREAM_PLAYBACK,
    PA_STREAM_RECORD,
    PulseStream,
)


class FakePulse:
    """In-memory libpulse-simple: capture buffer for reads, list for
    writes, scriptable error injection."""

    def __init__(self, capture=None, fail_new=False, read_errors=0,
                 write_errors=0):
        self.capture = capture if capture is not None else np.zeros(0)
        self.rpos = 0
        self.fail_new = fail_new
        self.read_errors = read_errors
        self.write_errors = write_errors
        self.written = []
        self.drained = False
        self.freed = False

    def _itemsize(self):
        return 2 if self.ss.format == PA_SAMPLE_S16LE else 4

    # ---- API surface used by PulseStream ----
    def pa_simple_new(self, server, app, direction, dev, name, ssp, cmap,
                      attrp, errp):
        if self.fail_new:
            errp._obj.value = 13
            return None
        self.ss = type(ssp._obj)(format=ssp._obj.format,
                                 rate=ssp._obj.rate,
                                 channels=ssp._obj.channels)
        self.attr = type(attrp._obj)(
            maxlength=attrp._obj.maxlength, tlength=attrp._obj.tlength,
            prebuf=attrp._obj.prebuf, minreq=attrp._obj.minreq,
            fragsize=attrp._obj.fragsize)
        self.direction = direction
        self.app = app
        return 0xDEAD  # truthy handle

    def pa_simple_read(self, s, ptr, nbytes, errp):
        if self.read_errors:
            self.read_errors -= 1
            errp._obj.value = 7
            return -1
        nvals = nbytes // self._itemsize()
        avail = len(self.capture) - self.rpos
        n = min(nvals, avail)
        chunk = np.zeros(nvals, self.capture.dtype)
        chunk[:n] = self.capture[self.rpos:self.rpos + n]
        self.rpos += n
        raw = np.ascontiguousarray(chunk).tobytes()
        ctypes.memmove(ptr, raw, len(raw))
        return 0  # pa_simple_read returns 0 or -1, never a count

    def pa_simple_write(self, s, ptr, nbytes, errp):
        if self.write_errors:
            self.write_errors -= 1
            errp._obj.value = 9
            return -1
        raw = ctypes.string_at(ptr, nbytes)
        dt = np.int16 if self.ss.format == PA_SAMPLE_S16LE else np.float32
        self.written.append(np.frombuffer(raw, dt).copy())
        return 0

    def pa_simple_drain(self, s, errp):
        self.drained = True
        return 0

    def pa_simple_free(self, s):
        self.freed = True

    def pa_strerror(self, err):
        return b"mock pulse error"


@pytest.mark.parametrize("fmt,pafmt", [
    (SampleFormat.S16, PA_SAMPLE_S16LE),
    (SampleFormat.FLOAT, PA_SAMPLE_FLOAT32LE),
])
def test_open_sample_spec(fmt, pafmt):
    fake = FakePulse()
    st = PulseStream(None, Direction.PLAYBACK, fmt, 48000, 1, lib=fake)
    assert fake.ss.format == pafmt
    assert fake.ss.rate == 48000
    assert fake.ss.channels == 1
    assert fake.direction == PA_STREAM_PLAYBACK
    st.close()
    assert fake.drained and fake.freed


def test_buffer_attr_lowest_latency():
    # reference: src/simpleaudio-pulse.c:116-127 — fragsize=0, tlength=0,
    # everything else (especially prebuf) left at -1
    fake = FakePulse()
    PulseStream(None, Direction.RECORD, SampleFormat.FLOAT, 48000, 1,
                lib=fake)
    assert fake.direction == PA_STREAM_RECORD
    assert fake.attr.fragsize == 0
    assert fake.attr.tlength == 0
    assert fake.attr.prebuf == 0xFFFFFFFF
    assert fake.attr.maxlength == 0xFFFFFFFF
    assert fake.attr.minreq == 0xFFFFFFFF


def test_open_failure_raises():
    with pytest.raises(RuntimeError, match="Cannot create PulseAudio"):
        PulseStream(None, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                    lib=FakePulse(fail_new=True))


def test_read_returns_frames():
    cap = (np.arange(4000, dtype=np.float32) / 4000.0)
    fake = FakePulse(capture=cap)
    st = PulseStream(None, Direction.RECORD, SampleFormat.FLOAT, 48000, 1,
                     lib=fake)
    out = st.read(4000)
    assert np.array_equal(out, cap)


def test_read_error_returns_empty(capsys):
    fake = FakePulse(read_errors=1)
    st = PulseStream(None, Direction.RECORD, SampleFormat.FLOAT, 48000, 1,
                     lib=fake)
    out = st.read(100)
    assert out.size == 0
    assert "pa_simple_read" in capsys.readouterr().err


def test_write_error_returns_minus_one(capsys):
    fake = FakePulse(write_errors=1)
    st = PulseStream(None, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1,
                     lib=fake)
    assert st.write(np.zeros(10, np.float32)) == -1
    assert "pa_simple_write" in capsys.readouterr().err


def test_pulse_modem_loopback():
    """TX into the fake device, decode what it 'played'."""
    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.tx import Transmitter

    m = FskModem("1200")
    fake = FakePulse()
    st = PulseStream(None, Direction.PLAYBACK, SampleFormat.FLOAT,
                     48000, 1, lib=fake)
    txer = Transmitter(m.cfg, TxOptions(), get_codec("ascii8"),
                       SampleFormat.FLOAT)
    txer.transmit_bytes(b"pulse loopback", st)
    st.close()
    audio = np.concatenate(fake.written)
    assert m.demodulate(audio) == b"pulse loopback"


def test_open_stream_errors_without_libpulse(monkeypatch):
    import minimodem_tpu.sigio.pulse as P
    from minimodem_tpu.sigio import open_stream

    monkeypatch.setattr(P, "load_libpulse", lambda: None)
    with pytest.raises(RuntimeError, match="no system audio"):
        open_stream("pulseaudio", None, Direction.RECORD, SampleFormat.FLOAT,
                    48000, 1)


def test_sysdefault_priority(monkeypatch):
    """sysdefault resolves pulse > alsa > sndio (src/simpleaudio.c:83-93)."""
    import minimodem_tpu.sigio as S
    import minimodem_tpu.sigio.alsa  # noqa: F401 — bind S.alsa
    import minimodem_tpu.sigio.sndio  # noqa: F401 — bind S.sndio

    monkeypatch.setattr(S.pulse, "load_libpulse", lambda: object())
    monkeypatch.setattr(S.alsa, "load_libasound", lambda: object())
    assert S.system_backend() == "pulseaudio"
    monkeypatch.setattr(S.pulse, "load_libpulse", lambda: None)
    assert S.system_backend() == "alsa"
    monkeypatch.setattr(S.alsa, "load_libasound", lambda: None)
    monkeypatch.setattr(S.sndio, "load_libsndio", lambda: None)
    assert S.system_backend() is None
