"""ALSA backend (sigio/alsa.py) against a mock libasound: device
aliasing, S16/FLOAT params, the read overrun-recovery path, the write
recover-and-retry path, drain-on-close, and a full TX->decode loop
through the fake device (reference behavior: src/simpleaudio-alsa.c)."""

import ctypes
import io

import numpy as np
import pytest

from minimodem_tpu.sigio import Direction, SampleFormat
from minimodem_tpu.sigio.alsa import (
    EPIPE,
    SND_PCM_FORMAT_FLOAT_LE,
    SND_PCM_FORMAT_S16_LE,
    AlsaStream,
    resolve_device,
)


class FakeAsound:
    """In-memory libasound: capture buffer for reads, list for writes,
    scriptable error injection."""

    def __init__(self, capture=None, read_plan=None, write_plan=None):
        self.capture = capture if capture is not None else np.zeros(0)
        self.rpos = 0
        self.read_plan = list(read_plan or [])
        self.write_plan = list(write_plan or [])
        self.written = []
        self.prepared = 0
        self.recovered = 0
        self.drained = False
        self.closed = False

    def _itemsize(self):
        return 2 if self.fmt == SND_PCM_FORMAT_S16_LE else 4

    # ---- API surface used by AlsaStream ----
    def snd_pcm_open(self, pcmref, device, direction, mode):
        self.device = device
        self.direction = direction
        return 0

    def snd_pcm_set_params(self, pcm, fmt, access, ch, rate, resample,
                           latency):
        self.fmt, self.channels, self.rate = fmt, ch, rate
        return 0

    def snd_pcm_readi(self, pcm, ptr, count):
        if self.read_plan:
            ev = self.read_plan.pop(0)
            if ev < 0:
                return ev
            count = min(count, ev)
        avail = len(self.capture) // self.channels - self.rpos
        n = min(count, max(avail, 0))
        if n == 0:
            return 0
        chunk = self.capture[self.rpos * self.channels:
                             (self.rpos + n) * self.channels]
        raw = np.ascontiguousarray(chunk).tobytes()
        ctypes.memmove(ptr, raw, len(raw))
        self.rpos += n
        return n

    def snd_pcm_writei(self, pcm, ptr, count):
        if self.write_plan:
            ev = self.write_plan.pop(0)
            if ev < 0:
                return ev
            count = min(count, ev)
        raw = ctypes.string_at(ptr, count * self.channels * self._itemsize())
        dt = np.int16 if self.fmt == SND_PCM_FORMAT_S16_LE else np.float32
        self.written.append(np.frombuffer(raw, dt).copy())
        return count

    def snd_pcm_prepare(self, pcm):
        self.prepared += 1
        return 0

    def snd_pcm_recover(self, pcm, err, silent):
        self.recovered += 1
        return 0

    def snd_pcm_wait(self, pcm, ms):
        return 1

    def snd_pcm_drain(self, pcm):
        self.drained = True
        return 0

    def snd_pcm_close(self, pcm):
        self.closed = True
        return 0

    def snd_strerror(self, err):
        return b"mock error"


def test_device_aliasing():
    # reference: src/simpleaudio-alsa.c:116-127
    assert resolve_device(None) == b"default"
    assert resolve_device("plughw:1,0") == b"plughw:1,0"
    assert resolve_device("1,2") == b"plughw:1,2"
    assert resolve_device("2") == b"plughw:2,0"


@pytest.mark.parametrize("fmt,pcmfmt", [
    (SampleFormat.S16, SND_PCM_FORMAT_S16_LE),
    (SampleFormat.FLOAT, SND_PCM_FORMAT_FLOAT_LE),
])
def test_open_params(fmt, pcmfmt):
    fake = FakeAsound()
    st = AlsaStream(None, Direction.PLAYBACK, fmt, 48000, 1, lib=fake)
    assert fake.fmt == pcmfmt
    assert fake.rate == 48000
    st.close()
    assert fake.drained and fake.closed


def test_write_underrun_recovery():
    # reference: src/simpleaudio-alsa.c:76-86 (recover + retry once)
    fake = FakeAsound(write_plan=[-EPIPE])
    st = AlsaStream(None, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1,
                    lib=fake)
    data = np.linspace(-1, 1, 1000).astype(np.float32)
    assert st.write(data) == 1000
    assert fake.recovered == 1
    out = np.concatenate(fake.written)
    assert np.array_equal(out, data)


def test_read_overrun_recovery(capsys):
    # reference: src/simpleaudio-alsa.c:55-58 (prepare on -EPIPE, '#')
    cap = np.arange(4000, dtype=np.float32) / 4000.0
    fake = FakeAsound(capture=cap, read_plan=[1500, -EPIPE, 1500])
    st = AlsaStream(None, Direction.RECORD, SampleFormat.FLOAT, 48000, 1,
                    lib=fake)
    out = st.read(4000)
    assert fake.prepared == 1
    assert np.array_equal(out, cap)


def test_alsa_modem_loopback():
    """TX into the fake device, decode what it 'played'."""
    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import TxOptions
    from minimodem_tpu.models.modem import FskModem
    from minimodem_tpu.ops.tx import Transmitter

    m = FskModem("1200")
    fake = FakeAsound()
    st = AlsaStream(None, Direction.PLAYBACK, SampleFormat.FLOAT,
                    48000, 1, lib=fake)
    txer = Transmitter(m.cfg, TxOptions(), get_codec("ascii8"),
                       SampleFormat.FLOAT)
    txer.transmit_bytes(b"alsa loopback", st)
    st.close()
    audio = np.concatenate(fake.written)
    assert m.demodulate(audio) == b"alsa loopback"


def test_open_stream_errors_without_libasound(monkeypatch):
    import minimodem_tpu.sigio.alsa as A
    from minimodem_tpu.sigio import open_stream

    monkeypatch.setattr(A, "load_libasound", lambda: None)
    with pytest.raises(RuntimeError, match="no system audio"):
        open_stream("alsa", None, Direction.RECORD, SampleFormat.FLOAT,
                    48000, 1)
