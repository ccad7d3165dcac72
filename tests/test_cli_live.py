"""Live-audio CLI end-to-end: main() with no --file, driven through mock
client libraries (FakeAsound / FakeSndio).

Covers:
- the GNU optional-argument attached forms -A<dev> / -s<dev>
  (reference optstring ``s::A::``, src/minimodem.c:634), including
  clustered flags like -qA<dev>,
- the full _rx_live loop — streaming decode, -a live autodetect, and
  SIGINT-driven final stats (reference: src/minimodem.c:368-374,
  1135-1174),
- interactive TX through a live playback stream (src/minimodem.c:977-1012).
"""

import numpy as np
import pytest

from minimodem_tpu.cli import _presplit_optional_args
from minimodem_tpu.models.modem import FskModem

from .helpers import run_cli
from .test_alsa import FakeAsound
from .test_sndio import FakeSndio


# ---------------------------------------------------------------------
# _presplit_optional_args unit tests (reference: src/minimodem.c:634)
# ---------------------------------------------------------------------

def test_presplit_attached_alsa_device():
    assert _presplit_optional_args(["-Aplughw:1,0", "1200"]) == \
        ["--alsa=plughw:1,0", "1200"]


def test_presplit_bare_flags_never_consume_next_word():
    # GNU optional args must be ATTACHED: bare -A / --alsa followed by
    # a separate word leaves that word alone (it's the baudmode here)
    assert _presplit_optional_args(["-A", "300"]) == ["--alsa=", "300"]
    assert _presplit_optional_args(["-s", "300"]) == ["--sndio=", "300"]
    assert _presplit_optional_args(["--alsa", "300"]) == ["--alsa=", "300"]
    assert _presplit_optional_args(["--sndio", "300"]) == ["--sndio=", "300"]


def test_presplit_cluster():
    # flags before A stay a short cluster; the rest is the device
    assert _presplit_optional_args(["-qAplughw:0,3"]) == \
        ["-q", "--alsa=plughw:0,3"]
    assert _presplit_optional_args(["-tqsdev0"]) == ["-tq", "--sndio=dev0"]


def test_presplit_required_arg_wins():
    # -f takes a required argument: "-fAx" is file "Ax", and a separate
    # filename that merely looks like -A<dev> is copied verbatim
    assert _presplit_optional_args(["-fAx"]) == ["-fAx"]
    assert _presplit_optional_args(["-f", "-Afoo.wav"]) == \
        ["-f", "-Afoo.wav"]
    assert _presplit_optional_args(["-v", "-s"]) == ["-v", "-s"]


def test_presplit_long_required_arg_wins():
    # a long option with a required argument binds the NEXT word
    # verbatim (GNU getopt_long), even one shaped like -A<dev> — and
    # unambiguous abbreviations follow the same rules
    assert _presplit_optional_args(["--file", "-Adev.wav", "1200"]) == \
        ["--file", "-Adev.wav", "1200"]
    assert _presplit_optional_args(["--fil", "-sx"]) == ["--fil", "-sx"]
    assert _presplit_optional_args(["--volume", "-A"]) == \
        ["--volume", "-A"]
    # abbreviated bare optional-arg long never consumes the next word
    assert _presplit_optional_args(["--als", "300"]) == ["--alsa=", "300"]
    # flag-only longs don't shield the next word
    assert _presplit_optional_args(["--quiet", "-Adev"]) == \
        ["--quiet", "--alsa=dev"]


def test_presplit_stops_at_double_dash():
    assert _presplit_optional_args(["--", "-Adev"]) == ["--", "-Adev"]
    assert _presplit_optional_args(["--alsa=x", "-Ay"]) == \
        ["--alsa=x", "--alsa=y"]


def test_bad_attached_option_still_errors():
    # an unknown flag inside a cluster is still rejected
    code, _, err = run_cli(["-Zx", "1200"])
    assert code == 1
    assert "usage:" in err


# ---------------------------------------------------------------------
# live CLI sessions through mock client libraries
# ---------------------------------------------------------------------

def _install_alsa(monkeypatch, fake):
    import minimodem_tpu.sigio.alsa as A
    monkeypatch.setattr(A, "_lib", fake)
    monkeypatch.setattr(A, "_tried", True)


def _install_sndio(monkeypatch, fake):
    import minimodem_tpu.sigio.sndio as S
    monkeypatch.setattr(S, "_lib", fake)
    monkeypatch.setattr(S, "_tried", True)


def test_rx_live_attached_alsa_device(monkeypatch):
    """-Aplughw:1,0 (attached form) selects ALSA with that device and the
    live RX loop decodes the captured audio with final stats."""
    payload = b"live alsa rx"
    m = FskModem("1200")
    fake = FakeAsound(capture=m.modulate(payload))
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["--rx", "-Aplughw:1,0", "1200"])
    assert code == 0, err
    assert fake.device == b"plughw:1,0"
    assert out == payload
    assert "### NOCARRIER" in err
    assert fake.closed


def test_rx_live_clustered_alsa_device(monkeypatch):
    """-qA<dev> inside a flag cluster: quiet mode + ALSA device."""
    payload = b"cluster"
    m = FskModem("1200")
    fake = FakeAsound(capture=m.modulate(payload))
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["-qAplughw:0,3", "1200"])
    assert code == 0, err
    assert fake.device == b"plughw:0,3"
    assert out == payload
    assert "### NOCARRIER" not in err      # -q suppresses stats


def test_rx_live_sigint_final_stats(monkeypatch):
    """SIGINT (KeyboardInterrupt) mid-stream still flushes decoded bytes
    and the final NOCARRIER stats (reference: src/minimodem.c:368-374)."""

    class InterruptingAsound(FakeAsound):
        # drain the capture first (one short read), then SIGINT on the
        # next blocking read — like ^C on a quiet line after a burst
        drained = False

        def snd_pcm_readi(self, pcm, ptr, count):
            if len(self.capture) // self.channels - self.rpos <= 0:
                if self.drained:
                    raise KeyboardInterrupt
                self.drained = True
                return 0
            return super().snd_pcm_readi(pcm, ptr, count)

    payload = b"interrupted session"
    m = FskModem("1200")
    fake = InterruptingAsound(capture=m.modulate(payload))
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["--rx", "-A", "1200"])
    assert code == 0, err
    assert fake.device == b"default"
    assert out == payload
    assert "### NOCARRIER" in err


def test_rx_live_autodetect(monkeypatch):
    """-a on a live stream: autodetect + decode over the mock capture
    (reference: autodetect runs on any RECORD source,
    src/minimodem.c:1179-1220)."""
    payload = b"LIVE AUTODETECT"
    m = FskModem("300", sample_rate=24000)
    w = m.modulate(payload)
    stream = np.concatenate([np.zeros(30000, np.float32), w])
    fake = FakeAsound(capture=stream)
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["--rx", "-a", "-A", "-R", "24000", "300"])
    assert code == 0, err
    assert out == payload
    assert err.count("### CARRIER") == 1
    assert "### NOCARRIER" in err


def test_tx_live_attached_sndio_device(monkeypatch):
    """--tx -s<dev>: interactive TX through the mock sndio playback
    device; the 'played' S16 samples decode back to the stdin bytes."""
    fake = FakeSndio()
    _install_sndio(monkeypatch, fake)

    code, out, err = run_cli(["--tx", "-sdev0", "1200"],
                             stdin_bytes=b"sndio tx")
    assert code == 0, err
    assert fake.device == b"dev0"
    audio = np.concatenate(fake.written).astype(np.float32) / 32768.0
    m = FskModem("1200")
    assert m.demodulate(audio) == b"sndio tx"
    assert fake.stopped and fake.closed


def test_rx_live_alsa_missing_lib(monkeypatch):
    """-A on a host without libasound: one clear error, exit 1."""
    import minimodem_tpu.sigio.alsa as A
    monkeypatch.setattr(A, "_lib", None)
    monkeypatch.setattr(A, "_tried", True)

    code, out, err = run_cli(["--rx", "-Aplughw:1,0", "1200"])
    assert code == 1
    assert "alsa client library is not available" in err
