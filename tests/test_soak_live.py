"""Hours-scale mock-clock soak of the live RX paths.

The live pulse/alsa/sndio backends cannot be hardware-validated in this
image (no audio devices); `tests/test_cli_live.py` covers single
sessions through mock client libraries.  This soak drives the SAME full
CLI paths — `cli._rx_live` (streaming decode + final stats, reference:
src/minimodem.c:368-374, 1135-1174) and `-a` live autodetect
(src/minimodem.c:1179-1220) — through a procedurally generated capture
stream spanning hours of VIRTUAL audio and thousands of independent
carrier sessions, with no real-time sleeps (the mock's reads return
instantly, so 2 h of audio soaks in a few wall-minutes on CPU jax).

Checks per soak:
- every decoded byte of every session, in order (state carry across
  segment boundaries never corrupts a session),
- exactly one CARRIER and one NOCARRIER stats line per session, with
  the per-session ndata= fields summing to the total payload bytes
  (stats accumulation never drifts),
- resident memory growth between the 10%-point and the end of the soak
  stays bounded (no per-session leak: a samplebuf that retained audio
  would grow by ~1.4 GB over a 2 h soak).

Run the full-size soak (the CI slow lane):
    python -m pytest tests/test_soak_live.py -q
Size it down/up with MINIMODEM_SOAK_SESSIONS (default 2500).
"""

import ctypes
import os
import re

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem

from .helpers import run_cli
from .test_alsa import FakeAsound

SESSIONS = int(os.environ.get("MINIMODEM_SOAK_SESSIONS", "2500"))
RSS_BOUND_MB = 256.0


def _rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


class SessionAsound(FakeAsound):
    """FakeAsound whose capture is a lazy generator of audio blocks:
    only a rolling read-ahead buffer is resident, so the soak's virtual
    hours never materialize in host memory (what a real blocking
    `snd_pcm_readi` loop looks like to the CLI, minus the waiting)."""

    def __init__(self, blocks):
        super().__init__(capture=np.zeros(0, np.float32))
        self._it = iter(blocks)
        self._buf = np.zeros(0, np.float32)
        self._off = 0

    def snd_pcm_readi(self, pcm, ptr, count):
        while len(self._buf) - self._off < count:
            nxt = next(self._it, None)
            if nxt is None:
                break
            self._buf = np.concatenate([self._buf[self._off:], nxt])
            self._off = 0
        n = min(count, len(self._buf) - self._off)
        if n == 0:
            return 0
        raw = np.ascontiguousarray(
            self._buf[self._off:self._off + n], np.float32).tobytes()
        ctypes.memmove(ptr, raw, len(raw))
        self._off += n
        return n


def _install_alsa(monkeypatch, fake):
    import minimodem_tpu.sigio.alsa as A
    monkeypatch.setattr(A, "_lib", fake)
    monkeypatch.setattr(A, "_tried", True)


def _payload(i: int) -> bytes:
    return b"SOAK %06d THE QUICK BROWN FOX JUMPS 0123456789\n" % i


@pytest.mark.soak
def test_rx_live_soak_thousands_of_sessions(monkeypatch):
    m = FskModem("1200")
    rng = np.random.default_rng(0x50AC)
    rss = {}

    def blocks():
        for i in range(SESSIONS):
            if i == max(1, SESSIONS // 10):
                rss["warm"] = _rss_mb()
            yield np.zeros(int(rng.uniform(0.4, 1.8) * 48000), np.float32)
            yield m.modulate(_payload(i))
        yield np.zeros(48000, np.float32)
        rss["end"] = _rss_mb()

    fake = SessionAsound(blocks())
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["--rx", "-A", "1200"])
    assert code == 0, err[-2000:]
    expected = b"".join(_payload(i) for i in range(SESSIONS))
    assert out == expected
    assert err.count("### CARRIER") == SESSIONS
    ndata = [int(x) for x in re.findall(r"### NOCARRIER ndata=(\d+)", err)]
    assert len(ndata) == SESSIONS
    assert sum(ndata) == len(expected)
    growth = rss["end"] - rss["warm"]
    assert growth < RSS_BOUND_MB, (
        f"RSS grew {growth:.0f} MB between the 10% point "
        f"({rss['warm']:.0f}) and the end ({rss['end']:.0f}) "
        f"of a {SESSIONS}-session soak")


@pytest.mark.soak
def test_rx_live_autodetect_soak(monkeypatch):
    """-a live soak: every burst re-runs carrier autodetect from the
    samplebuf replay; sessions must neither merge nor vanish and the
    noconfidence carry across handoffs must not wedge detection."""
    n = max(10, SESSIONS // 12)
    m = FskModem("300", sample_rate=24000)
    rng = np.random.default_rng(0xA07D)
    rss = {}

    def blocks():
        for i in range(n):
            if i == max(1, n // 10):
                rss["warm"] = _rss_mb()
            yield np.zeros(int(rng.uniform(1.0, 2.5) * 24000), np.float32)
            yield m.modulate(_payload(i))
        yield np.zeros(48000, np.float32)
        rss["end"] = _rss_mb()

    fake = SessionAsound(blocks())
    _install_alsa(monkeypatch, fake)

    code, out, err = run_cli(["--rx", "-a", "-A", "-R", "24000", "300"])
    assert code == 0, err[-2000:]
    assert out == b"".join(_payload(i) for i in range(n))
    assert err.count("### CARRIER") == n
    assert err.count("### NOCARRIER") == n
    growth = rss["end"] - rss["warm"]
    assert growth < RSS_BOUND_MB, (
        f"RSS grew {growth:.0f} MB over a {n}-burst autodetect soak")
