"""Audio container breadth (sigio/containers.py + sigio/oggvorbis.py):
write/read roundtrips for every PCM-family container, deterministic
output, OGG Vorbis lossy roundtrip + modem loopback, and the clear
error for majors that stay unsupported.

Reference: libsndfile's 25-major extension table reached through
src/simpleaudio-sndfile.c:111-157."""

import os

import numpy as np
import pytest

from minimodem_tpu.sigio import Direction, SampleFormat
from minimodem_tpu.sigio.oggvorbis import load_libvorbis
from minimodem_tpu.sigio.wavfile import FileStream, read_all

PCM_EXTS = ["aiff", "aif", "caf", "w64", "rf64", "wavex", "nist",
            "ircam", "pvf", "htk", "avr", "voc", "svx", "mat4", "mat5",
            "paf", "sd2", "mpc", "sds", "xi"]

_rng = np.random.default_rng(7)
F32 = np.clip(_rng.standard_normal(4000) * 0.3, -0.999, 0.999) \
    .astype(np.float32)
S16 = (F32 * 32767).astype(np.int16)

needs_vorbis = pytest.mark.skipif(
    load_libvorbis() is None, reason="no libvorbis on this host")


@pytest.mark.parametrize("ext", PCM_EXTS)
@pytest.mark.parametrize("fmt", [SampleFormat.S16, SampleFormat.FLOAT])
def test_roundtrip(tmp_path, ext, fmt):
    data = S16 if fmt is SampleFormat.S16 else F32
    path = str(tmp_path / f"rt.{ext}")
    st = FileStream(path, Direction.PLAYBACK, fmt, 48000, 1)
    st.write(data)
    st.close()
    out, rate, ch = read_all(path, fmt)
    if ext in ("htk", "sds"):  # rate lives in ns/100ns period units
        assert abs(rate - 48000) < 250
    elif ext == "xi":          # XI carries no rate; 44100 nominal
        assert rate == 44100
    elif ext == "sd2":         # headerless data fork: caller's rate
        assert rate == 0
    else:
        assert rate == 48000
    assert ch == 1
    assert out.shape == data.shape
    if fmt is SampleFormat.S16:
        assert np.array_equal(out, data)
    else:
        # float through a PCM16 container quantizes to 1 LSB
        assert np.allclose(out, data, atol=1.001 / 32768)


@pytest.mark.parametrize("ext", PCM_EXTS + ["wav", "au", "flac"])
def test_write_deterministic(tmp_path, ext):
    # the property every writer here shares with the reference's
    # PEAK-free libsndfile setup (tests/16-verify-tx-consistent)
    blobs = []
    for i in range(2):
        path = str(tmp_path / f"det{i}.{ext}")
        st = FileStream(path, Direction.PLAYBACK, SampleFormat.S16,
                        48000, 1)
        st.write(S16)
        st.close()
        with open(path, "rb") as fh:
            blobs.append(fh.read())
    assert blobs[0] == blobs[1]


def test_modem_loopback_aiff(tmp_path):
    from minimodem_tpu.models.modem import FskModem

    m = FskModem("1200")
    wav = m.modulate(b"aiff container loopback")
    path = str(tmp_path / "mm.aiff")
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1)
    st.write(wav)
    st.close()
    back, rate, _ = read_all(path, SampleFormat.FLOAT)
    assert rate == 48000
    assert m.demodulate(back) == b"aiff container loopback"


def test_wve_alaw_roundtrip(tmp_path):
    """WVE is G.711 A-law at a fixed 8000 Hz: reads always report 8000
    and samples quantize to the A-law grid (libsndfile behaves the
    same)."""
    path = str(tmp_path / "x.wve")
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.FLOAT, 8000, 1)
    st.write(F32)
    st.close()
    out, rate, ch = read_all(path, SampleFormat.FLOAT)
    assert (rate, ch) == (8000, 1)
    assert out.shape == F32.shape
    assert np.abs(out - F32).max() < 0.04  # A-law: ~1/16 step at peak
    assert np.corrcoef(out, F32)[0, 1] > 0.999


def test_svx_is_mono_only(tmp_path):
    st = FileStream(str(tmp_path / "x.svx"), Direction.PLAYBACK,
                    SampleFormat.S16, 48000, 2)
    with pytest.raises(RuntimeError, match="mono"):
        st.write(np.zeros(64, np.int16))


# =========================== OGG Vorbis ===========================

@needs_vorbis
def test_ogg_roundtrip_correlation(tmp_path):
    rate = 48000
    t = np.arange(rate, dtype=np.float32) / rate
    sig = (0.5 * np.sin(2 * np.pi * 1200 * t)).astype(np.float32)
    path = str(tmp_path / "sine.ogg")
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.FLOAT, rate, 1)
    st.write(sig)
    st.close()
    assert os.path.getsize(path) < sig.nbytes // 10  # actually compressed
    out, r, ch = read_all(path, SampleFormat.FLOAT)
    assert (r, ch) == (rate, 1)
    n = min(out.size, sig.size)
    corr = np.corrcoef(out[:n], sig[:n])[0, 1]
    assert corr > 0.99


@needs_vorbis
def test_ogg_modem_loopback(tmp_path):
    from minimodem_tpu.models.modem import FskModem

    m = FskModem("1200")
    wav = m.modulate(b"ogg vorbis loopback")
    path = str(tmp_path / "mm.ogg")
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1)
    st.write(wav)
    st.close()
    back, _, _ = read_all(path, SampleFormat.FLOAT)
    assert m.demodulate(back) == b"ogg vorbis loopback"


@needs_vorbis
def test_ogg_deterministic_and_s16(tmp_path):
    blobs = []
    for i in range(2):
        path = str(tmp_path / f"d{i}.ogg")
        st = FileStream(path, Direction.PLAYBACK, SampleFormat.S16,
                        48000, 1)
        st.write(S16)
        st.close()
        with open(path, "rb") as fh:
            blobs.append(fh.read())
    assert blobs[0] == blobs[1]
    out, rate, ch = read_all(str(tmp_path / "d0.ogg"), SampleFormat.S16)
    assert out.dtype == np.int16 and rate == 48000 and ch == 1
