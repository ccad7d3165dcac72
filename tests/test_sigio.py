"""sigio container coverage: WAV S16/float, AU, RAW round trips; header
determinism; rxnoise injection; the benchmark null device; the native
(C++) WAV codec agreeing with the Python one."""

import numpy as np
import pytest

from minimodem_tpu.sigio import Direction, SampleFormat, open_stream
from minimodem_tpu.sigio.wavfile import FileStream, read_all


def _write(path, fmt, data, rate=48000):
    st = FileStream(path, Direction.PLAYBACK, fmt, rate, 1)
    st.write(data)
    st.close()


@pytest.mark.smoke
@pytest.mark.parametrize("ext", ["wav", "au", "raw"])
@pytest.mark.parametrize("fmt", [SampleFormat.S16, SampleFormat.FLOAT])
def test_container_roundtrip(tmp_path, ext, fmt):
    path = str(tmp_path / f"t.{ext}")
    if fmt is SampleFormat.S16:
        data = (np.arange(-500, 500, 7)).astype(np.int16)
    else:
        data = np.linspace(-1, 1, 333).astype(np.float32)
    _write(path, fmt, data)
    back, rate, ch = read_all(path, fmt)
    if ext == "raw" and fmt is SampleFormat.S16:
        # raw has no header; reader assumes the configured format
        back = np.frombuffer(back.tobytes(), np.int16)
    assert np.array_equal(back[: len(data)], data), ext


def test_wav_float_read_as_s16_and_back(tmp_path):
    path = str(tmp_path / "conv.wav")
    data = np.array([0.0, 0.5, -0.5, 1.0, -1.0], np.float32)
    _write(path, SampleFormat.FLOAT, data)
    s16, _, _ = read_all(path, SampleFormat.S16)
    assert s16[1] == np.int16(0.5 * 32767)

    path2 = str(tmp_path / "conv2.wav")
    pcm = np.array([0, 16384, -16384, 32767, -32768], np.int16)
    _write(path2, SampleFormat.S16, pcm)
    f, _, _ = read_all(path2, SampleFormat.FLOAT)
    np.testing.assert_allclose(f, pcm.astype(np.float32) / 32768.0)


def test_wav_header_deterministic(tmp_path):
    blobs = []
    for i in range(2):
        path = str(tmp_path / f"d{i}.wav")
        _write(path, SampleFormat.S16, np.zeros(100, np.int16))
        blobs.append(open(path, "rb").read())
    assert blobs[0] == blobs[1]


def test_rxnoise_seeded_deterministic(tmp_path):
    path = str(tmp_path / "n.wav")
    _write(path, SampleFormat.FLOAT, np.zeros(1000, np.float32))
    reads = []
    for _ in range(2):
        st = FileStream(path, Direction.RECORD, SampleFormat.FLOAT, 0, 1)
        st.set_rxnoise(0.3)
        reads.append(st.read(1000))
        st.close()
    assert np.array_equal(reads[0], reads[1])
    assert np.abs(reads[0]).max() <= 0.3
    assert np.abs(reads[0]).max() > 0.01


def test_benchmark_backend(capsys):
    st = open_stream("benchmark", None, Direction.PLAYBACK,
                     SampleFormat.S16, 48000, 1, "t", "bench-stream")
    st.write(np.zeros(48000, np.int16))
    st.close()
    out = capsys.readouterr().out
    assert "frames count:" in out and "48000" in out
    assert "performance:" in out


def test_native_wav_matches_python(tmp_path):
    from minimodem_tpu import native

    lib = native.load()
    if lib is None:
        pytest.skip("native library unavailable")
    import ctypes

    data = (np.sin(np.arange(2000) * 0.1) * 20000).astype(np.int16)
    ppath = str(tmp_path / "py.wav")
    npath = str(tmp_path / "nat.wav")
    _write(ppath, SampleFormat.S16, data)
    wrote = lib.mm_wav_write(npath.encode(), 48000, 1, 0,
                             data.ctypes.data_as(ctypes.c_void_p), len(data))
    assert wrote == len(data)
    assert open(ppath, "rb").read() == open(npath, "rb").read()

    # native read of the python-written file
    rate = ctypes.c_int(); ch = ctypes.c_int(); fmt = ctypes.c_int()
    bits = ctypes.c_int(); nf = ctypes.c_longlong(); off = ctypes.c_longlong()
    rc = lib.mm_wav_read_info(ppath.encode(), ctypes.byref(rate),
                              ctypes.byref(ch), ctypes.byref(fmt),
                              ctypes.byref(bits), ctypes.byref(nf),
                              ctypes.byref(off))
    assert rc == 0 and rate.value == 48000 and nf.value == len(data)
    buf = np.zeros(len(data), np.int16)
    got = lib.mm_wav_read_data(ppath.encode(), off.value,
                               buf.ctypes.data_as(ctypes.c_void_p),
                               buf.nbytes)
    assert got == buf.nbytes
    assert np.array_equal(buf, data)


def test_benchmarks_cli_mode(capsys):
    from minimodem_tpu.bench import run_tx_benchmarks

    run_tx_benchmarks(duration_sec=1)
    out = capsys.readouterr().out
    assert out.count("generate-tones-") == 4
    assert out.count("performance:") == 4


# ---------------- FLAC (native decoder + python encoder) ----------------

def test_flac_s16_roundtrip_exact(tmp_path):
    """Encoder (sigio/flacenc.py) -> native decoder (native/flacdec.cpp)
    must be bit-exact and actually compress tonal audio."""
    path = str(tmp_path / "t.flac")
    rng = np.random.default_rng(7)
    data = np.concatenate([
        (np.sin(np.linspace(0, 900, 30000)) * 24000).astype(np.int16),
        np.zeros(4000, np.int16),                       # CONSTANT subframes
        rng.integers(-32000, 32000, 2000).astype(np.int16),  # VERBATIM-ish
    ])
    _write(path, SampleFormat.S16, data)
    back, rate, ch = read_all(path, SampleFormat.S16)
    assert (rate, ch) == (48000, 1)
    assert np.array_equal(back, data)
    import os
    assert os.path.getsize(path) < data.size * 2  # compressed


def test_flac_float_write_read(tmp_path):
    path = str(tmp_path / "t.flac")
    data = (np.sin(np.linspace(0, 250, 20000)) * 0.7).astype(np.float32)
    _write(path, SampleFormat.FLOAT, data)
    back, rate, ch = read_all(path, SampleFormat.FLOAT)
    assert np.max(np.abs(back[: len(data)] - data)) < 1 / 16384  # 16-bit q


def test_flac_write_deterministic(tmp_path):
    data = (np.sin(np.linspace(0, 500, 10000)) * 15000).astype(np.int16)
    p1, p2 = str(tmp_path / "a.flac"), str(tmp_path / "b.flac")
    _write(p1, SampleFormat.S16, data)
    _write(p2, SampleFormat.S16, data)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_flac_cli_roundtrip(tmp_path):
    """TX to .flac and RX from .flac through the full CLI (the capability
    the reference gets from libsndfile, src/simpleaudio-sndfile.c:111-157)."""
    from .helpers import run_cli

    path = str(tmp_path / "m.flac")
    text = b"flac container round trip\n"
    code, _, err = run_cli(["--tx", "--file", path, "1200"], text)
    assert code == 0, err
    code, out, err = run_cli(["--rx", "--file", path, "1200"])
    assert code == 0, err
    assert out == text, err


def test_flac_stereo_and_fixed_orders(tmp_path):
    """2-channel FLAC with signals exercising higher fixed orders."""
    from minimodem_tpu.sigio.flacenc import encode

    n = 9000
    t = np.arange(n, dtype=np.float64)
    left = (np.sin(t * 0.01) * 12000).astype(np.int16)
    right = (t % 1000 * 30 - 15000).astype(np.int16)   # ramps: order-2 wins
    inter = np.empty(n * 2, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    path = str(tmp_path / "st.flac")
    open(path, "wb").write(encode(inter, 44100, 2, 16))
    back, rate, ch = read_all(path, SampleFormat.S16)
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(back, inter)


# ---------------- PCM24/32 WAV write ----------------

@pytest.mark.parametrize("bits", [24, 32])
def test_wav_pcm_deep_write(tmp_path, bits):
    path = str(tmp_path / f"d{bits}.wav")
    data = (np.sin(np.linspace(0, 80, 6000)) * 0.9).astype(np.float32)
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.FLOAT, 48000, 1,
                    pcm_bits=bits)
    st.write(data)
    st.close()
    back, rate, ch = read_all(path, SampleFormat.FLOAT)
    assert np.max(np.abs(back[: len(data)] - data)) < 1 / (1 << 22)


def test_wav_pcm24_write_from_s16(tmp_path):
    path = str(tmp_path / "d24s.wav")
    data = np.arange(-3000, 3000, 3).astype(np.int16)
    st = FileStream(path, Direction.PLAYBACK, SampleFormat.S16, 48000, 1,
                    pcm_bits=24)
    st.write(data)
    st.close()
    back, rate, ch = read_all(path, SampleFormat.S16)
    assert np.array_equal(back[: len(data)], data)
