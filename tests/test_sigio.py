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
