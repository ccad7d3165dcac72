"""Reference libsndfile loaded via ctypes, for interop tests.

The reference program's entire file layer IS libsndfile
(/root/reference/src/simpleaudio-sndfile.c), so round-tripping our
container codecs against a real libsndfile is direct interop evidence:
files we write must load in the reference's stack, and files its stack
writes must decode in ours.

This image ships libsndfile 1.1.0 inside the pygame wheel
(site-packages/pygame.libs).  Tests that use this helper must skip
cleanly when it's absent (other images).
"""

from __future__ import annotations

import ctypes
import glob
import os

_SF_FORMAT_WAV = 0x010000
_SF_FORMAT_AIFF = 0x020000
_SF_FORMAT_AU = 0x030000
_SF_FORMAT_RAW = 0x040000
_SF_FORMAT_PAF = 0x050000
_SF_FORMAT_SVX = 0x060000
_SF_FORMAT_NIST = 0x070000
_SF_FORMAT_VOC = 0x080000
_SF_FORMAT_IRCAM = 0x0A0000
_SF_FORMAT_W64 = 0x0B0000
_SF_FORMAT_MAT4 = 0x0C0000
_SF_FORMAT_MAT5 = 0x0D0000
_SF_FORMAT_PVF = 0x0E0000
_SF_FORMAT_XI = 0x0F0000
_SF_FORMAT_HTK = 0x100000
_SF_FORMAT_SDS = 0x110000
_SF_FORMAT_AVR = 0x120000
_SF_FORMAT_WAVEX = 0x130000
_SF_FORMAT_SD2 = 0x160000
_SF_FORMAT_FLAC = 0x170000
_SF_FORMAT_CAF = 0x180000
_SF_FORMAT_WVE = 0x190000
_SF_FORMAT_OGG = 0x200000
_SF_FORMAT_MPC2K = 0x210000
_SF_FORMAT_RF64 = 0x220000

_SF_FORMAT_PCM_S8 = 0x0001
_SF_FORMAT_PCM_16 = 0x0002
_SF_FORMAT_PCM_24 = 0x0003
_SF_FORMAT_PCM_32 = 0x0004
_SF_FORMAT_FLOAT = 0x0006
_SF_FORMAT_ALAW = 0x0011
_SF_FORMAT_DPCM_16 = 0x0051
_SF_FORMAT_VORBIS = 0x0060

# major format + the subtype the reference would get for S16 streams
# (simpleaudio-sndfile.c:184-200 uses SF_FORMAT_PCM_16 / SF_FORMAT_FLOAT,
# falling back to each container's native subtype where 16-bit PCM isn't
# representable: WVE is A-law-only, XI is delta-PCM-only)
MAJOR_BY_EXT = {
    "wav": _SF_FORMAT_WAV, "aiff": _SF_FORMAT_AIFF, "au": _SF_FORMAT_AU,
    "paf": _SF_FORMAT_PAF, "svx": _SF_FORMAT_SVX, "nist": _SF_FORMAT_NIST,
    "voc": _SF_FORMAT_VOC, "ircam": _SF_FORMAT_IRCAM,
    "w64": _SF_FORMAT_W64, "mat4": _SF_FORMAT_MAT4,
    "mat5": _SF_FORMAT_MAT5, "pvf": _SF_FORMAT_PVF, "xi": _SF_FORMAT_XI,
    "htk": _SF_FORMAT_HTK, "sds": _SF_FORMAT_SDS, "avr": _SF_FORMAT_AVR,
    "wavex": _SF_FORMAT_WAVEX, "sd2": _SF_FORMAT_SD2,
    "flac": _SF_FORMAT_FLAC, "caf": _SF_FORMAT_CAF, "wve": _SF_FORMAT_WVE,
    "ogg": _SF_FORMAT_OGG, "mpc2k": _SF_FORMAT_MPC2K,
    "rf64": _SF_FORMAT_RF64,
}

SUBTYPE_S16 = _SF_FORMAT_PCM_16
SUBTYPE_BY_EXT = {ext: _SF_FORMAT_PCM_16 for ext in MAJOR_BY_EXT}
SUBTYPE_BY_EXT["wve"] = _SF_FORMAT_ALAW
SUBTYPE_BY_EXT["xi"] = _SF_FORMAT_DPCM_16
SUBTYPE_BY_EXT["ogg"] = _SF_FORMAT_VORBIS

_SFM_READ = 0x10
_SFM_WRITE = 0x20


class _SF_INFO(ctypes.Structure):
    _fields_ = [
        ("frames", ctypes.c_int64),
        ("samplerate", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("format", ctypes.c_int),
        ("sections", ctypes.c_int),
        ("seekable", ctypes.c_int),
    ]


_lib = None


def load():
    """-> libsndfile CDLL or None."""
    global _lib
    if _lib is not None:
        return _lib
    import site

    candidates = []
    for sp in site.getsitepackages() + [site.getusersitepackages()]:
        candidates += glob.glob(os.path.join(sp, "pygame.libs",
                                             "libsndfile*"))
    if not candidates:
        return None
    d = os.path.dirname(candidates[0])
    try:
        for dep in ("libogg*", "libopus-*", "libvorbis-*", "libvorbisenc*",
                    "libFLAC-*"):
            for p in glob.glob(os.path.join(d, dep)):
                ctypes.CDLL(p, mode=ctypes.RTLD_GLOBAL)
        lib = ctypes.CDLL(candidates[0])
    except OSError:
        return None
    lib.sf_open.restype = ctypes.c_void_p
    lib.sf_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                            ctypes.POINTER(_SF_INFO)]
    lib.sf_readf_float.restype = ctypes.c_int64
    lib.sf_readf_float.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64]
    lib.sf_writef_short.restype = ctypes.c_int64
    lib.sf_writef_short.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_short),
                                    ctypes.c_int64]
    lib.sf_readf_short.restype = ctypes.c_int64
    lib.sf_readf_short.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_short),
                                   ctypes.c_int64]
    lib.sf_close.argtypes = [ctypes.c_void_p]
    lib.sf_strerror.restype = ctypes.c_char_p
    lib.sf_strerror.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def read(path: str):
    """-> (float32 mono-interleaved samples [frames*channels], rate,
    channels).  Raises on open failure."""
    import numpy as np

    lib = load()
    info = _SF_INFO()
    if path.endswith(".raw"):
        info.samplerate, info.channels = 48000, 1
        info.format = _SF_FORMAT_RAW | _SF_FORMAT_PCM_16
    h = lib.sf_open(path.encode(), _SFM_READ, ctypes.byref(info))
    if not h:
        raise RuntimeError(
            f"libsndfile: {lib.sf_strerror(None).decode()}: {path}")
    try:
        n = info.frames * info.channels
        buf = np.empty(n, np.float32)
        got = lib.sf_readf_float(
            h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            info.frames)
        return buf[: got * info.channels], info.samplerate, info.channels
    finally:
        lib.sf_close(h)


def read_short(path: str):
    """-> (int16 mono-interleaved samples, rate, channels) via
    sf_readf_short.  Raises on open failure."""
    import numpy as np

    lib = load()
    info = _SF_INFO()
    if path.endswith(".raw"):
        info.samplerate, info.channels = 48000, 1
        info.format = _SF_FORMAT_RAW | _SF_FORMAT_PCM_16
    h = lib.sf_open(path.encode(), _SFM_READ, ctypes.byref(info))
    if not h:
        raise RuntimeError(
            f"libsndfile: {lib.sf_strerror(None).decode()}: {path}")
    try:
        n = info.frames * info.channels
        buf = np.empty(n, np.int16)
        got = lib.sf_readf_short(
            h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            info.frames)
        return buf[: got * info.channels], info.samplerate, info.channels
    finally:
        lib.sf_close(h)


def write(path: str, samples, rate: int, fmt: int, channels: int = 1):
    """Write int16 samples with libsndfile.  Raises on failure."""
    import numpy as np

    lib = load()
    info = _SF_INFO()
    info.samplerate = rate
    info.channels = channels
    info.format = fmt
    h = lib.sf_open(path.encode(), _SFM_WRITE, ctypes.byref(info))
    if not h:
        raise RuntimeError(
            f"libsndfile: {lib.sf_strerror(None).decode()}: {path}")
    try:
        s = np.ascontiguousarray(samples, np.int16)
        lib.sf_writef_short(
            h, s.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            len(s) // channels)
    finally:
        lib.sf_close(h)
