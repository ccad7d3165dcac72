"""minimodem_tpu: a TPU-native software audio FSK modem framework.

A from-scratch re-design of kamalmostafa/minimodem (reference mounted at
/root/reference) for TPU hardware: the demodulator's per-bit FFT loop
becomes batched JAX/XLA/Pallas correlation kernels that score every
candidate frame offset of an audio chunk at once, while the tiny sequential
pieces (framing codecs, carrier state machine) stay on host.

Layers (mirroring the reference's structure, SURVEY.md section 1):
- cli / models   : command-line driver, baudmode preset "model zoo"
- codecs         : databits byte<->frame codecs (ascii/baudot/binary/cid/uic)
- ops            : TX synthesis + RX demod scoring (JAX / Pallas)
- rx             : carrier-tracking state machine (host)
- sigio          : audio stream abstraction + WAV/AU/RAW codec
- parallel       : multi-chip sharding of chunked decode
"""

# float64 is used by the high-precision demod scoring path; enable before
# any jax import elsewhere grabs the default config.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# persistent compilation cache: scoring programs are compiled once per
# (config geometry, chunk length) and reused across CLI invocations
_cache_dir = _os.environ.get(
    "MINIMODEM_TPU_JAX_CACHE",
    _os.path.join(
        _os.path.expanduser("~"), ".cache", "minimodem_tpu",
        # separate caches per platform: executables AOT-compiled for one
        # host/backend combination must not be loaded by another
        "jax-" + _os.environ.get("JAX_PLATFORMS", "default").replace(",", "-"),
    ),
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"

from .config import ModemConfig, RxOptions, TxOptions  # noqa: E402,F401


def __getattr__(name):
    # lazy: importing FskModem pulls in the ops stack
    if name == "FskModem":
        from .models.modem import FskModem
        return FskModem
    raise AttributeError(name)
