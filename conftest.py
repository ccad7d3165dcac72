"""Root conftest: re-exec pytest into a clean CPU-jax environment.

The container's default environment injects the axon TPU PJRT plugin into
every python process via a PYTHONPATH sitecustomize.  That plugin makes the
first jax device->host transfer stall for minutes when JAX_PLATFORMS=cpu,
and tests want the hermetic CPU backend (with 8 virtual devices for the
sharding suite).  `python -E` drops PYTHONPATH and with it the plugin, so
re-exec once with the right flags.  This lives in the *root* conftest so it
runs during pytest config bootstrapping, before output capture starts.
"""

import os
import sys

_REEXEC_FLAG = "MINIMODEM_TPU_TEST_REEXEC"


def _axon_hook_present() -> bool:
    pp = os.environ.get("PYTHONPATH", "")
    return any("axon" in p for p in pp.split(":"))


def pytest_configure(config):
    if os.environ.get(_REEXEC_FLAG) == "1":
        return
    needs_clean_env = (_axon_hook_present()
                       or os.environ.get("JAX_PLATFORMS") != "cpu")
    # A user following CLAUDE.md's advice may preset JAX_PLATFORMS=cpu in
    # an already-clean env; without the 8-device flag the 15 mesh tests
    # (sharding/service/u8-fleet) would silently skip — re-exec for the
    # flag alone too, so `pytest -q` never loses them in any documented
    # invocation.
    needs_mesh_flag = ("xla_force_host_platform_device_count"
                       not in os.environ.get("XLA_FLAGS", ""))
    if not (needs_clean_env or needs_mesh_flag):
        return
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    xla_flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = xla_flags
    # hermetic test compiles: don't share AOT cache artifacts across
    # platforms/machines (stale remote-compiled entries SIGILL-warn)
    env["MINIMODEM_TPU_JAX_CACHE"] = ""

    # restore the real stdout/stderr fds before exec (pytest's fd-capture
    # has already redirected fd 1/2 into temp files by now)
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-E", "-m", "pytest", *config.invocation_params.args],
        env,
    )
