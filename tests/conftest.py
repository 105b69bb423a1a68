"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The harness's sitecustomize registers a tunneled remote-TPU ("axon") PJRT
plugin in every interpreter and forces jax_platforms="axon,cpu" *at
interpreter startup*, before conftest runs — so plain env vars are not
enough. Eager dispatch over that tunnel makes unit tests unusably slow (and
silently demotes f64 to f32 on TPU hardware), and the sharding tests need 8
devices, so we force the CPU backend at the config level here, before any
test imports jax arrays. Real-TPU runs (bench.py, apps) are unaffected.
"""

import os

# For any subprocesses the tests may spawn.
os.environ["JAX_PLATFORMS"] = "cpu"
# Keep the persistent compilation cache OUT of the suite: app mains invoked
# in-process would otherwise enable it, and the shared /tmp cache can hold
# XLA:CPU executables compiled for another machine's CPU features (the
# remote-TPU compile service populates the same directory), which XLA loads
# with a SIGILL warning. Hermetic tests recompile.
os.environ["RT_COMPCACHE"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize has usually imported it already)

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    # Fail fast if the CPU override did not take: running the suite over the
    # axon tunnel is ~100x slower and f64-unsafe.
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}"
    )
    assert jax.device_count() == 8, "expected 8 virtual CPU devices for sharding tests"


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Release compiled executables between test modules.

    The suite is one process compiling hundreds of XLA:CPU programs
    (every app main in the CLI sweep jits its own); holding all of them
    alive for the whole run both bloats RSS and has produced a
    late-suite segfault inside backend_compile_and_load. Modules don't
    share program shapes, so clearing costs only the next module's
    (already-counted) compiles.
    """
    yield
    import jax

    jax.clear_caches()
