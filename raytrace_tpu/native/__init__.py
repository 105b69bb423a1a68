"""Native CPU geodesic engine (csrc/geodesic.cpp) via ctypes.

Compiled on demand with the system C++ toolchain (g++ -O3 -fopenmp) into the
package directory; if no toolchain is available the JAX CPU path remains the
fallback. Used as a cross-language validation oracle and a fast
multithreaded CPU engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from raytrace_tpu.ops.integrate import StepControl
from raytrace_tpu.rays import RayBatch

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "geodesic.cpp"
_LIB = Path(__file__).resolve().parent / "_geodesic.so"

_lib = None


def _build() -> bool:
    if not _SRC.exists():
        return False
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-fopenmp", "-fPIC", "-shared", "-std=c++17",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def available() -> bool:
    return load() is not None


def load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _LIB.stat().st_mtime
    ):
        if not _build():
            return None
    lib = ctypes.CDLL(str(_LIB))
    d = ctypes.POINTER(ctypes.c_double)
    i = ctypes.POINTER(ctypes.c_int32)
    lib.rt_native_trace.restype = None
    lib.rt_native_trace.argtypes = (
        [ctypes.c_int32, ctypes.c_int32]
        + [ctypes.c_double] * 3
        + [ctypes.c_int32]
        + [ctypes.c_double] * 7
        + [d] * 4  # t r theta phi
        + [d] * 3  # k h Q
        + [d] * 2  # signs
        + [i] * 4  # steps status flips eq_cross
    )
    _lib = lib
    return lib


def native_trace(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    r_max=1000.0,
    theta_lim=None,
    steplim: int = 30_000,
    ctrl: StepControl = StepControl(),
) -> RayBatch:
    """trace() through the native engine (theta-limit destination only).

    Same RayBatch-in / RayBatch-out contract as ops.trace for the euler/rk4
    theta-limit configuration.
    """
    import jax.numpy as jnp
    import math

    lib = load()
    if lib is None:
        raise RuntimeError("native engine unavailable (no C++ toolchain?)")
    if theta_lim is None:
        theta_lim = math.pi / 2

    n = rays.n_rays
    # np.array with copy=True: np.asarray on a CPU jax array can return a
    # view of the (immutable) device buffer, and the kernel writes in place
    f = lambda x: np.array(x, dtype=np.float64, order="C", copy=True)
    ii = lambda x: np.array(x, dtype=np.int32, order="C", copy=True)

    t, r, th, ph = f(rays.t), f(rays.r), f(rays.theta), f(rays.phi)
    k, h, Q = f(rays.k), f(rays.h), f(rays.Q)
    rs, ts = f(rays.rdot_sign), f(rays.thetadot_sign)
    steps, status = ii(rays.steps), ii(rays.status)
    flips, eqx = ii(rays.rdot_flips), ii(rays.equatorial_crossings)

    d = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    P = lambda a: a.ctypes.data_as(d)
    Pi = lambda a: a.ctypes.data_as(i32)

    lib.rt_native_trace(
        n, 1 if method == "rk4" else 0, float(spin), float(r_max),
        float(theta_lim), int(steplim),
        ctrl.precision, ctrl.theta_precision, ctrl.max_tstep,
        ctrl.maxtstep_rlim, ctrl.max_phistep, ctrl.min_step, ctrl.horizon_eps,
        P(t), P(r), P(th), P(ph), P(k), P(h), P(Q), P(rs), P(ts),
        Pi(steps), Pi(status), Pi(flips), Pi(eqx),
    )

    return rays.replace(
        t=jnp.asarray(t), r=jnp.asarray(r), theta=jnp.asarray(th),
        phi=jnp.asarray(ph), rdot_sign=jnp.asarray(rs),
        thetadot_sign=jnp.asarray(ts), steps=jnp.asarray(steps),
        status=jnp.asarray(status), rdot_flips=jnp.asarray(flips),
        equatorial_crossings=jnp.asarray(eqx),
    )
