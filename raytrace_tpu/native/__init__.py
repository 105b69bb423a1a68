"""Native CPU geodesic engine (csrc/geodesic.cpp) via ctypes.

Compiled on demand with the system C++ toolchain (g++ -O3 -fopenmp) into the
package directory; if no toolchain is available the JAX CPU path remains the
fallback. Used as a cross-language validation oracle (Euler/RK4/DOPRI5, all
theta-surface destinations) and a fast multithreaded CPU engine.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from raytrace_tpu.ops.integrate import RK45_STEPLIM, STEPLIM, StepControl
from raytrace_tpu.rays import RayBatch

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "geodesic.cpp"
_LIB = Path(__file__).resolve().parent / "_geodesic.so"

_lib = None

_METHOD_CODE = {"euler": 0, "rk4": 1, "rk45": 2}


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
        [ctypes.c_int32, ctypes.c_int32]            # n, method
        + [ctypes.c_double] * 6                     # spin boundary rlim tl isco rout
        + [ctypes.c_int32] * 2                      # steplim, max_iters
        + [ctypes.c_double] * 11                    # ctrl
        + [d] * 4                                   # t r theta phi
        + [d] * 3                                   # k h Q
        + [d] * 3                                   # signs, dt
        + [i] * 4                                   # steps status flips eq_cross
    )
    _lib = lib
    return lib


def _dest_params(dest, theta_lim):
    """Map a destinations.py surface onto the (theta_lim, r_isco, r_out)
    C-side descriptor. r_isco < 0 selects the plain ThetaLimit behaviour."""
    import math

    from raytrace_tpu.destinations import DiscWithISCO, ThetaLimit

    if dest is None:
        return (math.pi / 2 if theta_lim is None else float(theta_lim)), -1.0, -1.0
    if isinstance(dest, DiscWithISCO):
        return float(dest.theta_lim), float(dest.r_isco), float(dest.r_out)
    if isinstance(dest, ThetaLimit):
        return float(dest.theta_lim), -1.0, -1.0
    raise NotImplementedError(f"native engine does not support {type(dest).__name__}")


def native_trace(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest=None,
    r_max=1000.0,
    theta_lim=None,
    steplim: int | None = None,
    ctrl: StepControl = StepControl(),
    boundary=None,
) -> RayBatch:
    """trace() through the native engine (theta-surface destinations).

    Same RayBatch-in / RayBatch-out contract as ops.trace (with
    refine_crossing=False) for euler/rk4/rk45 over ThetaLimit or
    DiscWithISCO destinations.
    """
    import jax.numpy as jnp

    lib = load()
    if lib is None:
        raise RuntimeError("native engine unavailable (no C++ toolchain?)")
    tl, r_isco, r_out = _dest_params(dest, theta_lim)
    if steplim is None:
        steplim = RK45_STEPLIM if method == "rk45" else STEPLIM
    max_iters = steplim + steplim // 4 + 16

    n = rays.n_rays
    # np.array with copy=True: np.asarray on a CPU jax array can return a
    # view of the (immutable) device buffer, and the kernel writes in place
    f = lambda x: np.array(x, dtype=np.float64, order="C", copy=True)
    ii = lambda x: np.array(x, dtype=np.int32, order="C", copy=True)

    t, r, th, ph = f(rays.t), f(rays.r), f(rays.theta), f(rays.phi)
    k, h, Q = f(rays.k), f(rays.h), f(rays.Q)
    rs, ts = f(rays.rdot_sign), f(rays.thetadot_sign)
    # dt <= 0 asks the C side to seed the adaptive step (fresh propagation,
    # matching trace()'s resume=False); a resumed batch carries its dt
    dt = np.zeros(n, dtype=np.float64)
    steps, status = ii(rays.steps), ii(rays.status)
    flips, eqx = ii(rays.rdot_flips), ii(rays.equatorial_crossings)

    d = ctypes.POINTER(ctypes.c_double)
    i32 = ctypes.POINTER(ctypes.c_int32)
    P = lambda a: a.ctypes.data_as(d)
    Pi = lambda a: a.ctypes.data_as(i32)

    lib.rt_native_trace(
        n, _METHOD_CODE[method], float(spin),
        -1.0 if boundary is None else float(boundary),
        float(r_max), tl, r_isco, r_out, int(steplim), int(max_iters),
        ctrl.precision, ctrl.theta_precision, ctrl.max_tstep,
        ctrl.maxtstep_rlim, ctrl.max_phistep, ctrl.min_step, ctrl.rk45_tol,
        ctrl.horizon_eps, ctrl.safety, ctrl.fac_min, ctrl.fac_max,
        P(t), P(r), P(th), P(ph), P(k), P(h), P(Q), P(rs), P(ts), P(dt),
        Pi(steps), Pi(status), Pi(flips), Pi(eqx),
    )

    return rays.replace(
        t=jnp.asarray(t), r=jnp.asarray(r), theta=jnp.asarray(th),
        phi=jnp.asarray(ph), rdot_sign=jnp.asarray(rs),
        thetadot_sign=jnp.asarray(ts), dt=jnp.asarray(dt),
        steps=jnp.asarray(steps), status=jnp.asarray(status),
        rdot_flips=jnp.asarray(flips), equatorial_crossings=jnp.asarray(eqx),
    )
