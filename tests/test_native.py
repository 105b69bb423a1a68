"""Cross-language validation: the native C++ engine vs the JAX integrator.

Two independent implementations of the same physics (different language,
different code) must agree to machine precision on non-chaotic rays — a
systematic error in either would break this.
"""

import numpy as np
import pytest

from raytrace_tpu.native import available, native_trace
from raytrace_tpu.ops import trace
from raytrace_tpu.sources import PointSourceGrid, point_source

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")

SPIN = 0.998


def test_native_matches_jax_rk4():
    grid = PointSourceGrid.from_steps(0.1, 0.1)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    a = native_trace(rays, SPIN, method="rk4", r_max=500.0, steplim=20000)
    b = trace(rays, SPIN, method="rk4", r_max=500.0, steplim=20000)

    live = np.asarray(rays.steps) == 0
    sa, sb = np.asarray(a.status), np.asarray(b.status)
    assert (sa == sb)[live].mean() > 0.99
    same = (sa == sb) & live
    dr = np.abs(np.asarray(a.r) - np.asarray(b.r))[same]
    assert np.median(dr) < 1e-10
    # step counts agree exactly except for a sub-percent of separatrix rays
    # whose fp-level divergence changes the path length
    eq_steps = np.asarray(a.steps)[same] == np.asarray(b.steps)[same]
    assert eq_steps.mean() > 0.99


def test_native_does_not_mutate_input():
    grid = PointSourceGrid.from_steps(0.4, 0.8)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    before = np.asarray(rays.r).copy()
    _ = native_trace(rays, SPIN, method="rk4", r_max=200.0, steplim=5000)
    np.testing.assert_array_equal(np.asarray(rays.r), before)
    assert (np.asarray(rays.steps) <= 0).all()  # still untraced
