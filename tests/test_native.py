"""Cross-language validation: the native C++ engine vs the JAX integrator.

Two independent implementations of the same physics (different language,
different code) must agree to machine precision on non-chaotic rays — a
systematic error in either would break this.
"""

import numpy as np
import pytest

from raytrace_tpu.destinations import DiscWithISCO
from raytrace_tpu.geometry.kerr import isco_radius
from raytrace_tpu.native import available, native_trace
from raytrace_tpu.ops import trace
from raytrace_tpu.sources import PointSourceGrid, point_source

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")

SPIN = 0.998


def _assert_agree(rays, a, b, med_dr=1e-10, status_rate=0.99, steps_rate=0.99):
    """Count-gated agreement for two independent integrations of one batch:
    matching termination statuses on >99% of rays, fp-level positions and
    exactly matching step counts on the agreeing set (a sub-percent of
    photon-sphere separatrix rays diverge at the fp level and change their
    path length — the chaotic set the reference's methodology also excludes).
    """
    live = np.asarray(rays.steps) == 0
    sa, sb = np.asarray(a.status), np.asarray(b.status)
    assert (sa == sb)[live].mean() > status_rate
    same = (sa == sb) & live
    dr = np.abs(np.asarray(a.r) - np.asarray(b.r))[same]
    assert np.median(dr) < med_dr
    eq_steps = np.asarray(a.steps)[same] == np.asarray(b.steps)[same]
    assert eq_steps.mean() > steps_rate


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


def test_native_matches_jax_rk45():
    """The adaptive controller is the highest-risk code path: per-ray step
    carry, horizon step-cap, destination clamp (clamped accepted steps keep
    the old step), FSAL error estimate, force-accept at MIN_STEP. Exact step
    counts only match if every accept/reject decision matches, which needs
    fp-level agreement of the whole error-controller arithmetic."""
    grid = PointSourceGrid.from_steps(0.1, 0.1)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    a = native_trace(rays, SPIN, method="rk45", r_max=500.0, steplim=100_000)
    b = trace(rays, SPIN, method="rk45", r_max=500.0, steplim=100_000,
              refine_crossing=False)
    _assert_agree(rays, a, b)
    # the carried adaptive step must agree too (it is resume state)
    live = np.asarray(rays.steps) == 0
    same = (np.asarray(a.status) == np.asarray(b.status)) & live
    ddt = np.abs(np.asarray(a.dt) - np.asarray(b.dt))[same]
    assert np.median(ddt) < 1e-10


def test_native_matches_jax_rk45_isco():
    """DiscWithISCO exercises the annulus-gated destination clamp and the
    crossing-aware reached() (prev_theta bookkeeping) through the adaptive
    integrator — rays inside the ISCO must pass through the disc plane."""
    grid = PointSourceGrid.from_steps(0.1, 0.1)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    dest = DiscWithISCO(r_isco=isco_radius(SPIN), r_out=30.0)
    a = native_trace(rays, SPIN, method="rk45", dest=dest, r_max=500.0,
                     steplim=100_000)
    b = trace(rays, SPIN, method="rk45", dest=dest, r_max=500.0,
              steplim=100_000, refine_crossing=False)
    _assert_agree(rays, a, b)
    # some rays must actually land on the annulus, and none inside the ISCO
    hit = (np.asarray(a.status) & 1) != 0
    assert hit.sum() > 100
    r_hit = np.asarray(a.r)[hit]
    assert (r_hit >= float(isco_radius(SPIN)) - 1e-6).all()


def test_native_matches_jax_rk4_isco():
    """RK4 destination mode: no final-step clamp onto the surface (the
    reference's RK4-dest propagator difference), crossing-aware stop.

    The steps gate is looser than the clamped theta-limit mode's: without
    the final-step clamp, rays that barely graze the annulus make a binary
    crossed/not-crossed decision from an fp-level theta comparison, so a
    slightly larger near-separatrix fraction diverges in path length
    (positions on the agreeing set still match to machine precision)."""
    grid = PointSourceGrid.from_steps(0.1, 0.1)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    dest = DiscWithISCO(r_isco=isco_radius(SPIN), r_out=30.0)
    a = native_trace(rays, SPIN, method="rk4", dest=dest, r_max=500.0,
                     steplim=20000)
    b = trace(rays, SPIN, method="rk4", dest=dest, r_max=500.0,
              steplim=20000, refine_crossing=False)
    _assert_agree(rays, a, b, steps_rate=0.97)


def test_native_does_not_mutate_input():
    grid = PointSourceGrid.from_steps(0.4, 0.8)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    before = np.asarray(rays.r).copy()
    _ = native_trace(rays, SPIN, method="rk4", r_max=200.0, steplim=5000)
    np.testing.assert_array_equal(np.asarray(rays.r), before)
    assert (np.asarray(rays.steps) <= 0).all()  # still untraced
