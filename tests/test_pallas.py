"""Pallas kernel equivalence (interpreter mode on CPU).

The Mosaic-compiled path is exercised on real TPU hardware by bench.py and
the verification drives; here the kernel's *logic* is pinned against the
XLA integrator in Pallas interpreter mode, f32 on both sides, where results
must agree except for f32 constant-rounding noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import raytrace_tpu.ops.pallas_kernel as pk
from raytrace_tpu.destinations import DiscWithISCO
from raytrace_tpu.geometry import isco_radius
from raytrace_tpu.ops import trace
from raytrace_tpu.sources import PointSourceGrid, point_source

SPIN = 0.998


@pytest.fixture(autouse=True)
def _interpret_pallas(monkeypatch):
    real_call = pk.pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return real_call(*args, **kw)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)


def _f32(rays):
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, rays
    )


def test_pallas_matches_xla_f32():
    grid = PointSourceGrid.from_steps(0.3, 0.5, -0.9, 0.9, -3.0, 3.0)
    rays = _f32(point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid))
    s = jnp.float32(SPIN)
    a = pk.trace_pallas(rays, s, method="rk4", r_max=300.0, steplim=3000)
    b = trace(rays, s, method="rk4", r_max=300.0, steplim=3000)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    same = np.asarray(a.status) == np.asarray(b.status)
    dr = np.abs(np.asarray(a.r) - np.asarray(b.r))[same]
    assert np.median(dr) < 1e-4
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))


def test_pallas_isco_destination():
    a_spin = 0.5
    grid = PointSourceGrid.from_steps(0.45, 0.8, -0.9, 0.9, -3.0, 3.0)
    rays = _f32(point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=a_spin, grid=grid))
    s = jnp.float32(a_spin)
    dest = DiscWithISCO(
        r_isco=jnp.float32(isco_radius(a_spin)), r_out=jnp.float32(30.0)
    )
    a = pk.trace_pallas(rays, s, method="rk4", dest=dest, r_max=300.0, steplim=3000)
    b = trace(rays, s, method="rk4", dest=dest, r_max=300.0, steplim=3000)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))


def test_pallas_pads_odd_batches():
    grid = PointSourceGrid.from_steps(0.6, 1.2, -0.9, 0.9, -3.0, 3.0)
    rays = _f32(point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid))
    assert rays.n_rays % 1024 != 0
    out = pk.trace_pallas(rays, jnp.float32(SPIN), method="rk4", r_max=300.0, steplim=2000)
    assert out.n_rays == rays.n_rays


def test_pallas_fused_matches_compacted():
    """The one-dispatch fused schedule must be observationally identical to
    the host-driven compaction loop (same termination statuses and step
    counts; positions equal on the common path)."""
    grid = PointSourceGrid.from_steps(0.3, 0.5, -0.9, 0.9, -3.0, 3.0)
    rays = _f32(point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid))
    s = jnp.float32(SPIN)
    kw = dict(method="rk4", r_max=300.0, steplim=3000)
    a = pk.trace_pallas_fused(
        rays, s, schedule=((64, None, 16, 2), (128, 2048, 16, 2), (5000, 1024, 8, 4)), **kw
    )
    b = pk.trace_pallas_compacted(rays, s, phase_iters=64, **kw)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))
    np.testing.assert_allclose(np.asarray(a.r), np.asarray(b.r), rtol=1e-5, atol=1e-5)


def test_pallas_fused_overflow_falls_back():
    """A schedule whose widths cannot hold the survivors must still finish
    every ray (host-drain fallback), not silently strand them mid-flight."""
    grid = PointSourceGrid.from_steps(0.3, 0.5, -0.9, 0.9, -3.0, 3.0)
    rays = _f32(point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid))
    s = jnp.float32(SPIN)
    kw = dict(method="rk4", r_max=300.0, steplim=3000)
    # after 8 iterations every ray is still active; width 1024 < n overflows
    a = pk.trace_pallas_fused(rays, s, schedule=((8, None, 16, 2), (16, 1024, 8, 2)), **kw)
    b = pk.trace_pallas_compacted(rays, s, **kw)
    assert not np.asarray(a.active).any()
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))
