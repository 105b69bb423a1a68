"""Differentiability tests: trace_scan forward equivalence and gradient
validation against finite differences (the BASELINE.json north star).

Methodology: individual robust rays give machine-precision agreement with
central differences (the march is smooth along any fixed branch); ensemble
observables are validated loosely because the underlying dynamics has
genuine discrete events (chaotic separatrix mask flips, step-size heuristic
switches) that make finite differences non-convergent at small delta — the
autodiff gradient is the derivative of the smooth part.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.geometry import constants_from_angles
from raytrace_tpu.ops import trace
from raytrace_tpu.ops.diff import emissivity_gradient_pipeline, trace_scan
from raytrace_tpu.ops.redshift import apply_redshift
from raytrace_tpu.rays import blank_batch
from raytrace_tpu.sources import PointSourceGrid, point_source

SPIN = 0.9


def _single_ray_pipeline(spin, h_src, alpha=2.0, beta=1.0, method="rk4",
                         n_steps=2048):
    """Landing radius and redshift of one robust disc-hitting lamppost ray."""
    n = 8
    base = blank_batch(n)
    r0 = jnp.full((n,), h_src)
    th0 = jnp.full((n,), 1e-3)
    c = constants_from_angles(
        r0, th0, jnp.full((n,), alpha), jnp.full((n,), beta), 0.0, spin
    )
    rays = base.replace(
        r=r0, theta=th0, phi=jnp.zeros(n), t=jnp.zeros(n),
        k=c.k, h=c.h, Q=c.Q, rdot_sign=c.rdot_sign,
        thetadot_sign=c.thetadot_sign, steps=jnp.zeros(n, jnp.int32),
        emit=jnp.ones(n),
    )
    out = trace_scan(rays, spin, method=method, r_max=500.0, n_steps=n_steps)
    out = apply_redshift(out, spin, V=-1.0)
    return out.r[0], out.redshift[0]


def test_trace_scan_matches_trace_forward():
    grid = PointSourceGrid.from_steps(0.25, 0.25, -0.9, 0.9, -3.0, 3.0)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    a = trace(rays, SPIN, method="rk4", r_max=500.0, steplim=3073)
    b = trace_scan(rays, SPIN, method="rk4", r_max=500.0, n_steps=3072)
    np.testing.assert_allclose(np.asarray(a.r), np.asarray(b.r), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))


def test_single_ray_gradients_match_finite_differences():
    f_r = lambda s, h: _single_ray_pipeline(s, h)[0]
    ad = jax.grad(f_r, argnums=(0, 1))(SPIN, 5.0)
    d = 1e-6
    fd_s = (float(f_r(SPIN + d, 5.0)) - float(f_r(SPIN - d, 5.0))) / (2 * d)
    fd_h = (float(f_r(SPIN, 5.0 + d)) - float(f_r(SPIN, 5.0 - d))) / (2 * d)
    np.testing.assert_allclose(float(ad[0]), fd_s, rtol=1e-4)
    np.testing.assert_allclose(float(ad[1]), fd_h, rtol=1e-4)
    # physical sanity: raising the source pushes this ray outwards
    assert float(ad[1]) > 0


def test_single_ray_redshift_gradient():
    f_g = lambda s, h: _single_ray_pipeline(s, h)[1]
    ad = jax.grad(f_g, argnums=(0, 1))(SPIN, 5.0)
    d = 1e-6
    fd_s = (float(f_g(SPIN + d, 5.0)) - float(f_g(SPIN - d, 5.0))) / (2 * d)
    fd_h = (float(f_g(SPIN, 5.0 + d)) - float(f_g(SPIN, 5.0 - d))) / (2 * d)
    np.testing.assert_allclose(float(ad[0]), fd_s, rtol=1e-3, atol=1e-10)
    np.testing.assert_allclose(float(ad[1]), fd_h, rtol=1e-3, atol=1e-10)


def test_ensemble_gradients_finite_and_sane():
    grid = PointSourceGrid.from_steps(0.25, 0.25, -0.9, 0.9, -3.0, 3.0)
    f = lambda s, h, g: emissivity_gradient_pipeline(s, h, g, grid, n_steps=2048, r0=4.0)
    val = float(f(SPIN, 5.0, 2.0))
    assert np.isfinite(val) and val > 0
    grads = jax.grad(f, argnums=(0, 1, 2))(SPIN, 5.0, 2.0)
    gs = [float(g) for g in grads]
    assert all(np.isfinite(g) for g in gs), gs
    # gamma enters only through the smooth analytic weight: exact agreement
    d = 1e-5
    fd_gamma = (float(f(SPIN, 5.0, 2.0 + d)) - float(f(SPIN, 5.0, 2.0 - d))) / (2 * d)
    np.testing.assert_allclose(gs[2], fd_gamma, rtol=1e-6)
    # spin/h: same sign and magnitude scale as a large-delta difference
    # (small-delta FD is non-convergent: discretisation + chaos noise)
    D = 1e-3
    fd_spin = (float(f(SPIN + D, 5.0, 2.0)) - float(f(SPIN - D, 5.0, 2.0))) / (2 * D)
    assert np.sign(gs[0]) == np.sign(fd_spin)
    assert 0.2 < abs(gs[0] / fd_spin) < 5.0


def test_rk45_single_ray_gradients_match_finite_differences():
    """The production integrator's gradients, not just RK4's: reverse-mode
    through the full adaptive controller (per-lane dt, accept/reject masks,
    error norm) against central differences. Agreement is ~1e-4 rather than
    RK4's machine precision because the adaptive step sequence responds to
    the perturbed trajectory, adding controller noise to the FD estimate."""
    f_r = lambda s, h: _single_ray_pipeline(s, h, method="rk45", n_steps=1200)[0]
    ad = jax.grad(f_r, argnums=(0, 1))(SPIN, 5.0)
    d = 1e-6
    fd_s = (float(f_r(SPIN + d, 5.0)) - float(f_r(SPIN - d, 5.0))) / (2 * d)
    fd_h = (float(f_r(SPIN, 5.0 + d)) - float(f_r(SPIN, 5.0 - d))) / (2 * d)
    np.testing.assert_allclose(float(ad[0]), fd_s, rtol=1e-3)
    np.testing.assert_allclose(float(ad[1]), fd_h, rtol=1e-3)

    f_g = lambda s, h: _single_ray_pipeline(s, h, method="rk45", n_steps=1200)[1]
    adg = jax.grad(f_g, argnums=(0, 1))(SPIN, 5.0)
    fdg_s = (float(f_g(SPIN + d, 5.0)) - float(f_g(SPIN - d, 5.0))) / (2 * d)
    fdg_h = (float(f_g(SPIN, 5.0 + d)) - float(f_g(SPIN, 5.0 - d))) / (2 * d)
    np.testing.assert_allclose(float(adg[0]), fdg_s, rtol=1e-3, atol=1e-10)
    np.testing.assert_allclose(float(adg[1]), fdg_h, rtol=1e-3, atol=1e-10)


def test_rk45_scan_gradients_finite():
    """The adaptive path is differentiable too (per-lane dt is part of the
    smooth computation)."""
    def f(spin):
        grid = PointSourceGrid.from_steps(0.45, 0.45, -0.9, 0.9, -3.0, 3.0)
        rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin, grid=grid)
        out = trace_scan(rays, spin, method="rk45", r_max=500.0, n_steps=512)
        live = jax.lax.stop_gradient(out.steps > 0)
        return jnp.sum(jnp.where(live, jnp.tanh(out.r / 100.0), 0.0))

    g = float(jax.grad(f)(SPIN))
    assert np.isfinite(g)
