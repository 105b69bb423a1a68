"""Unit tests for the L0 Kerr geometry library against closed-form oracles.

Physics ground truths follow the reference's implicit oracles (SURVEY.md §4.6):
horizon r = 1 + sqrt(1 - a^2), Bardeen ISCO values, null condition
g_munu p^mu p^nu = 0, tetrad orthonormality, Schwarzschild limits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.geometry import (
    bl_to_cartesian,
    circular_orbit_velocity,
    constants_from_angles,
    constants_from_p,
    coordinate_disc_area,
    geodesic_rates,
    gram_schmidt_tetrad,
    horizon_radius,
    integrate_disc_area,
    isco_radius,
    keplerian_omega,
    lorentz_factor,
    metric_coeffs,
    metric_dot,
    momentum_from_consts,
    orbit_tetrad,
    plunge_velocity,
    rel_disc_area,
)

SPINS = [0.0, 0.5, 0.9, 0.998]


def test_horizon_closed_form():
    for a in SPINS:
        np.testing.assert_allclose(horizon_radius(a), 1 + np.sqrt(1 - a * a), rtol=1e-12)
    # Schwarzschild: r_h = 2; extremal: r_h -> 1
    np.testing.assert_allclose(horizon_radius(0.0), 2.0, rtol=1e-12)
    np.testing.assert_allclose(horizon_radius(1.0), 1.0, atol=1e-7)


def test_isco_known_values():
    # Schwarzschild ISCO = 6M; extremal prograde -> 1M; extremal retrograde -> 9M
    np.testing.assert_allclose(isco_radius(0.0), 6.0, rtol=1e-12)
    np.testing.assert_allclose(isco_radius(1.0, +1), 1.0, atol=1e-5)
    np.testing.assert_allclose(isco_radius(1.0, -1), 9.0, atol=1e-5)
    # a = 0.998 (Thorne limit): prograde ISCO ~ 1.237 (standard value)
    np.testing.assert_allclose(isco_radius(0.998), 1.237, atol=1e-3)


def test_isco_gradient_all_spin_scales():
    """d(r_isco)/da must stay accurate through the small-spin cancellation.

    u = 3 - z1 ~ (8/9)a^2 cancels catastrophically below a ~ 1e-7 in f64;
    the custom JVP switches to the exact series there. Regression for the
    round-3 advisor finding (grad(1e-8) was ~ -1e23). Truth values from a
    50-digit mpmath evaluation of the Bardeen formula's derivative.
    """
    truth = {
        1e-12: -3.2659863266,
        1e-08: -3.2659863315,
        1e-04: -3.2660641074,
        1e-02: -3.2738235710,
        0.5: -3.9147888034,
        0.998: -46.0004040327,
    }
    for a, want in truth.items():
        got = float(jax.grad(isco_radius)(jnp.float64(a)))
        np.testing.assert_allclose(got, want, rtol=1e-8, err_msg=f"a={a}")
    # a = 0 keeps the symmetric subgradient 0 of the even parametrization
    assert float(jax.grad(isco_radius)(jnp.float64(0.0))) == 0.0
    # f32 path: finite and sane at every scale (no floor blowup)
    for a in [0.0, 1e-6, 1e-3, 0.3]:
        g = float(jax.grad(isco_radius)(jnp.float32(a)))
        assert np.isfinite(g) and abs(g) < 50.0


def test_keplerian_omega_schwarzschild():
    # Omega = r^{-3/2} for a = 0
    r = jnp.array([6.0, 10.0, 50.0])
    np.testing.assert_allclose(keplerian_omega(r, 0.0), r ** (-1.5), rtol=1e-12)


def test_metric_schwarzschild_limit():
    r, theta = 10.0, 1.1
    g = metric_coeffs(r, theta, 0.0)
    f = 1 - 2 / r
    np.testing.assert_allclose(g.g_tt, f, rtol=1e-12)
    np.testing.assert_allclose(g.g_tphi, 0.0, atol=1e-15)
    np.testing.assert_allclose(g.g_rr, -1 / f, rtol=1e-12)
    np.testing.assert_allclose(g.g_thth, -r * r, rtol=1e-12)
    np.testing.assert_allclose(g.g_phph, -r * r * np.sin(theta) ** 2, rtol=1e-12)


@pytest.mark.parametrize("a", SPINS)
def test_tetrad_orthonormal(a):
    r = jnp.array([3.0, 5.0, 20.0])
    theta = jnp.array([0.3, 1.0, jnp.pi / 2])
    V = keplerian_omega(r, a) * 0.7  # generic sub-Keplerian observer
    g = metric_coeffs(r, theta, a)
    tet = orbit_tetrad(r, theta, a, V, g)
    legs = [tet.et, tet.ephi, tet.etheta, tet.er]
    signs = [1.0, -1.0, -1.0, -1.0]
    for i, (u, su) in enumerate(zip(legs, signs)):
        for j, (v, sv) in enumerate(zip(legs, signs)):
            expected = su if i == j else 0.0
            np.testing.assert_allclose(
                metric_dot(g, u, v), expected, atol=1e-10,
                err_msg=f"tetrad legs {i},{j} spin {a}",
            )


@pytest.mark.parametrize("a", SPINS)
def test_constants_from_angles_null(a):
    """Constants built from source-frame angles must produce a null momentum."""
    r = jnp.full((16,), 5.0)
    theta = jnp.full((16,), 1e-3)
    alpha = jnp.linspace(0.1, jnp.pi - 0.1, 16)
    beta = jnp.linspace(-3.0, 3.0, 16)
    V = keplerian_omega(r, a)
    c = constants_from_angles(r, theta, alpha, beta, V, a)
    pt, pr, ptheta, pphi = momentum_from_consts(
        r, theta, c.k, c.h, c.Q, c.rdot_sign, c.thetadot_sign, a
    )
    g = metric_coeffs(r, theta, a)
    norm = metric_dot(g, (pt, pr, ptheta, pphi), (pt, pr, ptheta, pphi))
    # null condition, scaled by the energy scale pt^2
    np.testing.assert_allclose(norm / (pt * pt), 0.0, atol=1e-8)


@pytest.mark.parametrize("a", SPINS)
def test_constants_roundtrip_through_p(a):
    """constants -> momentum -> constants_from_p must be the identity."""
    r = jnp.full((8,), 7.0)
    theta = jnp.full((8,), 0.8)
    alpha = jnp.linspace(0.2, 2.8, 8)
    beta = jnp.linspace(-2.0, 2.0, 8)
    V = keplerian_omega(r, a)
    c = constants_from_angles(r, theta, alpha, beta, V, a)
    pt, pr, ptheta, pphi = momentum_from_consts(
        r, theta, c.k, c.h, c.Q, c.rdot_sign, c.thetadot_sign, a
    )
    c2 = constants_from_p(r, theta, pt, pr, ptheta, pphi, a)
    np.testing.assert_allclose(c2.k, c.k, rtol=1e-9)
    np.testing.assert_allclose(c2.h, c.h, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(c2.Q, c.Q, rtol=1e-8, atol=1e-9)


def test_geodesic_rates_conserve_carter():
    """rho^4 thetadot^2 + (a k cos + h cot)(a k cos - h cot) == Q identically."""
    a = 0.9
    r = jnp.array([2.5, 4.0, 11.0])
    theta = jnp.array([0.4, 1.2, 2.2])
    k = jnp.array([1.0, 1.0, 1.0])
    h = jnp.array([2.0, -1.5, 0.3])
    Q = jnp.array([3.0, 5.0, 0.7])
    rates = geodesic_rates(r, theta, k, h, Q, 1.0, 1.0, a)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    rhosq = r * r + (a * cos_t) ** 2
    lhs = rates.thetadot_sq * rhosq * rhosq
    rhs = Q + (k * a * cos_t + h * cos_t / sin_t) * (k * a * cos_t - h * cos_t / sin_t)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


@pytest.mark.parametrize("a", [0.0, 0.5, 0.998])
def test_circular_orbit_velocity_is_timelike_keplerian(a):
    r = jnp.array([6.0, 10.0, 30.0])
    u, omega = circular_orbit_velocity(r, a)
    g = metric_coeffs(r, jnp.full_like(r, jnp.pi / 2), a)
    np.testing.assert_allclose(metric_dot(g, u, u), 1.0, rtol=1e-10)
    np.testing.assert_allclose(omega, keplerian_omega(r, a), rtol=1e-10)


def test_lorentz_factor_static_observer():
    """A ZAMO has gamma = 1 measured by itself."""
    a = 0.9
    r = jnp.array([4.0, 8.0])
    theta = jnp.full_like(r, jnp.pi / 2)
    g = metric_coeffs(r, theta, a)
    tet = orbit_tetrad(r, theta, a, g.omega, g)
    gamma, v = lorentz_factor(r, theta, tet.et, a)
    np.testing.assert_allclose(gamma, 1.0, rtol=1e-10)
    for comp in v:
        np.testing.assert_allclose(comp, 0.0, atol=1e-10)


def test_gram_schmidt_matches_orbit_tetrad():
    """For a circular-orbit 4-velocity, Gram-Schmidt must reproduce the
    analytic orbiting tetrad (up to the reference's theta-leg orientation)."""
    a = 0.7
    r = jnp.array([5.0, 12.0])
    theta = jnp.full_like(r, jnp.pi / 2)
    u, V = circular_orbit_velocity(r, a)
    gs = gram_schmidt_tetrad(r, theta, u, a)
    an = orbit_tetrad(r, theta, a, V)
    for leg_gs, leg_an, flip in [
        (gs.et, an.et, 1.0),
        (gs.ephi, an.ephi, 1.0),
        (gs.etheta, an.etheta, -1.0),  # reference theta-leg points to -theta
        (gs.er, an.er, 1.0),
    ]:
        for cg, ca in zip(leg_gs, leg_an):
            np.testing.assert_allclose(cg, flip * ca, atol=1e-9)


def test_gram_schmidt_orthonormal_plunge():
    a = 0.998
    r_isco = float(isco_radius(a))
    r = jnp.array([r_isco * 0.9, r_isco * 0.6])
    theta = jnp.full_like(r, jnp.pi / 2)
    u = plunge_velocity(r, a)
    g = metric_coeffs(r, theta, a)
    np.testing.assert_allclose(metric_dot(g, u, u), 1.0, rtol=1e-8)
    tet = gram_schmidt_tetrad(r, theta, u, a)
    legs = [tet.et, tet.ephi, tet.etheta, tet.er]
    signs = [1.0, -1.0, -1.0, -1.0]
    for i in range(4):
        for j in range(4):
            expected = signs[i] if i == j else 0.0
            np.testing.assert_allclose(
                metric_dot(g, legs[i], legs[j]), expected, atol=1e-8
            )


def test_disc_areas_flat_space_limit():
    """Far from the hole, the annulus area tends to the flat 2*pi*r*dr
    (per dphi: r * dr * dphi)."""
    a = 0.9
    r, dr, dphi = 1e4, 10.0, 0.1
    area = rel_disc_area(r, dr, dphi, a)
    np.testing.assert_allclose(area, r * dr * dphi, rtol=1e-3)
    coord = coordinate_disc_area(r, dr, a)
    np.testing.assert_allclose(coord, r * dr, rtol=1e-3)


def test_integrate_disc_area_positive_and_monotonic():
    a = 0.998
    a1 = integrate_disc_area(2.0, 4.0, a)
    a2 = integrate_disc_area(2.0, 8.0, a)
    assert float(a1) > 0
    assert float(a2) > float(a1)
    # forcing Keplerian everywhere changes the plunge-region weighting only
    a3 = integrate_disc_area(2.0, 4.0, a, force_keplerian=True)
    assert float(a3) > 0


def test_cartesian_roundtrip():
    x, y, z = bl_to_cartesian(5.0, 0.7, 1.3, 0.9)
    np.testing.assert_allclose(
        x * x + y * y, (25.0 + 0.81) * np.sin(0.7) ** 2, rtol=1e-12
    )
    np.testing.assert_allclose(z, 5.0 * np.cos(0.7), rtol=1e-12)
