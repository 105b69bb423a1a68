"""Integrator tests following the reference test strategy (SURVEY.md §4):
cross-integrator consistency on termination boundaries and statistically
binned observables — never per-ray bitwise agreement, which the photon-sphere
separatrix makes impossible (the reference's own integrators disagree there).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.destinations import DiscWithISCO, ThetaLimit
from raytrace_tpu.geometry import horizon_radius, isco_radius
from raytrace_tpu.ops import StepControl, trace, trace_compacted
from raytrace_tpu.ops.redshift import apply_redshift, range_phi, redshift_start
from raytrace_tpu.rays import (
    RAY_STATUS_DEST,
    RAY_STATUS_HORIZON,
    RAY_STATUS_RLIM,
    RAY_STATUS_STEPLIM,
)
from raytrace_tpu.sources import PointSourceGrid, point_source

SPIN = 0.998
R_MAX = 500.0
STEPLIM_TEST = 3000  # generous for this small grid; keeps CPU tests quick


def _lamppost(d=0.2):
    grid = PointSourceGrid.from_steps(d, d, -0.95, 0.95, -np.pi, np.pi)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
    return rays


def _boundaries(out):
    st = np.asarray(out.status)
    disc = (st & RAY_STATUS_DEST) != 0
    horizon = (st & RAY_STATUS_HORIZON) != 0
    rlim = (st & RAY_STATUS_RLIM) != 0
    stuck = (st & RAY_STATUS_STEPLIM) != 0
    return disc, horizon, rlim, stuck


@pytest.fixture(scope="module")
def traced():
    rays = _lamppost()
    outs = {
        m: trace(rays, SPIN, method=m, r_max=R_MAX, steplim=STEPLIM_TEST)
        for m in ("euler", "rk4", "rk45")
    }
    return rays, outs


def test_every_ray_terminates(traced):
    rays, outs = traced
    live = np.asarray(rays.steps) == 0
    for m, out in outs.items():
        disc, horizon, rlim, stuck = _boundaries(out)
        classified = disc | horizon | rlim | stuck
        assert classified[live].all(), f"{m}: unterminated rays"
        # dead padding must stay dead and unclassified
        assert not classified[~live].any(), f"{m}: padding rays were traced"
        assert (np.asarray(out.steps)[~live] == -1).all()


def test_all_boundaries_reached(traced):
    _, outs = traced
    for m, out in outs.items():
        disc, horizon, rlim, stuck = _boundaries(out)
        assert disc.sum() > 100, f"{m}: too few disc hits"
        assert horizon.sum() > 5, f"{m}: no horizon captures"
        assert rlim.sum() > 50, f"{m}: no escapes"
        # stuck rays are a small minority. The gate is deliberately looser
        # than it needs to be on any one build: which photon-sphere rays
        # exhaust the 3000-step test budget is chaotic (fp-rounding
        # sensitive), so the count jitters by a few rays across math-
        # equivalent op orderings; the reference's analogous criterion
        # tolerates < 10% boundary divergence (raytrace_rk4_test.cpp:139).
        assert stuck.sum() < 0.08 * disc.sum(), f"{m}: too many stuck rays"


def test_disc_hits_land_on_plane(traced):
    _, outs = traced
    for m, out in outs.items():
        disc, *_ = _boundaries(out)
        theta = np.asarray(out.theta)[disc]
        # Euler lands within its step of the plane; RK4/RK45 clamp the final
        # step onto it (raytracer.cpp:243)
        tol = 2e-2 if m == "euler" else 5e-3
        assert np.abs(theta - np.pi / 2).max() < tol, f"{m}: disc plane missed"


def test_cross_integrator_boundary_agreement(traced):
    """The reference's raytrace_rk4_test PASS criterion: < 10% of valid rays
    diverge to a different termination boundary (raytrace_rk4_test.cpp:139)."""
    _, outs = traced
    ref_disc, ref_hor, ref_rlim, ref_stuck = _boundaries(outs["rk4"])
    for m in ("euler", "rk45"):
        disc, hor, rlim, stuck = _boundaries(outs[m])
        valid = ~(ref_stuck | stuck)
        agree = (disc == ref_disc) & (hor == ref_hor) & (rlim == ref_rlim)
        frac = agree[valid].mean()
        assert frac > 0.9, f"rk4 vs {m}: only {frac:.1%} boundary agreement"


def test_rk45_vs_rk4_disc_radii_statistics(traced):
    """Matched disc-hit rays should land at closely matching radii except for
    the chaotic separatrix minority (emissivity_rk45_test.cpp methodology)."""
    _, outs = traced
    d4, *_ = _boundaries(outs["rk4"])
    d45, *_ = _boundaries(outs["rk45"])
    both = d4 & d45
    r4 = np.asarray(outs["rk4"].r)[both]
    r45 = np.asarray(outs["rk45"].r)[both]
    rel = np.abs(r4 - r45) / r4
    assert np.median(rel) < 1e-3
    assert (rel < 0.05).mean() > 0.85


def test_conserved_quantities_not_touched(traced):
    rays, outs = traced
    for m, out in outs.items():
        np.testing.assert_array_equal(np.asarray(out.k), np.asarray(rays.k))
        np.testing.assert_array_equal(np.asarray(out.h), np.asarray(rays.h))
        np.testing.assert_array_equal(np.asarray(out.Q), np.asarray(rays.Q))


def test_final_momentum_consistent_with_constants(traced):
    """The stored momentum must satisfy the geodesic relations at the final
    position — i.e. the integrator's state stays on the Carter-separated
    solution manifold (conservation is exact by construction)."""
    from raytrace_tpu.geometry import momentum_from_consts

    _, outs = traced
    out = outs["rk45"]
    disc, *_ = _boundaries(out)
    pt, pr, pth, pph = momentum_from_consts(
        out.r, out.theta, out.k, out.h, out.Q, out.rdot_sign, out.thetadot_sign, SPIN
    )
    for stored, derived in [(out.pt, pt), (out.pphi, pph)]:
        rel = np.abs(np.asarray(stored - derived) / np.asarray(derived))[disc]
        assert np.median(rel) < 1e-6


def test_trace_compacted_matches_trace():
    rays = _lamppost(0.35)
    a = trace(rays, SPIN, method="rk45", r_max=R_MAX, steplim=STEPLIM_TEST)
    b = trace_compacted(
        rays, SPIN, method="rk45", r_max=R_MAX, steplim=STEPLIM_TEST, phase_iters=256
    )
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_allclose(np.asarray(a.r), np.asarray(b.r), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(a.steps), np.asarray(b.steps))


def test_steplim_negates_steps():
    rays = _lamppost(0.35)
    out = trace(rays, SPIN, method="rk45", r_max=R_MAX, steplim=40)
    _, _, _, stuck = _boundaries(out)
    assert stuck.sum() > 0
    assert (np.asarray(out.steps)[stuck] < 0).all()


def test_schwarzschild_radial_rays():
    """a = 0 sanity: a radially outward photon escapes, inward falls in."""
    import raytrace_tpu.rays as R
    from raytrace_tpu.geometry import constants_from_angles

    base = R.blank_batch(2)
    r = jnp.array([10.0, 10.0])
    theta = jnp.array([jnp.pi / 2, jnp.pi / 2])
    alpha = jnp.array([0.0, jnp.pi])  # cos(alpha)=+1 outward, -1 inward
    beta = jnp.zeros(2)
    c = constants_from_angles(r, theta, alpha, beta, 0.0, 0.0)
    rays = base.replace(
        r=r, theta=theta, phi=jnp.zeros(2), t=jnp.zeros(2),
        k=c.k, h=c.h, Q=c.Q, rdot_sign=c.rdot_sign, thetadot_sign=c.thetadot_sign,
        steps=jnp.zeros(2, jnp.int32),
    )
    out = trace(rays, 0.0, method="rk45", dest=ThetaLimit(0.0), r_max=100.0,
                steplim=STEPLIM_TEST)
    st = np.asarray(out.status)
    assert st[0] & RAY_STATUS_RLIM
    assert st[1] & RAY_STATUS_HORIZON
    assert abs(np.asarray(out.r)[1] - float(horizon_radius(0.0))) < 1e-3


def test_disc_with_isco_destination():
    """Rays crossing the equator inside the ISCO must continue to the horizon
    instead of stopping (imageplane_disc_image_isco.cpp:1-8). Uses a = 0.5,
    whose wide ISCO-horizon gap (4.23 vs 1.87) guarantees such crossings."""
    a = 0.5
    grid = PointSourceGrid.from_steps(0.2, 0.2, -0.95, 0.95, -np.pi, np.pi)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=a, grid=grid)
    r_isco = isco_radius(a)
    dest = DiscWithISCO(r_isco=r_isco, r_out=30.0)
    out = trace(rays, a, method="rk4", dest=dest, r_max=R_MAX, steplim=STEPLIM_TEST)
    disc, horizon, rlim, stuck = _boundaries(out)
    r_disc = np.asarray(out.r)[disc]
    assert disc.sum() > 0
    assert (r_disc >= float(r_isco) - 1e-6).all()
    assert (r_disc <= 30.0 + 1e-6).all()
    # compared to the plain theta_lim disc, inside-ISCO crossers now fall
    # through to the horizon and beyond-r_out crossers continue outwards
    plain = trace(rays, a, method="rk4", r_max=R_MAX, steplim=STEPLIM_TEST)
    pd, ph, *_ = _boundaries(plain)
    assert horizon.sum() > ph.sum()
    assert disc.sum() < pd.sum()


def test_redshift_pipeline_smoke():
    rays = _lamppost()
    rays = redshift_start(rays, SPIN, V=0.0)
    out = trace(rays, SPIN, method="rk45", r_max=R_MAX, steplim=STEPLIM_TEST)
    out = range_phi(out)
    out = apply_redshift(out, SPIN, V=-1.0)
    disc, *_ = _boundaries(out)
    g = np.asarray(out.redshift)[disc & (np.asarray(out.r) > float(isco_radius(SPIN)))]
    assert np.isfinite(g).all() and (g > 0).all()
    assert 0.05 < g.min() < 1.0 < g.max() < 2.0
    phi = np.asarray(out.phi)[np.asarray(out.steps) > 0]
    assert (phi >= -np.pi).all() and (phi < np.pi).all()


def test_trace_auto_dispatch():
    """trace_auto: XLA path on CPU, identical results to trace_compacted;
    unsupported destinations always fall back to the XLA path."""
    from raytrace_tpu.destinations import FlatPlane
    from raytrace_tpu.ops import trace_auto

    rays = _lamppost(0.3)
    a = trace_auto(rays, SPIN, method="rk4", r_max=R_MAX, steplim=STEPLIM_TEST)
    b = trace_compacted(rays, SPIN, method="rk4", r_max=R_MAX, steplim=STEPLIM_TEST)
    np.testing.assert_array_equal(np.asarray(a.status), np.asarray(b.status))
    np.testing.assert_array_equal(np.asarray(a.r), np.asarray(b.r))

    plane = FlatPlane(z_s=100.0, incl=jnp.float64(1.0), phi0=0.0)
    out = trace_auto(rays, SPIN, method="rk4", dest=plane, r_max=R_MAX,
                     steplim=STEPLIM_TEST)
    assert (np.asarray(out.steps) != 0).any()


def test_rk45_frozen_lane_carry_sanitised():
    """FSAL-carry hygiene (round-4 advice): a lane that goes inactive with
    non-finite carried rates must have them zeroed in the scan carry —
    otherwise 0*inf in multiply transposes NaN-poisons ensemble gradients
    under trace_scan(method="rk45")."""
    import jax

    from raytrace_tpu.ops.integrate import (
        RK45_STEPLIM,
        StepControl,
        _fresh_propagation_state,
        _rk45_body,
        _seed_rk45_rates,
    )

    rays = _lamppost(0.5)
    ctrl = StepControl()
    horizon = horizon_radius(SPIN)
    st = _fresh_propagation_state(rays, SPIN, horizon, "rk45", ctrl)
    n = st.n_rays
    # freeze every odd lane (steps < 0 == dead) and poison its carry with inf
    dead = (jnp.arange(n) % 2).astype(bool)
    st = st.replace(steps=jnp.where(dead, -1, st.steps))
    rates = _seed_rk45_rates(st, st.active, SPIN)
    rates = jax.tree.map(
        lambda a: jnp.where(dead, jnp.inf, a), rates
    )
    st2, step2, rates2 = _rk45_body(
        st, SPIN, horizon, ThetaLimit(jnp.pi / 2), R_MAX, RK45_STEPLIM, ctrl,
        st.active, st.dt, rates,
    )
    dead2 = ~np.asarray(st2.active)
    for leaf in jax.tree.leaves(rates2):
        leaf = np.asarray(leaf)
        assert np.isfinite(leaf[dead2 & np.asarray(dead)]).all()
    # live lanes advanced normally
    assert np.asarray(st2.steps)[~np.asarray(dead)].max() >= 1
