"""Caustic-map tests: Jacobian structure, image orders, suppression pass."""

import numpy as np
import pytest

from raytrace_tpu.apps.caustics import (
    SENTINEL,
    compute,
    suppress_checkerboard,
)
from raytrace_tpu.sources import ImagePlaneGrid

SPIN = 0.998


@pytest.fixture(scope="module")
def disc_maps():
    grid = ImagePlaneGrid.from_steps(-12.0, 12.0, 0.6, -12.0, 12.0, 0.6)
    return compute(SPIN, 500.0, 60.0, grid, target="disc", r_disc=15.0,
                   method="rk4", steplim=15000)


def test_disc_jacobian_has_both_parities(disc_maps):
    """Lensing must produce parity-flipped (det J < 0) secondary images."""
    sj = disc_maps["sign_j"]
    assert (sj > 0).sum() > 100
    assert (sj < 0).sum() > 30


def test_disc_sentinel_and_suppression(disc_maps):
    dj = disc_maps["det_j"]
    assert (dj == SENTINEL).sum() > 0
    assert disc_maps["n_suppressed"] >= 0
    # hits where no J defined are NaN, not garbage
    bad = ~np.isfinite(dj) | (dj == SENTINEL)
    assert bad.sum() < dj.size


def test_disc_direct_image_magnification_weak_field():
    """In the weak-deflection regime (impact parameters ~50 r_g) the lens map
    tends to the pure deprojection of the inclined disc, whose Jacobian is
    det J = 1/cos(incl). Order-0 pixels far out must approach that."""
    grid = ImagePlaneGrid.from_steps(35.0, 55.0, 1.0, -8.0, 8.0, 1.0)
    maps = compute(SPIN, 500.0, 60.0, grid, target="disc", r_disc=70.0,
                   method="rk4", steplim=15000)
    dj = maps["det_j"]
    sel = (maps["order"] == 0) & np.isfinite(dj) & (dj != SENTINEL) & (
        maps["radius"] > 30
    )
    assert sel.sum() > 50
    expect = 1.0 / np.cos(np.deg2rad(60.0))  # = 2
    med = np.median(dj[sel])
    assert 0.7 * expect < med < 1.4 * expect, f"median detJ {med:.3f}, expect ~{expect}"


def test_sphere_orders_and_shadow():
    grid = ImagePlaneGrid.from_steps(-9.0, 9.0, 0.3, -9.0, 9.0, 0.3)
    maps = compute(SPIN, 500.0, 60.0, grid, target="sphere", r_lim=750.0,
                   method="rk4", steplim=15000)
    assert maps["diag"]["horizon"] > 50  # shadow exists
    orders = set(maps["order"][maps["order"] >= 0].tolist())
    assert 0 in orders and 1 in orders  # photon ring present
    # shadow pixels are contiguous near the (offset) centre: escaped=0 there
    esc = maps["escaped"]
    assert (esc == 0).sum() == maps["diag"]["horizon"] + maps["diag"]["steplim"]


def test_plane_target_runs():
    grid = ImagePlaneGrid.from_steps(-10.0, 10.0, 1.0, -10.0, 10.0, 1.0)
    maps = compute(SPIN, 500.0, 60.0, grid, target="plane", z_s=200.0,
                   r_lim=900.0, method="rk4", steplim=15000)
    assert maps["diag"]["hits"] > 50
    xs, ys = maps["x_s"], maps["y_s"]
    hit = maps["hit"] > 0
    assert np.isfinite(xs[hit]).all() and np.isfinite(ys[hit]).all()
    # the far-field source-plane position approximates the impact parameter
    # (weak deflection far out)


def test_suppress_checkerboard_unit():
    det = np.ones((5, 5))
    sign = np.ones((5, 5))
    sign[2, 2] = -1.0  # isolated opposite-sign pixel
    d2, s2, n = suppress_checkerboard(det, sign)
    assert n == 1
    assert d2[2, 2] == SENTINEL and s2[2, 2] == 0
    # a genuine sign boundary (half plane) is NOT suppressed
    sign2 = np.ones((6, 6))
    sign2[3:, :] = -1.0
    _, _, n2 = suppress_checkerboard(np.ones((6, 6)), sign2)
    assert n2 == 0


GOLDEN_BIN = "tests/golden/caustic_discplane_a0.998_i60_rk45.bin"


def test_caustic_matches_reference_binary():
    """Per-pixel comparison vs the reference caustic_discplane binary
    (compiled from /root/reference with a raw-dump FITS shim; config:
    dist 500, incl 60, spin 0.998, r_disc 20, 81x81 pixels, bundle mode
    eps_frac 0.01, RK45). The bundle Jacobian uses central differences over
    +-0.003 r_g satellite offsets, so sub-percent det J agreement requires
    landing-point agreement at the 1e-5 level — this exercises the RK45
    destination step-limit clamp and the crossing refinement end to end.

    (The reference's RK4 destination propagator has no boundary step clamp
    — raytracer.cpp:1036-1254 — so only its recommended RK45 caustic
    configuration produces noise-free Jacobians to compare against.)"""
    raw = np.fromfile(GOLDEN_BIN, "<f8")
    n = 81 * 81
    names = ["det_j", "sign_j", "order", "hit", "radius", "phi",
             "x_disc", "y_disc", "redshift"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(81, 81) for i, nm in enumerate(names)}

    grid = ImagePlaneGrid.from_steps(-12.0, 12.0, 0.3, -12.0, 12.0, 0.3)
    maps = compute(SPIN, 500.0, 60.0, grid, target="disc", r_disc=20.0,
                   method="rk45", steplim=60000, bundle_eps_frac=0.01)

    hit_m = maps["hit"].astype(bool)
    hit_r = ref["hit"] > 0.5
    assert (hit_m == hit_r).mean() > 0.985
    both = hit_m & hit_r

    for f in ("radius", "redshift"):
        rel = np.abs(maps[f][both] / ref[f][both] - 1)
        assert np.median(rel) < 1e-5, f"{f} median {np.median(rel)}"

    om = maps["order"]
    good = both & np.isfinite(om)
    assert (om[good] == ref["order"][good]).mean() > 0.999

    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr)
          & (dm != SENTINEL) & (np.abs(dr) < 1e29) & (om == ref["order"]))
    assert ok.sum() > 3000
    rel = np.abs(dm[ok] / dr[ok] - 1)
    assert np.median(rel) < 0.02, f"det_j median {np.median(rel)}"
    assert np.percentile(rel, 90) < 0.10
    assert (np.sign(dm[ok]) == np.sign(dr[ok])).mean() > 0.99


GOLDEN_SOURCEPLANE = "tests/golden/caustic_sourceplane_a0.998_i30_rk45.bin"


def test_caustic_sourceplane_matches_reference_binary():
    """Per-pixel comparison vs the reference caustic_sourceplane binary
    (caustic_sourceplane.cpp:195-260; sphere target at r_lim with
    (theta_s, phi_s) landing coordinates and bundle Jacobians on the
    celestial sphere; config: dist 500, incl 30, spin 0.998, r_lim 1000,
    82x82 pixels, RK45 tol 1e-8). Escape/order maps must match exactly;
    landing angles to ~1e-10 rad; det J sub-1e-4 where orders agree."""
    raw = np.fromfile(GOLDEN_SOURCEPLANE, "<f8")
    n = 82 * 82
    names = ["det_j", "sign_j", "order", "escaped", "theta_s", "phi_s",
             "rdot_flips", "equat_cross"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(82, 82) for i, nm in enumerate(names)}

    dx = 24.0 / 81
    grid = ImagePlaneGrid.from_steps(-12.0, 12.0, dx, -12.0, 12.0, dx)
    maps = compute(SPIN, 500.0, 30.0, grid, target="sphere", r_lim=1000.0,
                   method="rk45", steplim=100000)

    em = maps["escaped"].astype(bool)
    er = ref["escaped"] > 0.5
    assert (em == er).mean() > 0.999
    both = em & er

    assert np.median(np.abs(maps["theta_s"][both] - ref["theta_s"][both])) < 1e-7
    d = np.abs(maps["phi_s"][both] - ref["phi_s"][both])
    d = np.minimum(d, 2 * np.pi - d)
    assert np.median(d) < 1e-7

    om = maps["order"]
    good = both & np.isfinite(ref["order"])
    assert (om[good] == ref["order"][good]).mean() > 0.999

    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr) & (dm != SENTINEL)
          & (np.abs(dr) < 1e29) & (om == ref["order"]))
    assert ok.sum() > 4000
    rel = np.abs(dm[ok] / dr[ok] - 1)
    assert np.median(rel) < 1e-4, f"det_j median {np.median(rel)}"
    assert np.percentile(rel, 90) < 1e-3
    assert (np.sign(dm[ok]) == np.sign(dr[ok])).mean() > 0.999


GOLDEN_PLANE = "tests/golden/caustic_plane_a0.998_i30_rk45.bin"


def test_caustic_plane_matches_reference_binary():
    """Source-plane lensing maps vs the reference caustic_plane binary
    (dist 500, incl 30, z_s 500, spin 0.998, 81x81, bundles, RK45)."""
    raw = np.fromfile(GOLDEN_PLANE, "<f8")
    n = 81 * 81
    names = ["det_j", "sign_j", "order", "hit", "x_s", "y_s",
             "rdot_flips", "equat_cross"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(81, 81) for i, nm in enumerate(names)}

    grid = ImagePlaneGrid.from_steps(-10.0, 10.0, 0.25, -10.0, 10.0, 0.25)
    maps = compute(SPIN, 500.0, 30.0, grid, target="plane", z_s=500.0,
                   method="rk45", steplim=100000, bundle_eps_frac=0.01)

    hm = maps["hit"].astype(bool)
    hr = ref["hit"] > 0.5
    assert (hm == hr).mean() > 0.985
    both = hm & hr
    for f in ("x_s", "y_s"):
        d = np.abs(maps[f][both] - ref[f][both])
        assert np.median(d) < 1e-4, f"{f} median {np.median(d)}"
    om = maps["order"]
    good = both & np.isfinite(om)
    assert (om[good] == ref["order"][good]).mean() > 0.999
    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr) & (dm != SENTINEL)
          & (np.abs(dr) < 1e29) & (om == ref["order"]))
    assert ok.sum() > 2000
    rel = np.abs(dm[ok] / dr[ok] - 1)
    assert np.median(rel) < 0.01 and np.percentile(rel, 90) < 0.05
    assert (np.sign(dm[ok]) == np.sign(dr[ok])).mean() > 0.99
