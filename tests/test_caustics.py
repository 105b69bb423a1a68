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
