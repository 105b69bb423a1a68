"""Disc-image and caustic app tests: physics invariants on small grids plus
(when the golden dump exists) statistical comparison against the reference
binary's accumulation arrays."""

import numpy as np
import pytest

from raytrace_tpu.apps.caustics import compute as caustic_compute
from raytrace_tpu.apps.imageplane_disc_image import compute as image_compute, powerlaw3
from raytrace_tpu.geometry import isco_radius
from raytrace_tpu.sources import ImagePlaneGrid

SPIN = 0.998


@pytest.fixture(scope="module")
def small_image():
    grid = ImagePlaneGrid.from_steps(-20.0, 20.0, 0.5, -20.0, 20.0, 0.5)
    out = image_compute(
        SPIN, 500.0, 60.0, grid, r_disc=20.0, img_nx=40, img_ny=40,
        method="rk4", steplim=30000,
    )
    return grid, out


def test_image_basic_structure(small_image):
    grid, out = small_image
    c = out["counts"]
    assert c.sum() > 1000
    r = out["r"][c > 0]
    assert r.min() >= float(isco_radius(SPIN)) - 1e-6
    assert r.max() < 20.0


def test_image_doppler_asymmetry(small_image):
    """The approaching side of the disc must be blueshifted relative to the
    receding side — the cardinal observable of a disc image."""
    _, out = small_image
    esh = np.nan_to_num(out["enshift"])  # 1/g map
    half = esh.shape[0] // 2
    left, right = esh[:half].sum(), esh[half:].sum()
    assert abs(left - right) / max(left, right) > 0.15


def test_image_shadow_is_empty(small_image):
    """Central pixels (inside the shadow) see no disc beyond the ISCO gap —
    the count map must have a hole near the centre rows for the face-on
    part... at incl 60 the shadow is offset but pixels map inside ISCO."""
    _, out = small_image
    c = out["counts"]
    # some interior pixels empty (shadow/ISCO gap), some exterior filled
    assert (c == 0).sum() > 50
    assert (c > 0).sum() > 300


def test_image_variants_agree():
    """plain vs rd vs isco variants measure the same disc where they
    overlap; the ISCO variant must not add hits inside the ISCO."""
    grid = ImagePlaneGrid.from_steps(-15.0, 15.0, 1.0, -15.0, 15.0, 1.0)
    kw = dict(r_disc=15.0, img_nx=30, img_ny=30, method="rk4", steplim=12000)
    a = image_compute(SPIN, 500.0, 60.0, grid, variant="plain", **kw)
    b = image_compute(SPIN, 500.0, 60.0, grid, variant="rd", **kw)
    c = image_compute(SPIN, 500.0, 60.0, grid, variant="isco", **kw)
    na, nb, nc = a["counts"].sum(), b["counts"].sum(), c["counts"].sum()
    # the rd variant's hit test (theta >= theta_lim - 1e-3, …_rd.cpp:119) is
    # geometrically looser than plain's z < 1e-2 cut, so expect ~10% skew
    assert abs(na - nb) / na < 0.15
    assert abs(na - nc) / na < 0.05
    # overlapping filled pixels: mean radius agrees
    both = (a["counts"] > 0) & (c["counts"] > 0)
    rel = np.abs(a["r"][both] - c["r"][both]) / a["r"][both]
    assert np.median(rel) < 0.02


def test_powerlaw3_continuity():
    r = np.array([3.999999, 4.000001, 9.999999, 10.000001])
    v = np.asarray(powerlaw3(r, 3.0, 4.0, 2.0, 10.0, 3.5))
    assert abs(v[0] / v[1] - 1) < 1e-4
    assert abs(v[2] / v[3] - 1) < 1e-4


GOLDEN_BIN = "tests/golden/disc_image_a0.998_i60_rk4.bin"


def _read_image_golden(path, img_n=40):
    raw = open(path, "rb").read()
    n = img_n * img_n
    maps = {}
    off = 0
    for name in ["flux", "r", "phi", "enshift", "time", "emis"]:
        maps[name] = np.frombuffer(raw, dtype="<f8", count=n, offset=off).reshape(img_n, img_n)
        off += n * 8
    counts = np.fromfile(path + ".counts", dtype="<i4").reshape(img_n, img_n)
    return maps, counts


def test_image_matches_reference_binary(small_image):
    """Per-pixel comparison vs the reference imageplane_disc_image
    accumulation arrays (config: dist 500, incl 60, spin 0.998, r_disc 20,
    81x81 rays -> 40x40 image, RK4, steplim 30000). Same-integrator
    same-precision runs agree to ~1e-4 per pixel; the thresholds leave
    room for separatrix chatter."""
    grid, out = small_image
    maps, counts = _read_image_golden(GOLDEN_BIN)

    mine_c = out["counts"]
    assert abs(int(mine_c.sum()) - int(counts.sum())) / counts.sum() < 0.05
    good = (counts >= 3) & (mine_c >= 3)
    assert good.sum() > 500
    for name, key, tol in [("r", "r", 0.005), ("enshift", "enshift", 0.005),
                           ("flux", "flux", 0.01), ("time", "time", 0.005),
                           ("emis", "emis", 0.01)]:
        ref = maps[name][good]
        mine = out[key][good]
        rel = np.abs(mine / ref - 1)
        assert np.median(rel) < tol, f"{name}: median dev {np.median(rel):.5f}"


GOLDEN_ISCO = "tests/golden/disc_image_isco_a0.998_i60_rk45.bin"


def test_image_isco_matches_reference_binary():
    """Per-pixel comparison vs the reference imageplane_disc_image_isco
    accumulation arrays (imageplane_disc_image_isco.cpp:113; config: dist
    500, incl 60, spin 0.998, r_disc 20, 82x82 rays -> 40x40 image, RK45
    tol 1e-8). The ISCO variant's theta_prev-aware crossing detector and
    the RK45 destination clamp are both on this path; ray-count parity
    must be exact and per-pixel observables sub-1e-4 at count>=3."""
    maps, counts = _read_image_golden(GOLDEN_ISCO)

    dx = 40.0 / 81
    grid = ImagePlaneGrid.from_steps(-20.0, 20.0, dx, -20.0, 20.0, dx)
    out = image_compute(SPIN, 500.0, 60.0, grid, r_disc=20.0,
                        img_nx=40, img_ny=40, variant="isco",
                        method="rk45", steplim=100000)

    mine_c = out["counts"]
    assert int(mine_c.sum()) == int(counts.sum())
    good = (counts >= 3) & (mine_c >= 3)
    assert good.sum() > 500
    for name, key, tol in [("r", "r", 1e-4), ("enshift", "enshift", 1e-4),
                           ("flux", "flux", 1e-3), ("time", "time", 1e-4),
                           ("emis", "emis", 1e-3)]:
        rel = np.abs(out[key][good] / maps[name][good] - 1)
        assert np.median(rel) < tol, f"{name}: median dev {np.median(rel):.2e}"
