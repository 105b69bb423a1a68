"""Oracles for the lamppost / healpix app layer.

Round-4 verdict: ``apps/lamppost.py`` (source selector + fate
classification) and the healpix app reductions had zero coverage. Targets
match the reference diagnostics:
  * ``source_solid_angle.cpp:1-141`` — direction-grid solid-angle closure;
  * ``pointsource_sky_discfrac.cpp`` — integrated fate fractions, checked
    against an independent classification of the same traced batch and
    against the FATE sky map of ``pointsource_sky.cpp:1-103``;
  * ``angdist_jetpoint.cpp:1-174`` — relativistic beaming moves the fate
    balance the right way;
  * ``healpix_to_disc.cpp`` — solid-angle-uniform (HEALPix) and
    grid-uniform (cos alpha, beta) isotropic sources must give the SAME
    disc illumination integral after weighting, tying the healpix app to
    the golden-tested emissivity pipeline.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytrace_tpu.geometry import isco_radius, metric_coeffs
from raytrace_tpu.ops import trace_auto
from raytrace_tpu.ops.redshift import apply_redshift, range_phi, redshift_start
from raytrace_tpu.rays import RAY_STATUS_DEST, RAY_STATUS_HORIZON, RAY_STATUS_RLIM
from raytrace_tpu.sources import PointSourceGrid, point_source

SPIN = 0.9
SRC = (0.0, 5.0, 1e-3, 0.0)


# ----------------------------------------------------------------------------
# solid-angle closure (source_solid_angle.cpp capability)


def test_solid_angle_closure_full_grid():
    """A (cos alpha, beta) grid covering the near-full sphere must close to
    its analytic solid angle; the app's own exit status enforces 2%."""
    from raytrace_tpu.apps.lamppost import main_solid_angle

    assert main_solid_angle(["--spin=0.9", "--dcosalpha=0.05",
                             "--dbeta=0.05"]) == 0


def test_solid_angle_closure_quantitative():
    """Live-cell count x cell solid angle == analytic coverage, and the
    near-full grid covers ~4 pi (the 0.5% polar-cap exclusion is the grid's
    own [-0.995, 0.995] limits)."""
    grid = PointSourceGrid.from_steps(0.01, 0.02)
    rays = point_source(SRC, 0.0, SPIN, grid)
    live = int((np.asarray(rays.steps) == 0).sum())
    measured = live * grid.dcosalpha * grid.dbeta
    expected = (grid.cosalphamax - grid.cosalpha0) * (grid.betamax - grid.beta0)
    # fencepost truncation of the ctor means measured can exceed expected by
    # up to one cell row/column (pointsource.cpp:16-17 convention)
    assert abs(measured / expected - 1.0) < 0.02
    assert abs(measured / (4 * np.pi) - 0.995) < 0.02


# ----------------------------------------------------------------------------
# fate fractions (pointsource_sky_discfrac.cpp / pointsource_sky.cpp)

_FATE_ARGS = ["--spin=0.9", "--source=0 5 1e-3 0", "--dcosalpha=0.1",
              "--dbeta=0.2", "--r_esc=50", "--steplim=8000"]


def _independent_fates():
    """Classify the same workload directly through the ops layer — the
    oracle for the app's _trace_fates glue."""
    grid = PointSourceGrid.from_steps(0.1, 0.2)
    rays = point_source(SRC, 0.0, SPIN, grid)
    live = np.asarray(rays.steps) == 0
    traced = redshift_start(rays, SPIN, V=0.0)
    out = trace_auto(traced, SPIN, method="rk45", r_max=50.0, steplim=8000)
    out = range_phi(out)
    out = apply_redshift(out, SPIN, V=-1.0)
    st = np.asarray(out.status)
    r_end = np.asarray(out.r)
    r_isco = float(isco_radius(SPIN))
    disc = live & ((st & RAY_STATUS_DEST) != 0) & (r_end >= r_isco)
    esc = live & ((st & RAY_STATUS_RLIM) != 0)
    cap = live & (((st & RAY_STATUS_HORIZON) != 0)
                  | (((st & RAY_STATUS_DEST) != 0) & (r_end < r_isco)))
    n = live.sum()
    return disc.sum() / n, esc.sum() / n, cap.sum() / n, int(n)


def test_sky_discfrac_matches_independent_classification(tmp_path):
    from raytrace_tpu.apps.lamppost import main_sky_discfrac

    out = tmp_path / "frac.dat"
    assert main_sky_discfrac([f"--outfile={out}"] + _FATE_ARGS) == 0
    row = np.loadtxt(out)
    disc, esc, cap, n = _independent_fates()
    assert row[3] == n
    assert row[0] == pytest.approx(disc, abs=1e-12)
    assert row[1] == pytest.approx(esc, abs=1e-12)
    assert row[2] == pytest.approx(cap, abs=1e-12)
    # every live ray is classified on this workload
    assert row[:3].sum() == pytest.approx(1.0, abs=1e-9)


def test_sky_map_consistent_with_discfrac(tmp_path):
    """The FATE sky map integrates to the discfrac fractions (two apps, one
    truth)."""
    from raytrace_tpu.apps.lamppost import main_sky, main_sky_discfrac
    from raytrace_tpu.io import read_fits

    sky = tmp_path / "sky.fits"
    frac = tmp_path / "frac.dat"
    assert main_sky([f"--outfile={sky}"] + _FATE_ARGS) == 0
    assert main_sky_discfrac([f"--outfile={frac}"] + _FATE_ARGS) == 0
    fate = read_fits(str(sky))["FATE"]
    row = np.loadtxt(frac)
    n = (fate >= 0).sum()
    assert n == row[3]
    assert (fate == 1).sum() / n == pytest.approx(row[0], abs=1e-12)
    assert (fate == 2).sum() / n == pytest.approx(row[1], abs=1e-12)
    assert (fate == 0).sum() / n == pytest.approx(row[2], abs=1e-12)
    # landing radii of disc rays are outside the ISCO
    land = read_fits(str(sky))["LAND_R"]
    assert (land[fate == 1] >= float(isco_radius(SPIN)) - 1e-9).all()


def _discfrac_row(tmp_path, name, extra):
    from raytrace_tpu.apps.lamppost import main_sky_discfrac

    out = tmp_path / name
    args = [f"--outfile={out}", "--spin=0.9", "--source=0 4 1e-3 0",
            "--dcosalpha=0.1", "--dbeta=0.2", "--r_esc=50",
            "--steplim=8000"] + extra
    assert main_sky_discfrac(args) == 0
    return np.loadtxt(out)


def test_jet_beaming_shifts_fates(tmp_path):
    """An outward-moving jet source beams its rest-frame-isotropic emission
    away from the hole: escape fraction rises, capture fraction falls vs the
    static source (angdist_jetpoint.cpp capability). A plunging source at
    the same radius beams inward: capture rises."""
    static = _discfrac_row(tmp_path, "static.dat", [])
    jet = _discfrac_row(tmp_path, "jet.dat", ["--v_jet=0.3"])
    assert jet[1] > static[1] + 0.05  # escape up
    assert jet[2] < static[2]  # capture down
    # plunge mode is only defined INSIDE the ISCO (2.32 at spin 0.9: the
    # carried k/h are the ISCO orbit's) and a STATIC frame is spacelike
    # inside the equatorial ergosphere (r = 2), so compare against a
    # CIRCULAR-orbit frame at the same radius, deep enough that the plunge
    # has real infall speed: r = 1.7
    from raytrace_tpu.geometry import keplerian_omega

    eq = f"--source=0 1.7 {np.pi/2 - 1e-3} 0"
    fine = ["--dcosalpha=0.05", "--dbeta=0.1"]
    orbit_in = _discfrac_row(
        tmp_path, "orbit_in.dat",
        [eq, f"--V={float(keplerian_omega(1.7, 0.9))}"] + fine)
    plunge = _discfrac_row(tmp_path, "plunge.dat", [eq, "--plunge=1"] + fine)
    assert plunge[2] > orbit_in[2] + 0.05  # infall beaming: capture up
    assert plunge[1] < orbit_in[1]  # escape down


def test_superluminal_jet_flags_all_rays_nonphysical():
    """v_jet is a COORDINATE dr/dt (same convention as the reference's
    et = {1/sqrt(g00 + g11 V^2), V/sqrt(...)}, jetpointsource.cpp:186):
    where g00 + g11 v^2 < 0 the frame is superluminal and every launched
    ray must carry a non-physical status, not silently trace."""
    from raytrace_tpu.apps.lamppost import _build_source, _trace_fates
    from raytrace_tpu.config import Config

    # at r = 4, spin 0.9, theta ~ 0: g_tt ~ 0.52, g_rr ~ -1.9 -> v = 0.6
    # gives g_tt + g_rr v^2 < 0
    argv = ["--spin=0.9", "--source=0 4 1e-3 0", "--v_jet=0.6",
            "--dcosalpha=0.4", "--dbeta=0.8", "--r_esc=50", "--steplim=2000"]
    cfg = Config(argv)
    grid = PointSourceGrid.from_steps(0.4, 0.8)
    rays, spin, _ = _build_source(cfg, grid)
    out, fate, live = _trace_fates(cfg, rays, spin, grid)
    assert (fate[live] == -1).all()  # no ray classified into a real fate


def test_arbitrary_velocity_ut_solve_matches_orbit_mode():
    """The u_r/u_theta/u_phi source mode solves u^t from the normalisation
    quadratic (lamppost.py:_build_source). Oracle: for a pure azimuthal
    velocity matching the Keplerian angular velocity it must reproduce the
    orbit-mode source exactly (same conserved quantities per ray)."""
    from raytrace_tpu.apps.lamppost import _build_source
    from raytrace_tpu.config import Config
    from raytrace_tpu.geometry import keplerian_omega

    r_s = 6.0
    omega = float(keplerian_omega(r_s, SPIN))
    g = metric_coeffs(jnp.asarray(r_s), jnp.asarray(np.pi / 2 - 1e-3), SPIN)
    ut = 1.0 / np.sqrt(float(g.g_tt) + 2 * float(g.g_tphi) * omega
                       + float(g.g_phph) * omega**2)
    uph = omega * ut

    grid = PointSourceGrid.from_steps(0.2, 0.4)
    base = [f"--source=0 {r_s} {np.pi/2 - 1e-3} 0", "--spin=0.9"]
    rays_vel, _, mode_v = _build_source(Config(base + [f"--u_phi={uph}",
                                                       "--u_r=0"]), grid)
    rays_orb, _, mode_o = _build_source(Config(base + [f"--V={omega}"]), grid)
    assert "vel" in mode_v and "orbit" in mode_o
    for field in ("k", "h", "Q", "pr", "ptheta"):
        a = np.asarray(getattr(rays_vel, field, np.nan))
        b = np.asarray(getattr(rays_orb, field, np.nan))
        if a.shape == b.shape and a.size:
            np.testing.assert_allclose(a, b, rtol=1e-10, atol=1e-12,
                                       err_msg=field)


# ----------------------------------------------------------------------------
# healpix illumination vs the golden-tested emissivity pipeline


def test_healpix_to_disc_matches_emissivity_profile(tmp_path):
    """Solid-angle-uniform (HEALPix, 4pi/npix per pixel) and grid-uniform
    (cos alpha, beta: dcosalpha*dbeta per cell) isotropic static sources
    must integrate to the same per-annulus illumination:

      flux_healpix_bin  =  (dca * dbeta) * n_cells * area_bin * flux_emis_bin

    since emissivity's flux column is sum(1/g)/(n_cells * area)
    (emissivity.cpp:108-121) while healpix's is (4pi/npix) * sum(1/g)."""
    from raytrace_tpu.apps.emissivity import compute
    from raytrace_tpu.apps.healpix_apps import main_to_disc

    spin, h = 0.998, 5.0
    r_min, r_disc, n_r = 2.0, 50.0, 10

    out = tmp_path / "healpix.dat"
    assert main_to_disc([
        f"--outfile={out}", f"--spin={spin}", f"--source=0 {h} 1e-3 0",
        "--order=4", "--r_esc=100", f"--rmin={r_min}", f"--r_disc={r_disc}",
        f"--Nr={n_r}", "--steplim=8000",
    ]) == 0
    hp = np.loadtxt(out)  # r, counts, flux, emis, <g>

    grid = PointSourceGrid.from_steps(0.02, 0.1)
    emis = compute(
        spin, [0.0, h, 1e-3, 0.0], V=0.0, grid=grid, r_max=100.0,
        r_min=r_min, r_disc=r_disc, n_r=n_r, gamma=2.0, steplim=8000,
    )
    cell_omega = 0.02 * 0.1
    n_cells = ((grid.cosalphamax - grid.cosalpha0) / grid.dcosalpha) * (
        (grid.betamax - grid.beta0) / grid.dbeta)

    # HEALPix centre directions live on ~4*nside-1 discrete polar rings;
    # per-bin landings beat against the 10 log bins (ring quantisation, a
    # property of the reference source too, healpix.h RING scheme) — so
    # compare CUMULATIVE illumination integrals, which are ring-robust.
    cum_hp_flux = np.cumsum(hp[:, 2])
    cum_em_flux = np.cumsum(cell_omega * n_cells * emis["area"] * emis["flux"])
    ratio = cum_hp_flux[2:] / cum_em_flux[2:]  # skip low-count inner bins
    assert np.all(np.abs(ratio - 1.0) < 0.1), f"cumulative flux ratio {ratio}"
    # NOTE emissivity's emis column has no 1/n_cells normalisation
    # (emissivity_bin_weights: flux = 1/(N g) but emis = 1/g^gamma)
    cum_hp_e = np.cumsum(hp[:, 3])
    cum_em_e = np.cumsum(cell_omega * emis["area"] * emis["emis"])
    ratio_e = cum_hp_e[2:] / cum_em_e[2:]
    assert np.all(np.abs(ratio_e - 1.0) < 0.1), f"cumulative emis ratio {ratio_e}"
    # mean redshift per bin is source-binning-independent (gate on counts)
    gate = (hp[:, 1] >= 60) & (emis["rays"] >= 60)
    assert gate.sum() >= 5
    np.testing.assert_allclose(hp[gate, 4], emis["redshift"][gate], rtol=0.05)


def test_healpix_disc_photonfrac_matches_return_radiation(tmp_path):
    """The healpix disc-source fractions agree with the grid-source
    return_radiation fractions at the same launch radius (both isotropic in
    the co-orbiting frame; healpix_disc_source_photonfrac.cpp capability)."""
    from raytrace_tpu.apps.healpix_apps import main_disc_photonfrac
    from raytrace_tpu.apps.return_radiation import photon_fractions

    out = tmp_path / "hp_frac.dat"
    assert main_disc_photonfrac([
        f"--outfile={out}", "--spin=0.9", "--order=4", "--r_source=6",
        "--r_esc=100", "--steplim=8000",
    ]) == 0
    row = np.loadtxt(out)  # r, return, escape, capture, n

    grid = PointSourceGrid.from_steps(0.05, 0.1)
    res = photon_fractions(6.0, 0.9, grid, r_esc=100.0, r_disc=100.0,
                           steplim=8000)
    n = res["n_live"]
    # the grid source emits into the FULL sphere: its downward half returns
    # to the disc immediately, while the healpix disc_source mode emits only
    # the upward hemisphere — so grid fractions are (1 + hp)/2 for return
    # and hp/2 for escape/capture
    assert abs(res["n_return"] / n - 0.5 * (1.0 + row[1])) < 0.04
    assert abs(res["n_escape"] / n - 0.5 * row[2]) < 0.04
    assert abs(res["n_horizon"] / n - 0.5 * row[3]) < 0.04
