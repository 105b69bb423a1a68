"""Conformance sweep over EVERY console script.

Round-4 verdict: 31 of the 33 ``rt-*`` mains had never been executed by a
test — par parsing, output writing and the auto-shard path were unexercised.
This module parametrizes over the full ``[project.scripts]`` table in
pyproject.toml (so a new script without a sweep entry fails loudly), drives
each main end-to-end with a minimal workload into a tmp dir, and asserts
exit 0 plus that the outputs parse (FITS readable, text columns finite,
expected shapes).

Where the reference ships a ``par_example`` (the 8 apps under
/root/reference/par_example/), the CLI is driven through a par FILE carrying
exactly those keys (values downsized for test runtime) — exercising the
reference's par-file convention per app (e.g. emissivity.cpp:32-55) plus the
round-4 wired keys (show_progress, rk45_tol, precision, max_tstep,
theta_lim, plane_phi0). Everything else is driven with --key=value args
(par_args.h:18 convention).
"""

from __future__ import annotations

import importlib
import os
import re
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


def _console_scripts() -> dict[str, str]:
    """Parse [project.scripts] out of pyproject.toml (no tomllib dependency
    on exotic formats — the table is plain ``name = "module:func"`` lines)."""
    text = (REPO / "pyproject.toml").read_text()
    block = re.search(r"\[project\.scripts\](.*?)(?:\n\[|\Z)", text, re.S).group(1)
    scripts = {}
    for line in block.splitlines():
        m = re.match(r'\s*([\w-]+)\s*=\s*"([\w\.]+:[\w]+)"', line)
        if m:
            scripts[m.group(1)] = m.group(2)
    return scripts


SCRIPTS = _console_scripts()


def _resolve(entry: str):
    mod, _, fn = entry.partition(":")
    return getattr(importlib.import_module(mod), fn)


# ----------------------------------------------------------------------------
# validators


def _load_text(path, min_rows=1, n_cols=None, allow_nan=False):
    out = np.loadtxt(path)
    out = np.atleast_2d(out)
    assert out.shape[0] >= min_rows, f"{path}: {out.shape}"
    if n_cols is not None:
        assert out.shape[1] == n_cols, f"{path}: {out.shape}"
    if allow_nan:
        # empty-bin mean columns are NaN by design (matching the reference's
        # 0/0 prints, emissivity.cpp:136-148) — but infinities never are
        assert not np.isinf(out).any(), f"{path}: inf values"
        assert np.isfinite(out).any(axis=0).all(), f"{path}: all-NaN column"
    else:
        assert np.isfinite(out).all(), f"{path}: non-finite values"
    return out


def _load_fits(path, extnames=()):
    from raytrace_tpu.io import read_fits

    maps = read_fits(str(path))
    for name in extnames:
        assert name in maps, f"{path}: missing extension {name} ({list(maps)})"
        assert np.isfinite(maps[name]).all(), f"{path}: ext {name} non-finite"
    return maps


def _trajectory_rows(path):
    """trace_rays dumps: blank-line-separated 4-column blocks."""
    rows = [
        [float(v) for v in line.split()]
        for line in Path(path).read_text().splitlines()
        if line.strip()
    ]
    assert rows, f"{path}: empty trajectory dump"
    assert all(len(r) == 4 for r in rows)
    assert np.isfinite(np.asarray(rows)).all()
    return np.asarray(rows)


# ----------------------------------------------------------------------------
# per-script specs
#
# Each spec is a callable tmp_path -> (argv, check) where check() validates
# the outputs. Workloads are deliberately tiny: coarse direction grids,
# small image planes, capped steplim.

IMG_EXTS = ("FLUX", "RADIUS", "PHI", "ENSHIFT", "TIME", "EMIS", "NRAYS")


def _par(tmp_path, name, text):
    par = tmp_path / name
    par.write_text(text)
    return [f"--parfile={par}"]


def spec_emissivity(tmp):
    out = tmp / "emis.dat"
    # exact reference key set (par_example/emissivity.par_example), coarser
    # grid + runtime caps
    argv = _par(tmp, "emissivity.par", f"""
outfile = {out}
source = 0 5 1E-3 1.5707
V = 0
spin = 0.998
dcosalpha = 0.1
dbeta = 0.2
Nr = 15
logbin_r = 1
show_progress = 1
r_esc = 100
steplim = 4000
""")

    def check():
        cols = _load_text(out, min_rows=15, n_cols=7, allow_nan=True)
        assert cols[:, 2].sum() > 0  # rays landed

    return argv, check


def spec_emissivity_rd(tmp):
    out = tmp / "emis_rd.dat"
    argv = _par(tmp, "emissivity_rd.par", f"""
outfile = {out}
theta_lim = 1.5707963
source = 0 5 1E-3 1.5707
V = 0
spin = 0.998
dcosalpha = 0.1
dbeta = 0.2
Nr = 15
logbin_r = 1
show_progress = 1
r_esc = 100
steplim = 4000
integrator = rk4
""")
    return argv, lambda: _load_text(out, min_rows=15, n_cols=7, allow_nan=True)


def _spec_disc_image(tmp, extra=""):
    out = tmp / "img.fits"
    argv = _par(tmp, "disc_image.par", f"""
outfile = {out}
dist = 500
incl = 60
spin = 0.998
r_disc = 15
x0 = -15
xmax = 15
y0 = -15
ymax = 15
Nx = 16
img_Nx = 8
q1 = 3
rb1 = 4
q2 = 3
rb2 = 10
q3 = 3
max_tstep = 1
integrator = rk45
rk45_tol = 1e-8
steplim = 20000
{extra}
""")

    def check():
        maps = _load_fits(out, IMG_EXTS)
        assert maps["NRAYS"].sum() > 0
        assert maps["FLUX"].shape == (8, 8)

    return argv, check


def spec_disc_image(tmp):
    return _spec_disc_image(tmp)


def spec_disc_image_rd(tmp):
    return _spec_disc_image(tmp, "theta_lim = 1.5707963\nintegrator = rk4")


def spec_disc_image_isco(tmp):
    return _spec_disc_image(tmp)


def _spec_caustic(tmp, target_keys, exts):
    out = tmp / "caustic.fits"
    argv = _par(tmp, "caustic.par", f"""
outfile = {out}
dist = 500
incl = 30
plane_phi0 = 0
spin = 0.998
x0 = -10
xmax = 10
y0 = -10
ymax = 10
Nx = 8
Ny = 8
integrator = rk45
rk45_tol = 1e-8
precision = 100
show_progress = 1
steplim = 20000
{target_keys}
""")

    def check():
        maps = _load_fits(out)
        for name in exts:
            assert name in maps, f"missing {name} in {list(maps)}"

    return argv, check


def spec_caustic_discplane(tmp):
    return _spec_caustic(tmp, "r_disc = 50\nbundle_eps_frac = 0.01",
                         ("DET_J", "HIT", "RADIUS"))


def spec_caustic_plane(tmp):
    return _spec_caustic(tmp, "z_s = 500\nbundle_eps_frac = 0.01",
                         ("DET_J", "HIT_PLANE", "X_S", "Y_S"))


def spec_caustic_sourceplane(tmp):
    return _spec_caustic(tmp, "r_lim = 1000",
                         ("DET_J", "ESCAPED", "THETA_S", "PHI_S"))


def spec_trace_rays(tmp):
    out = tmp / "paths.dat"
    argv = _par(tmp, "trace_rays.par", f"""
outfile = {out}
source = 0 5 1E-3 0
V = -1
spin = 0.998
dcosalpha = 0.5
dbeta = 1.5
r_max = 20
write_step = 5
n_snapshots = 256
write_cartesian = 1
""")
    return argv, lambda: _trajectory_rows(out)


def spec_trace_rays_imageplane(tmp):
    out = tmp / "paths_ip.dat"
    argv = [
        f"--outfile={out}", "--dist=100", "--incl=60", "--spin=0.9",
        "--x0=-6", "--xmax=6", "--Nx=3", "--y0=-6", "--ymax=6", "--Ny=3",
        "--write_step=10", "--n_snapshots=256",
    ]
    return argv, lambda: _trajectory_rows(out)


def spec_trace_rays_jetpoint(tmp):
    out = tmp / "paths_jet.dat"
    argv = [f"--outfile={out}", "--spin=0.9", "--v_jet=0.5",
            "--r_max=20", "--n_snapshots=256"]
    return argv, lambda: _trajectory_rows(out)


def spec_trace_rays_vel(tmp):
    out = tmp / "paths_vel.dat"
    argv = [f"--outfile={out}", "--spin=0.9", "--u_phi=0.02",
            "--r_max=20", "--n_snapshots=256"]
    return argv, lambda: _trajectory_rows(out)


_OUTFLOW_KEYS = [
    "--dist=200", "--incl=60", "--spin=0.9", "--x0=-40", "--xmax=40",
    "--Nx=8", "--source_vel=0.2", "--wind_rin=10", "--wind_rout=50",
    "--en0=0.5", "--enmax=2.0", "--Nen=40", "--source_radius=2",
    "--steplim=4000",
]


def spec_outflow(tmp):
    out = tmp / "outflow.dat"
    argv = [f"--outfile={out}"] + _OUTFLOW_KEYS

    def check():
        cols = _load_text(out, n_cols=4)
        assert (cols[:, 2] >= 0).all()

    return argv, check


def spec_outflow_ent(tmp):
    out = tmp / "outflow_ent.dat"
    argv = [f"--outfile={out}", "--Nt=4", "--t0=0", "--dt=200"] + _OUTFLOW_KEYS

    def check():
        _load_text(out, n_cols=2)
        resp = np.load(f"{out}.ent.npz")["response"]
        assert resp.shape[-1] == 4 or resp.shape[0] == 4  # (en, t) bins

    return argv, check


def spec_outflow_spectrum(tmp):
    out = tmp / "outflow_spec.dat"
    spec = tmp / "lines.dat"
    spec.write_text("0.9 0.5\n1.0 1.0\n1.1 0.25\n")
    argv = [f"--outfile={out}", f"--spectrum={spec}"] + _OUTFLOW_KEYS
    return argv, lambda: _load_text(out, n_cols=2)


def spec_outflow_emis_bin(tmp):
    out = tmp / "emis_bin"
    argv = [
        f"--outfile={out}", "--map_Nr=8", "--map_Ntheta=4", "--map_Nphi=8",
        "--map_rmax=60",
    ] + _OUTFLOW_KEYS

    def check():
        data = np.load(f"{out}.npz")
        assert data["emissivity"].shape == (8, 4, 8)

    return argv, check


def spec_pointsource_mapper(tmp):
    out = tmp / "psmap.fits"
    argv = _par(tmp, "mapper.par", f"""
outfile = {out}
source = 0 5 1E-3 0
V = 0
spin = 0.998
dcosalpha = 0.2
dbeta = 0.4
map_r0 = 1.5
map_rmax = 50
map_Nr = 10
map_Ntheta = 5
map_Nphi = 8
steplim = 4000
""")

    def check():
        maps = _load_fits(out, ("TIME", "REDSHIFT", "NRAYS", "VOLUME"))
        assert maps["NRAYS"].sum() > 0
        data = np.load(f"{out}.npz")
        assert data["count"].shape == (10, 5, 8)

    return argv, check


def spec_pcyg(tmp):
    out = tmp / "pcyg.dat"
    argv = [f"--outfile={out}", "--Nx=40", "--Nen=50", "--dz=0.05"]

    def check():
        cols = _load_text(out, min_rows=50, n_cols=4)
        # P-Cygni morphology: the blueshifted (high-energy here: E_loc =
        # 1/(gamma(1 - v costh)) > 1 for approaching wind) absorption trough
        # dips below the continuum, while the low-energy side stays at it
        total = cols[:, 3]
        cont = np.median(total[:10])
        assert total[len(total) // 2:].min() < 0.9 * cont  # blue trough
        assert np.allclose(total[:5], cont, rtol=0.01)  # red side ~continuum
        assert cols[:, 1].sum() > 0  # line emission accumulated

    return argv, check


def spec_disc_photonfrac(tmp):
    out = tmp / "frac.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--dcosalpha=0.2", "--dbeta=0.4",
        "--Nr=2", "--r_esc=50", "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, min_rows=2, n_cols=5)
        # fractions sum to ~1 over return/escape/capture
        assert np.allclose(cols[:, 1:4].sum(axis=1), 1.0, atol=0.05)

    return argv, check


def spec_disc_photonfrac_r(tmp):
    out = tmp / "frac_r.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--r_source=6",
        "--dcosalpha=0.2", "--dbeta=0.4", "--Nr=10", "--r_esc=50",
        "--r_disc=50", "--steplim=3000",
    ]
    return argv, lambda: _load_text(out, min_rows=10, n_cols=5, allow_nan=True)


def spec_disc_return_angdist(tmp):
    out = tmp / "angdist_ret.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--r_source=6",
        "--dcosalpha=0.2", "--dbeta=0.4", "--Nang=10", "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, min_rows=10, n_cols=4)
        assert cols[:, 1].sum() > 0

    return argv, check


def spec_pointsource_sky(tmp):
    out = tmp / "sky.fits"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--source=0 5 1e-3 0",
        "--dcosalpha=0.2", "--dbeta=0.4", "--r_esc=50", "--steplim=3000",
    ]

    def check():
        maps = _load_fits(out, ("FATE", "LAND_R", "REDSHIFT", "TIME"))
        assert set(np.unique(maps["FATE"])) <= {-1, 0, 1, 2}

    return argv, check


def spec_pointsource_sky_discfrac(tmp):
    out = tmp / "discfrac.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--source=0 5 1e-3 0",
        "--dcosalpha=0.2", "--dbeta=0.4", "--r_esc=50", "--steplim=8000",
    ]

    def check():
        cols = _load_text(out, n_cols=4)
        assert abs(cols[0, :3].sum() - 1.0) < 0.05

    return argv, check


def spec_angdist(tmp):
    out = tmp / "angdist.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--v_jet=0.4", "--Nang=10",
        "--dcosalpha=0.2", "--dbeta=0.4", "--r_esc=50", "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, min_rows=10, n_cols=6)
        assert cols[:, 1].sum() > 0

    return argv, check


def spec_raystart(tmp):
    out = tmp / "raystart.dat"
    argv = [f"--outfile={out}", "--spin=0.9", "--dcosalpha=0.2", "--dbeta=0.4"]
    return argv, lambda: _load_text(out, n_cols=9)


def spec_source_solid_angle(tmp):
    # closure diagnostic: exit status IS the assertion (no outfile)
    return ["--spin=0.9", "--dcosalpha=0.05", "--dbeta=0.05"], lambda: None


def spec_pointsource_to_disc(tmp):
    out = tmp / "to_disc.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--source=0 5 1e-3 0",
        "--dcosalpha=0.2", "--dbeta=0.4", "--r_esc=50", "--r_disc=30",
        "--Nr=10", "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, min_rows=10, n_cols=4)
        assert (cols[:, 1] >= 0).all() and cols[:, 1].sum() > 0

    return argv, check


def spec_healpix_to_disc(tmp):
    out = tmp / "healpix_disc.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--source=0 5 1e-3 0",
        "--order=2", "--r_esc=50", "--r_disc=30", "--Nr=10",
        "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, min_rows=10, n_cols=5, allow_nan=True)
        assert cols[:, 1].sum() > 0

    return argv, check


def spec_healpix_disc_photonfrac(tmp):
    out = tmp / "healpix_frac.dat"
    argv = [
        f"--outfile={out}", "--spin=0.9", "--order=2", "--r_source=6",
        "--r_esc=50", "--steplim=3000",
    ]

    def check():
        cols = _load_text(out, n_cols=5)
        assert abs(cols[0, 1:4].sum() - 1.0) < 0.05

    return argv, check


def spec_disc_wind(tmp):
    out = tmp / "disc_wind.dat"
    argv = [f"--outfile={out}", "--Nen=40", "--incl=45", "--tau_tot=1.0"]

    def check():
        cols = _load_text(out, min_rows=40, n_cols=3)
        assert (cols[:, 2] >= 0).all()

    return argv, check


def spec_pcyg_sei(tmp):
    out = tmp / "pcyg_sei.dat"
    argv = [f"--outfile={out}", "--Nen=40"]

    def check():
        cols = _load_text(out, min_rows=40, n_cols=3)
        flux = cols[:, 2]
        # P-Cygni: absorption below 1 blueward, emission above 1 redward
        assert flux.min() < 0.95 and flux.max() > 1.01

    return argv, check


def spec_line_profile(tmp):
    out = tmp / "line.dat"
    argv = [
        f"--outfile={out}", "--dist=500", "--incl=60", "--spin=0.9",
        "--r_disc=15", "--Nx=24", "--Nen=30", "--steplim=20000",
    ]

    def check():
        cols = _load_text(out, min_rows=30, n_cols=2)
        assert cols[:, 1].sum() > 0

    return argv, check


def spec_perf_test(tmp):
    argv = _par(tmp, "perf.par", """
spin = 0.998
source = 0 5 1E-3 0
dcosalpha = 0.5
dbeta = 0.5
r_max = 100
steplim = 3000
methods = euler
repeats = 1
""")
    return argv, lambda: None


SPECS = {
    "rt-emissivity": spec_emissivity,
    "rt-emissivity-rd": spec_emissivity_rd,
    "rt-disc-image": spec_disc_image,
    "rt-disc-image-rd": spec_disc_image_rd,
    "rt-disc-image-isco": spec_disc_image_isco,
    "rt-caustic-discplane": spec_caustic_discplane,
    "rt-caustic-plane": spec_caustic_plane,
    "rt-caustic-sourceplane": spec_caustic_sourceplane,
    "rt-trace-rays": spec_trace_rays,
    "rt-trace-rays-imageplane": spec_trace_rays_imageplane,
    "rt-trace-rays-jetpoint": spec_trace_rays_jetpoint,
    "rt-trace-rays-vel": spec_trace_rays_vel,
    "rt-outflow": spec_outflow,
    "rt-outflow-ent": spec_outflow_ent,
    "rt-outflow-spectrum": spec_outflow_spectrum,
    "rt-outflow-emis-bin": spec_outflow_emis_bin,
    "rt-pointsource-mapper": spec_pointsource_mapper,
    "rt-pcyg": spec_pcyg,
    "rt-disc-photonfrac": spec_disc_photonfrac,
    "rt-disc-photonfrac-r": spec_disc_photonfrac_r,
    "rt-disc-return-angdist": spec_disc_return_angdist,
    "rt-pointsource-sky": spec_pointsource_sky,
    "rt-pointsource-sky-discfrac": spec_pointsource_sky_discfrac,
    "rt-angdist": spec_angdist,
    "rt-raystart": spec_raystart,
    "rt-source-solid-angle": spec_source_solid_angle,
    "rt-pointsource-to-disc": spec_pointsource_to_disc,
    "rt-healpix-to-disc": spec_healpix_to_disc,
    "rt-healpix-disc-photonfrac": spec_healpix_disc_photonfrac,
    "rt-disc-wind": spec_disc_wind,
    "rt-pcyg-sei": spec_pcyg_sei,
    "rt-line-profile": spec_line_profile,
    "rt-perf-test": spec_perf_test,
}


def test_every_console_script_has_a_sweep_entry():
    assert set(SPECS) == set(SCRIPTS), (
        f"sweep out of sync with pyproject [project.scripts]: "
        f"missing={set(SCRIPTS) - set(SPECS)}, stale={set(SPECS) - set(SCRIPTS)}"
    )


@pytest.fixture(autouse=True)
def _no_env_leak():
    """Apps with show_progress=1 setdefault RT_PROGRESS into the process
    environment; keep each sweep case hermetic."""
    saved = {k: os.environ.get(k) for k in ("RT_PROGRESS", "RT_PROFILE")}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


@pytest.mark.parametrize("script", sorted(SCRIPTS))
def test_cli(script, tmp_path):
    main = _resolve(SCRIPTS[script])
    argv, check = SPECS[script](tmp_path)
    assert main(argv) == 0, f"{script} exited non-zero"
    check()


def test_line_profile_image_postprocess_mode(tmp_path):
    """rt-line-profile's second mode: post-process a disc-image FITS
    (python/line_from_image.ipynb capability). The folded profile from the
    written FITS must match the direct-pipeline profile computed from the
    same maps in-process."""
    img_argv, _ = _spec_disc_image(tmp_path)
    assert _resolve(SCRIPTS["rt-disc-image"])(img_argv) == 0

    from raytrace_tpu.apps.line_profile import main as lp_main

    out = tmp_path / "line_img.dat"
    assert lp_main([
        f"--outfile={out}", f"--image={tmp_path / 'img.fits'}",
        "--line_en=6.4", "--Nen=40",
    ]) == 0
    cols = _load_text(out, min_rows=40, n_cols=2)
    assert cols[:, 1].sum() > 0

    # oracle: fold the FITS maps directly through the tested helper
    from raytrace_tpu.apps.line_profile import line_profile_from_maps
    from raytrace_tpu.io import read_fits

    maps = read_fits(str(tmp_path / "img.fits"))
    centres, prof = line_profile_from_maps(
        np.nan_to_num(maps["FLUX"].astype(float)),
        np.nan_to_num(maps["ENSHIFT"].astype(float)),
        maps["NRAYS"].astype(float), 6.4, 40,
    )
    np.testing.assert_allclose(cols[:, 0], centres)
    np.testing.assert_allclose(cols[:, 1], prof, rtol=1e-4,
                               atol=1e-6 * max(prof.max(), 1e-30))
