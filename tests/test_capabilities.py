"""Tests for the re-derived capability set: moving sources, HEALPix,
volumetric mapper, wind radiative transfer, P-Cygni, returning radiation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytrace_tpu.geometry import (
    circular_orbit_velocity,
    isco_radius,
    metric_coeffs,
    metric_dot,
    momentum_from_consts,
)
from raytrace_tpu.geometry.healpix import n_pixels, pixel_vectors, ring_to_xyf
from raytrace_tpu.ops.mapper import MapperGrid, average_maps, cell_volumes, map_rays
from raytrace_tpu.ops.redshift import redshift_start
from raytrace_tpu.ops.source_tracer import (
    EnergyTimeBins,
    SphericalStop,
    WindModel,
    run_source_trace,
)
from raytrace_tpu.sources import (
    ImagePlaneGrid,
    PointSourceGrid,
    healpix_point_source,
    image_plane,
    jet_point_source,
    point_source,
    point_source_vel,
)

SPIN = 0.9


def _grid(d=0.25, db=0.5):
    return PointSourceGrid.from_steps(d, db, -0.9, 0.9, -3.0, 3.0)


class TestMovingSources:
    def test_jet_rays_are_null(self):
        rays = jet_point_source((0.0, 5.0, 1e-3, 0.0), 0.5, SPIN, _grid())
        pt, pr, pth, pph = momentum_from_consts(
            rays.r, rays.theta, rays.k, rays.h, rays.Q,
            rays.rdot_sign, rays.thetadot_sign, SPIN,
        )
        g = metric_coeffs(rays.r, rays.theta, SPIN)
        norm = metric_dot(g, (pt, pr, pth, pph), (pt, pr, pth, pph))
        np.testing.assert_allclose(np.asarray(norm / (pt * pt)), 0.0, atol=1e-12)

    def test_vel_source_reduces_to_orbit_source(self):
        u4, V = circular_orbit_velocity(jnp.asarray(6.0), SPIN)
        pos = (0.0, 6.0, jnp.pi / 2 - 1e-3, 0.0)
        pv = point_source_vel(pos, u4, SPIN, _grid())
        ps = point_source(pos, V, SPIN, _grid())
        live = np.asarray(ps.steps) == 0
        for f in ("k", "h", "Q", "rdot_sign", "thetadot_sign"):
            np.testing.assert_allclose(
                np.asarray(getattr(pv, f))[live],
                np.asarray(getattr(ps, f))[live],
                rtol=1e-8, atol=1e-10, err_msg=f,
            )

    def test_jet_beaming_boosts_forward_energy(self):
        """Killing energy k of forward (outward) rays must exceed backward
        rays by the relativistic Doppler factor."""
        rays = jet_point_source((0.0, 50.0, 1e-3, 0.0), 0.6, SPIN, _grid())
        live = np.asarray(rays.steps) == 0
        cosa = np.asarray(rays.alpha)[live]
        k = np.asarray(rays.k)[live]
        fwd = k[cosa > 0.8].mean()
        back = k[cosa < -0.8].mean()
        # Doppler: E_fwd/E_back -> (1+v)/(1-v) = 4 at the poles
        assert 3.0 < fwd / back < 4.5


class TestHealpix:
    def test_pixel_count_and_unit_corners(self):
        for order in (1, 2, 3):
            corners, centres = pixel_vectors(order)
            assert corners.shape == (n_pixels(order), 4, 3)
            norms = np.linalg.norm(corners.reshape(-1, 3), axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-12)

    def test_pixels_cover_sphere_uniformly(self):
        _, centres = pixel_vectors(3)
        # mean direction vanishes and z-distribution is uniform
        assert np.abs(centres.mean(axis=0)).max() < 0.01
        z = np.sort(centres[:, 2] / np.linalg.norm(centres, axis=1))
        uniform = np.linspace(-1, 1, len(z) + 1)[:-1] + 1.0 / len(z)
        # centres are corner averages, giving a small systematic offset
        assert np.abs(z - uniform).max() < 0.06

    def test_ring_xyf_in_range(self):
        order = 3
        ix, iy, face = ring_to_xyf(order, np.arange(n_pixels(order)))
        nside = 1 << order
        assert (ix >= 0).all() and (ix < nside).all()
        assert (iy >= 0).all() and (iy < nside).all()
        assert (face >= 0).all() and (face < 12).all()

    def test_disc_source_mask_and_null(self):
        rays, npix = healpix_point_source(
            (0.0, 5.0, 1e-3, 0.0), SPIN, order=2, disc_source=True
        )
        dead = np.asarray(rays.steps) == -1
        assert 0.45 < dead.mean() < 0.55


class TestMapper:
    def test_map_accumulates_physical_redshifts(self):
        grid = _grid()
        rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=SPIN, grid=grid)
        rays = redshift_start(rays, SPIN, V=0.0)
        mg = MapperGrid(r0=1.5, r_max=50.0, n_r=12, n_theta=8, n_phi=8)
        final, maps = map_rays(rays, SPIN, mg, r_lim=50.0,
                               theta_lim=np.pi / 2, steplim=8000)
        avg = average_maps(maps)
        c = avg["count"]
        assert c.sum() > 200
        g = avg["redshift"][c > 0]
        assert np.isfinite(g).all() and (g > 0.05).all() and (g < 3).all()
        # arrival times increase with radius on average (propagation)
        t = avg["time"]
        assert np.nanmean(t[c > 0]) > 0

    def test_cell_volumes_positive_off_axis(self):
        mg = MapperGrid(r0=2.0, r_max=50.0, n_r=10, n_theta=8, n_phi=8)
        vol = np.asarray(cell_volumes(mg, SPIN))
        assert vol.shape == (10, 8, 8)
        assert (vol[:, 1:, :] > 0).all()  # interior cells

    def test_hdf5_roundtrip_reference_layout(self, tmp_path):
        """save_hdf writes the reference's exact HDF5 layout
        (mapper.h:75-107: datasets time/redshift/Nrays/volume + grid
        attributes) and load_hdf restores it losslessly — the format
        parity gap VERDICT r3 flagged (h5py is on this image; only the
        C++ HDF5 headers are absent)."""
        import h5py

        from raytrace_tpu.ops.mapper import load_hdf, save_hdf

        mg = MapperGrid(r0=1.5, r_max=40.0, n_r=6, n_theta=4, n_phi=5,
                        logbin_r=True)
        rng = np.random.default_rng(3)
        shape = (6, 4, 5)
        avg = {"time": rng.random(shape), "redshift": rng.random(shape),
               "count": rng.integers(0, 9, shape).astype(float)}
        vol = np.asarray(cell_volumes(mg, SPIN))
        path = tmp_path / "map.h5"
        save_hdf(path, mg, avg, vol, n_rays=123)

        with h5py.File(path) as f:  # reference dataset names + attributes
            assert set(f.keys()) == {"time", "redshift", "Nrays", "volume"}
            for key in ("r0", "rmax", "Nr", "dr", "logbin_r", "theta_max",
                        "Ntheta", "dtheta", "Nphi", "dphi"):
                assert key in f.attrs, key
            assert f.attrs["Nr"] == 6 and f.attrs["n_rays"] == 123

        mg2, avg2, vol2 = load_hdf(path)
        assert mg2 == mg
        np.testing.assert_array_equal(avg2["time"], avg["time"])
        np.testing.assert_array_equal(avg2["count"], avg["count"])
        np.testing.assert_array_equal(vol2, vol)


class TestSourceTracer:
    def test_wind_line_profile(self):
        ig = ImagePlaneGrid.from_steps(-40.0, 40.0, 5.0, -40.0, 40.0, 5.0)
        rays = image_plane(800.0, 60.0, ig, SPIN)
        rays = redshift_start(rays, -SPIN, V=0.0, reverse=True)
        wind = WindModel(v0=0.2)
        bins = EnergyTimeBins(en0=0.5, en_max=2.0, n_en=50, n_t=1, dt=1e5)
        final, emis, absorb, resp = run_source_trace(
            rays, -SPIN, wind, bins, stop=SphericalStop(2.0),
            r_lim=1200.0, steplim=15000,
        )
        emis = np.asarray(emis)
        assert (emis.sum(axis=1) > 0).sum() > 50  # many rays see the wind
        spec = emis.sum(axis=0)
        peak_e = bins.energies()[spec.argmax()]
        assert 0.6 < peak_e < 1.5  # line forms around the rest energy
        assert np.asarray(absorb).sum() > 0
        assert np.asarray(resp).sum() > 0


class TestPcyg:
    def test_profile_shape(self):
        from raytrace_tpu.apps.pcyg import compute

        en, em, cont, tot = (np.asarray(o) for o in compute(nx=100, n_en=150))
        assert em.sum() > 0 and cont.sum() > 0
        # emission spans the line; continuum absorption is blueward (E > 1)
        c = cont / cont.sum()
        blue = c[(en > 1.05) & (en < 1.19)].mean()
        red = c[(en > 0.85) & (en < 0.95)].mean()
        assert blue < red  # blueshifted absorption trough

    def test_continuum_tau_normalisation(self):
        from raytrace_tpu.apps.pcyg import compute

        _, _, cont1, _ = compute(nx=60, n_en=100, tau=0.5)
        _, _, cont2, _ = compute(nx=60, n_en=100, tau=3.0)
        c1 = np.asarray(cont1) / np.asarray(cont1).max()
        c2 = np.asarray(cont2) / np.asarray(cont2).max()
        assert c2.min() < c1.min()  # deeper trough at higher tau

    def test_against_reference_binary_golden(self):
        """Golden vs the reference's LIVE standalone pcyg binary
        (src/outflow/pcyg.cpp:1-158) at Nx=200, Nen=400 and otherwise its
        hard-coded parameters (rsph 10, rmin/rstar 5, V 0.2, dz 0.01,
        dens0 10, tau 1.5), produced via the verify-skill recipe.

        Column 4 (obs_total) is NOT compared: the reference accumulates its
        continuum normalisation inside the per-ray loop (pcyg.cpp:137 adds
        the RUNNING partial of obs_continuum to continuum_sum), so its
        obs_total carries a loop-order-dependent normalisation rather than
        sum(obs_continuum); we normalise by the actual sum. obs_emis and
        obs_continuum are normalisation-free and compared directly.
        """
        from raytrace_tpu.apps.pcyg import compute

        ref = np.loadtxt("tests/golden/pcyg_nx200_nen400.dat")
        en, emis, cont, _ = (np.asarray(o) for o in compute(nx=200, n_en=400))
        np.testing.assert_allclose(en, ref[:, 0], rtol=1e-8)

        nz = ref[:, 1] > 0
        # identical sets of populated energy bins
        assert ((emis > 0) == nz).all()
        rel = np.abs(emis[nz] / ref[nz, 1] - 1)
        # bin-edge fp flips (the reference accumulates z -= dz, we compute
        # z = rsph - i*dz) put a handful of (ray, z) samples in adjacent
        # bins: median agreement is ~1e-9, the p99 tail stays sub-0.5%
        assert np.median(rel) < 1e-6
        assert np.percentile(rel, 99) < 5e-3
        assert rel.max() < 0.05

        # continuum: uniform ~5e-4 offset from the reference's fp-truncated
        # central-ray index ((int)(rsph/dx) lands one pixel off axis,
        # pcyg.cpp:88) feeding tau_total; bounded well below the trough depth
        relc = np.abs(cont / ref[:, 2] - 1)
        assert relc.max() < 2e-3


class TestReturnRadiation:
    def test_fractions_behave_with_radius(self):
        from raytrace_tpu.apps.return_radiation import photon_fractions

        grid = PointSourceGrid.from_steps(0.2, 0.4)
        near = photon_fractions(2.0, 0.998, grid, steplim=8000)
        far = photon_fractions(20.0, 0.998, grid, steplim=8000)
        n_n = near["n_live"]
        n_f = far["n_live"]
        # capture fraction falls with radius; escape rises
        assert near["n_horizon"] / n_n > far["n_horizon"] / n_f
        assert near["n_escape"] / n_n < far["n_escape"] / n_f
        # returning radiation is substantial near the ISCO
        assert near["n_return"] / n_n > 0.3


class TestCheckpoint:
    def test_suspend_resume_equals_uninterrupted(self, tmp_path):
        from raytrace_tpu.ops import trace
        from raytrace_tpu.utils import load_rays, save_rays

        grid = PointSourceGrid.from_steps(0.4, 0.8)
        rays = point_source((0.0, 5.0, 1e-3, 0.0), 0.0, SPIN, grid)
        part = trace(rays, SPIN, method="rk4", r_max=200.0, steplim=8000,
                     max_iters=150)
        path = str(tmp_path / "ckpt.npz")
        save_rays(path, part, spin=SPIN)
        loaded, meta = load_rays(path)
        assert float(meta["spin"]) == SPIN
        resumed = trace(loaded, SPIN, method="rk4", r_max=200.0, steplim=8000,
                        resume=True)
        full = trace(rays, SPIN, method="rk4", r_max=200.0, steplim=8000)
        np.testing.assert_array_equal(
            np.asarray(resumed.status), np.asarray(full.status)
        )
        np.testing.assert_allclose(
            np.asarray(resumed.r), np.asarray(full.r), rtol=1e-12
        )


class TestSobolevWind:
    def test_pcyg_sei_morphology(self):
        from raytrace_tpu.apps.sobolev_wind import pcyg_sei_profile

        v = np.linspace(-1.5, 1.5, 61)
        f = np.asarray(pcyg_sei_profile(v, tau_tot=2.0, turb=0.05, n_p=80))
        # continuum far from the line
        np.testing.assert_allclose(f[0], 1.0, atol=0.05)
        np.testing.assert_allclose(f[-1], 1.0, atol=0.05)
        # absorption trough on the approaching side, within the wind speed
        i = f.argmin()
        assert f[i] < 0.6 and -1.1 < v[i] < -0.1
        # emission fills the line core
        assert f[np.abs(v).argmin()] > f[i]

    def test_disc_wind_tau_scaling_and_gradient(self):
        from raytrace_tpu.apps.sobolev_wind import WindParams, disc_wind_profile

        v = jnp.linspace(-1.5, 1.5, 41)
        f1 = np.asarray(disc_wind_profile(v, WindParams(tau_tot=0.5), n_p=80, n_phi=16))
        f2 = np.asarray(disc_wind_profile(v, WindParams(tau_tot=4.0), n_p=80, n_phi=16))
        assert f2.min() < f1.min()  # deeper trough with more optical depth

        g = jax.grad(
            lambda t: disc_wind_profile(v, WindParams(tau_tot=t), n_p=80, n_phi=16).sum()
        )(1.0)
        assert np.isfinite(float(g))

    def test_wind_cone_gates_absorption(self):
        from raytrace_tpu.apps.sobolev_wind import WindParams, disc_wind_profile

        v = jnp.linspace(-1.5, 1.5, 41)
        # pole-on view of an equatorial cone: sightline to the star misses
        # the wind -> almost no trough; wide cone -> deep trough
        narrow = np.asarray(disc_wind_profile(
            v, WindParams(tau_tot=3.0, incl=0.0, wind_angle=0.2), n_p=80, n_phi=16))
        wide = np.asarray(disc_wind_profile(
            v, WindParams(tau_tot=3.0, incl=0.0, wind_angle=2.0), n_p=80, n_phi=16))
        assert wide.min() < narrow.min()


class TestPerfHarness:
    """rt-perf-test (integrator_perf_test.cpp capability) mechanics."""

    def test_reports_stats_and_histogram(self):
        from raytrace_tpu.apps.perf_test import run_method, step_histogram
        from raytrace_tpu.ops import StepControl

        rays = point_source((0.0, 5.0, 1e-3, 0.0), 0.0, SPIN,
                            PointSourceGrid.from_steps(0.35, 0.7))
        st = run_method(rays, SPIN, "rk4", r_max=100.0, steplim=5000,
                        ctrl=StepControl())
        assert st["n_rays"] > 0 and st["steps_total"] > 0
        assert st["median"] <= st["p90"] <= st["p99"] <= st["max"]
        assert st["fevals"] == 4 * st["steps_total"]
        lines = step_histogram(st["steps"])
        assert lines and any("#" in l for l in lines)


class TestTrajectoryGolden:
    """rt-trace-rays vs the reference trace_rays binary: point-by-point
    trajectory agreement (Euler, spin 0.998, lamppost r = 5, V = 0,
    write_step 20, cartesian). The Euler march is deterministic, so matched
    rays agree to the 6-significant-digit precision of the text format."""

    GOLDEN = "tests/golden/trace_rays_a0.998_r5_euler.dat"

    @staticmethod
    def _load(path):
        trajs, cur = [], []
        for line in open(path):
            s = line.split()
            if not s:
                if cur:
                    trajs.append(np.array(cur))
                    cur = []
                continue
            cur.append([float(v) for v in s])
        if cur:
            trajs.append(np.array(cur))
        return trajs

    def test_trajectories_match_reference(self, tmp_path):
        from raytrace_tpu.apps.trace_rays import main

        out = tmp_path / "mine.dat"
        main([
            f"--outfile={out}", "--source=0 5 1E-3 0", "--V=0",
            "--spin=0.998", "--dcosalpha=0.4", "--dbeta=0.8", "--r_max=50",
            "--theta_max=1.5707963", "--write_step=20", "--integrator=euler",
        ])
        ref = self._load(self.GOLDEN)
        mine = self._load(str(out))
        assert len(mine) == len(ref) == 40

        matched = 0
        for m in mine:
            d = [np.linalg.norm(m[0] - r[0]) for r in ref]
            j = int(np.argmin(d))
            if d[j] > 1e-5:
                # the beta = -pi column launches exactly at the sin(beta)=0
                # polar turning point, where the tiny-floored sqrt (needed
                # for finite gradients, kerr.py geodesic_rates) differs
                # from the reference at machine epsilon and amplifies
                continue
            n = min(len(m), len(ref[j]), 10)
            if np.abs(m[:n] - ref[j][:n]).max() < 1e-4:
                matched += 1
        assert matched >= 34, f"only {matched}/40 trajectories matched"

    GOLDEN_IP = "tests/golden/trace_rays_imageplane_a0.9_d100_i60_euler.dat"

    def test_imageplane_trajectories_match_reference(self, tmp_path):
        """rt-trace-rays-imageplane vs the reference trace_rays_imageplane
        binary (src/ray_paths/trace_rays_imageplane.cpp:1-90): backward
        Euler trajectories from a 3x3 image plane at dist 100, incl 60,
        spin 0.9, half-pixel-offset grid (no knife-edge b = 0 rays).

        The reference app has a ctor argument-order bug — tol is passed
        into the phi0 slot and plane_phi0 into precision
        (trace_rays_imageplane.cpp:61 vs imageplane.cpp:11) — so the
        golden was produced with par tol = 0 and plane_phi0 = 100, making
        its effective phi0 = 0 and precision = 100 (the defaults our
        correctly-ordered CLI uses)."""
        from raytrace_tpu.apps.trace_rays import main_imageplane

        out = tmp_path / "mine.dat"
        assert main_imageplane([
            f"--outfile={out}", "--dist=100", "--incl=60", "--spin=0.9",
            "--x0=-6.5", "--xmax=5.5", "--Nx=3",
            "--y0=-6.5", "--ymax=5.5", "--Ny=3",
            "--write_step=50", "--n_snapshots=1024", "--integrator=euler",
            "--thetamax=0",
        ]) == 0
        ref = self._load(self.GOLDEN_IP)
        mine = self._load(str(out))
        assert len(mine) == len(ref) == 9

        for m, r in zip(mine, ref):
            # same snapshot count per ray and point-by-point agreement to
            # the text precision over the early trajectory; late snapshots
            # of plunging rays amplify machine-epsilon drift near the horizon,
            # so compare the leading half
            assert abs(len(m) - len(r)) <= 1
            n = max(2, min(len(m), len(r)) // 2)
            np.testing.assert_allclose(m[:n], r[:n], rtol=2e-5, atol=2e-4)
