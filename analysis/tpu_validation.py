"""On-hardware validation: the TPU Pallas pipeline vs the reference goldens.

Runs production pipelines on the live accelerator backend — f32, DOPRI5,
the Pallas kernel via trace_auto — and compares against stored outputs of
the reference C++ binaries with the reference's own count-gated
methodologies:

  * emissivity (point source h = 5, spin 0.998): binned observables,
    emissivity_rk45_test.cpp:57-63 gating (bins with >= 100 rays in both
    runs and counts within 10%; thresholds emissivity ±10%, redshift ±0.5%,
    time ±5%).
  * imageplane_disc_image at the canonical far-field config (dist = 10^4,
    incl 80, 501x501 rays -> 250x250 image, RK45 tol 1e-8 —
    par_example/imageplane_disc_image.par_example): per-pixel maps at
    count >= 3 in both runs. This is the precision-critical f32 regime
    (SURVEY §7): f64-seeded starts, dtype-scaled knife-edge regularisation,
    4 radial decades of f32 marching.
  * caustic_discplane bundle Jacobians (dist 500, incl 60, spin 0.998,
    81x81 pixels, eps_frac 0.01, RK45): the f32 lensing-derivative regime —
    det J from ±0.003 r_g satellite splittings marched 500 r_g in f32.
    Judged on order-matched finite pixels (caustic_discplane.cpp:296-317
    SENTINEL methodology) with f32-envelope thresholds.

The CPU test suite pins everything to f64 CPU (tests/conftest.py); this is
the complementary check that the production TPU path — f32 arithmetic,
Mosaic-compiled kernel, multi-phase compaction — stays inside the same
statistical envelope.

Every run writes a versioned artifact (default VALIDATION_rXX.json, see
--out/RT_ROUND) recording per-check deviations, thresholds and verdicts,
so hardware regressions between rounds are visible in the repo history
rather than only in docstrings.

Usage:  python -m analysis.tpu_validation [--out FILE]   (exit 0 = PASS)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

GOLDEN = "tests/golden/emissivity_a0.998_h5_g0.05.dat"
THRESHOLDS = {"emis": 0.10, "redshift": 0.005, "time": 0.05}

IMAGE_GOLDEN = "tests/golden/disc_image_d10000_a0.998_i80_rk45.bin"
IMAGE_N = 250
# medians over count-gated pixels; the f32 envelope measured on CPU at this
# config (tests/test_f32.py methodology) is r ~3e-4, enshift ~1e-4
IMAGE_THRESHOLDS = {"r": 0.01, "enshift": 0.005, "time": 0.001, "flux": 0.05}

CAUSTIC_GOLDEN = "tests/golden/caustic_discplane_a0.998_i60_rk45.bin"
# f32 envelope at this config (dist 500, eps_frac 0.01), measured identical
# through the TPU Mosaic kernel and the CPU f32 XLA path (2026-08-20):
# median det J dev ~1.2%, but ~15% of order-matched pixels are garbage —
# bundles that graze near-critical phase-space regions amplify the f32
# landing noise chaotically (cf. the reference's own separatrix
# methodology, SURVEY.md §4). So the hardware gate is the median plus the
# well-measured fraction (sign correct AND magnitude within 50%), not a
# raw sign-match rate; the f64 CPU suite (tests/test_caustics.py) pins the
# thin-tail behaviour.
CAUSTIC_THRESHOLDS = {"radius": 1e-3, "det_j": 0.10, "good_frac": 0.80}


def check_emissivity(backend, record):
    from raytrace_tpu.apps.emissivity import compute
    from raytrace_tpu.sources import PointSourceGrid

    ref = np.loadtxt(GOLDEN)
    g = dict(zip(["r", "area", "rays", "flux", "emis", "redshift", "time"], ref.T))
    grid = PointSourceGrid.from_steps(0.05, 0.05, -0.995, 0.995, -np.pi, np.pi)
    mine = compute(0.998, (0.0, 5.0, 1e-3, 1.5707), V=0.0, grid=grid,
                   r_max=1000.0, r_disc=500.0, n_r=100, logbin_r=True,
                   gamma=2.0, steplim=20000, method="rk45")

    gated = (
        (g["rays"] >= 100)
        & (mine["rays"] >= 100)
        & (np.abs(mine["rays"] - g["rays"]) < 0.10 * np.maximum(g["rays"], 1))
    )
    print(f"emissivity [{backend}]: {int(gated.sum())} gated bins")
    rec = {"gated_bins": int(gated.sum()), "fields": {}}
    status = 0
    for fld, tol in THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / g[fld][gated] - 1.0)
        ok = dev.max() < tol
        status |= 0 if ok else 1
        rec["fields"][fld] = {"max_dev": float(dev.max()),
                              "median_dev": float(np.median(dev)),
                              "tol": tol, "pass": bool(ok)}
        print(f"  {fld:9s} max dev {100 * dev.max():6.2f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    rec["pass"] = status == 0
    record["emissivity"] = rec
    return status


def check_disc_image_far_field(backend, record):
    if not os.path.exists(IMAGE_GOLDEN):
        print(f"disc_image d=1e4: golden {IMAGE_GOLDEN} not present — skipped")
        record["disc_image_far_field"] = {"pass": False, "skipped": True}
        return 1
    import jax.numpy as jnp

    from raytrace_tpu.apps.imageplane_disc_image import compute
    from raytrace_tpu.sources import ImagePlaneGrid

    raw = open(IMAGE_GOLDEN, "rb").read()
    n = IMAGE_N * IMAGE_N
    names = ["flux", "r", "phi", "enshift", "time", "emis"]
    ref = {
        nm: np.frombuffer(raw, dtype="<f8", count=n, offset=i * n * 8).reshape(
            IMAGE_N, IMAGE_N
        )
        for i, nm in enumerate(names)
    }
    counts = np.fromfile(IMAGE_GOLDEN + ".counts", dtype="<i4").reshape(
        IMAGE_N, IMAGE_N
    )

    dx = 60.0 / 500
    grid = ImagePlaneGrid.from_steps(-30.0, 30.0, dx, -30.0, 30.0, dx)
    mine = compute(0.998, 10000.0, 80.0, grid, r_disc=30.0,
                   img_nx=IMAGE_N, img_ny=IMAGE_N, method="rk45",
                   dtype=jnp.float32)

    n_mine, n_ref = int(mine["counts"].sum()), int(counts.sum())
    dn = abs(n_mine - n_ref)
    print(f"disc_image d=1e4 [{backend}]: rays on disc mine={n_mine} ref={n_ref}")
    status = 0 if dn <= 0.02 * n_ref else 1
    gated = (counts >= 3) & (mine["counts"] >= 3)
    print(f"  {int(gated.sum())} gated pixels (count >= 3 both)")
    rec = {"rays_mine": n_mine, "rays_ref": n_ref,
           "count_pass": status == 0, "gated_pixels": int(gated.sum()),
           "fields": {}}
    for fld, tol in IMAGE_THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / ref[fld][gated] - 1.0)
        med = np.median(dev)
        ok = med < tol
        status |= 0 if ok else 1
        rec["fields"][fld] = {"median_dev": float(med), "tol": tol, "pass": bool(ok)}
        print(f"  {fld:9s} median dev {100 * med:7.3f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    rec["pass"] = status == 0
    record["disc_image_far_field"] = rec
    return status


def check_caustic_jacobian(backend, record):
    if not os.path.exists(CAUSTIC_GOLDEN):
        print(f"caustic_discplane: golden {CAUSTIC_GOLDEN} not present — skipped")
        record["caustic_discplane"] = {"pass": False, "skipped": True}
        return 1
    import jax.numpy as jnp

    from raytrace_tpu.apps.caustics import SENTINEL, compute
    from raytrace_tpu.sources import ImagePlaneGrid

    raw = np.fromfile(CAUSTIC_GOLDEN, "<f8")
    n = 81 * 81
    names = ["det_j", "sign_j", "order", "hit", "radius", "phi",
             "x_disc", "y_disc", "redshift"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(81, 81) for i, nm in enumerate(names)}

    grid = ImagePlaneGrid.from_steps(-12.0, 12.0, 0.3, -12.0, 12.0, 0.3)
    maps = compute(0.998, 500.0, 60.0, grid, target="disc", r_disc=20.0,
                   method="rk45", steplim=60000, bundle_eps_frac=0.01,
                   dtype=jnp.float32)

    hit_m = maps["hit"].astype(bool)
    hit_r = ref["hit"] > 0.5
    hit_agree = float((hit_m == hit_r).mean())
    both = hit_m & hit_r
    om = maps["order"]
    rel_r = np.abs(maps["radius"][both] / ref["radius"][both] - 1)

    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr)
          & (dm != SENTINEL) & (np.abs(dr) < 1e29) & (om == ref["order"]))
    rel_d = np.abs(dm[ok] / dr[ok] - 1)
    sign_raw = float((np.sign(dm[ok]) == np.sign(dr[ok])).mean())
    good_frac = float(
        ((rel_d < 0.5) & (np.sign(dm[ok]) == np.sign(dr[ok]))).mean()
    )

    med_r, med_d = float(np.median(rel_r)), float(np.median(rel_d))
    checks = {
        "radius": (med_r, CAUSTIC_THRESHOLDS["radius"], med_r < CAUSTIC_THRESHOLDS["radius"]),
        "det_j": (med_d, CAUSTIC_THRESHOLDS["det_j"], med_d < CAUSTIC_THRESHOLDS["det_j"]),
        "good_frac": (good_frac, CAUSTIC_THRESHOLDS["good_frac"],
                      good_frac > CAUSTIC_THRESHOLDS["good_frac"]),
    }
    print(f"caustic_discplane [{backend}]: hit agreement {100 * hit_agree:.2f}%, "
          f"{int(ok.sum())} order-matched Jacobian pixels")
    status = 0 if (hit_agree > 0.98 and ok.sum() > 3000) else 1
    rec = {"hit_agreement": hit_agree, "jacobian_pixels": int(ok.sum()),
           "sign_match_raw": sign_raw, "fields": {}}
    for fld, (val, tol, good) in checks.items():
        status |= 0 if good else 1
        rec["fields"][fld] = {"value": float(val), "tol": tol, "pass": bool(good)}
        print(f"  {fld:10s} {val:9.5f}  (tol {tol})  {'PASS' if good else 'FAIL'}")
    rec["pass"] = status == 0
    record["caustic_discplane"] = rec
    return status


PLANE_GOLDEN = "tests/golden/caustic_plane_a0.998_i30_rk45.bin"
# f32 envelopes for the two remaining caustic targets (round-4 verdict
# item 6), measured on the CPU f32 path (2026-08-21): the far-PLANE target
# marches every bundle ~500 r_g PAST the hole, so f32 landing noise is
# ~1.3 r_g median and the per-pixel Jacobians are Lyapunov-swamped even
# f32-vs-f64 on our own pipeline (median dev 3.8x, 440 surviving pixels) —
# det J is therefore REPORTED but not gated for this target; the f64 CPU
# suite (tests/test_caustics.py) pins it to 1%. The hardware gate is the
# structure that survives f32: hit map, image order, landing positions.
PLANE_THRESHOLDS = {"landing": 2.5, "order_agree": 0.98}
SPHERE_GOLDEN = "tests/golden/caustic_sourceplane_a0.998_i30_rk45.bin"
# sphere landing ANGLES divide out the lever arm (measured f32 envelope:
# median 1.4e-3 rad, det J median 6.9%, well-measured fraction 96%)
SPHERE_THRESHOLDS = {"angle": 5e-3, "det_j": 0.15, "good_frac": 0.85}


def check_caustic_plane(backend, record):
    """caustic_plane (FlatPlane source plane behind the hole,
    caustic_plane.cpp:1-487) on the accelerator: dist 500, incl 30,
    z_s 500, 81x81 bundles, RK45 f32."""
    if not os.path.exists(PLANE_GOLDEN):
        print(f"caustic_plane: golden {PLANE_GOLDEN} not present — skipped")
        record["caustic_plane"] = {"pass": False, "skipped": True}
        return 1
    import jax.numpy as jnp

    from raytrace_tpu.apps.caustics import SENTINEL, compute
    from raytrace_tpu.sources import ImagePlaneGrid

    raw = np.fromfile(PLANE_GOLDEN, "<f8")
    n = 81 * 81
    names = ["det_j", "sign_j", "order", "hit", "x_s", "y_s",
             "rdot_flips", "equat_cross"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(81, 81) for i, nm in enumerate(names)}

    grid = ImagePlaneGrid.from_steps(-10.0, 10.0, 0.25, -10.0, 10.0, 0.25)
    maps = compute(0.998, 500.0, 30.0, grid, target="plane", z_s=500.0,
                   method="rk45", steplim=100000, bundle_eps_frac=0.01,
                   dtype=jnp.float32)

    hm = maps["hit"].astype(bool)
    hr = ref["hit"] > 0.5
    hit_agree = float((hm == hr).mean())
    both = hm & hr
    land = float(np.median(np.concatenate([
        np.abs(maps["x_s"][both] - ref["x_s"][both]),
        np.abs(maps["y_s"][both] - ref["y_s"][both]),
    ])))
    om = maps["order"]
    order_agree = float((om[both] == ref["order"][both]).mean())
    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr) & (dm != SENTINEL)
          & (np.abs(dr) < 1e29) & (om == ref["order"]))
    rel = np.abs(dm[ok] / dr[ok] - 1)
    med_d = float(np.median(rel)) if ok.any() else float("nan")
    print(f"caustic_plane [{backend}]: hit agreement {100 * hit_agree:.2f}%, "
          f"order agreement {100 * order_agree:.2f}%; det J median dev "
          f"{med_d:.3f} over {int(ok.sum())} pixels (REPORTED, not gated: "
          f"f32-swamped for this target — see PLANE_THRESHOLDS note)")
    status = 0 if hit_agree > 0.97 else 1
    checks = {
        "landing": (land, PLANE_THRESHOLDS["landing"], land < PLANE_THRESHOLDS["landing"]),
        "order_agree": (order_agree, PLANE_THRESHOLDS["order_agree"],
                        order_agree > PLANE_THRESHOLDS["order_agree"]),
    }
    rec = {"hit_agreement": hit_agree, "jacobian_pixels": int(ok.sum()),
           "det_j_median_dev_ungated": med_d, "fields": {}}
    for fld, (val, tol, good) in checks.items():
        status |= 0 if good else 1
        rec["fields"][fld] = {"value": float(val), "tol": tol, "pass": bool(good)}
        print(f"  {fld:10s} {val:9.5f}  (tol {tol})  {'PASS' if good else 'FAIL'}")
    rec["pass"] = status == 0
    record["caustic_plane"] = rec
    return status


def check_caustic_sourceplane(backend, record):
    """caustic_sourceplane (far source sphere, caustic_sourceplane.cpp:1-413)
    on the accelerator: dist 500, incl 30, r_lim 1000, 82x82, RK45 f32."""
    if not os.path.exists(SPHERE_GOLDEN):
        print(f"caustic_sourceplane: golden {SPHERE_GOLDEN} not present — skipped")
        record["caustic_sourceplane"] = {"pass": False, "skipped": True}
        return 1
    import jax.numpy as jnp

    from raytrace_tpu.apps.caustics import SENTINEL, compute
    from raytrace_tpu.sources import ImagePlaneGrid

    raw = np.fromfile(SPHERE_GOLDEN, "<f8")
    n = 82 * 82
    names = ["det_j", "sign_j", "order", "escaped", "theta_s", "phi_s",
             "rdot_flips", "equat_cross"]
    ref = {nm: raw[i * n:(i + 1) * n].reshape(82, 82) for i, nm in enumerate(names)}

    dx = 24.0 / 81
    grid = ImagePlaneGrid.from_steps(-12.0, 12.0, dx, -12.0, 12.0, dx)
    maps = compute(0.998, 500.0, 30.0, grid, target="sphere", r_lim=1000.0,
                   method="rk45", steplim=100000, dtype=jnp.float32)

    em = maps["escaped"].astype(bool)
    er = ref["escaped"] > 0.5
    esc_agree = float((em == er).mean())
    both = em & er
    dphi = np.abs(maps["phi_s"][both] - ref["phi_s"][both])
    dphi = np.minimum(dphi, 2 * np.pi - dphi)
    ang = float(np.median(np.concatenate([
        np.abs(maps["theta_s"][both] - ref["theta_s"][both]), dphi,
    ])))
    om = maps["order"]
    dm, dr = maps["det_j"], ref["det_j"]
    ok = (both & np.isfinite(dm) & np.isfinite(dr) & (dm != SENTINEL)
          & (np.abs(dr) < 1e29) & (om == ref["order"]))
    rel = np.abs(dm[ok] / dr[ok] - 1)
    med_d = float(np.median(rel)) if ok.any() else float("nan")
    good_frac = (float(((rel < 0.5) & (np.sign(dm[ok]) == np.sign(dr[ok]))).mean())
                 if ok.any() else 0.0)
    print(f"caustic_sourceplane [{backend}]: escape agreement "
          f"{100 * esc_agree:.2f}%, {int(ok.sum())} order-matched pixels")
    status = 0 if (esc_agree > 0.97 and ok.sum() > 3000) else 1
    checks = {
        "angle": (ang, SPHERE_THRESHOLDS["angle"], ang < SPHERE_THRESHOLDS["angle"]),
        "det_j": (med_d, SPHERE_THRESHOLDS["det_j"], med_d < SPHERE_THRESHOLDS["det_j"]),
        "good_frac": (good_frac, SPHERE_THRESHOLDS["good_frac"],
                      good_frac > SPHERE_THRESHOLDS["good_frac"]),
    }
    rec = {"escape_agreement": esc_agree, "jacobian_pixels": int(ok.sum()),
           "fields": {}}
    for fld, (val, tol, good) in checks.items():
        status |= 0 if good else 1
        rec["fields"][fld] = {"value": float(val), "tol": tol, "pass": bool(good)}
        print(f"  {fld:10s} {val:9.5f}  (tol {tol})  {'PASS' if good else 'FAIL'}")
    rec["pass"] = status == 0
    record["caustic_sourceplane"] = rec
    return status


def check_emissivity_cli(backend, record):
    """The PRODUCTION CLI surface on the chip: rt-emissivity's main() at the
    golden config (par file + overrides, text output, auto-mesh path) —
    every other check drives compute() directly; this one proves the app
    wiring end-to-end on hardware."""
    import tempfile

    from raytrace_tpu.apps.emissivity import main

    ref = np.loadtxt(GOLDEN)
    g = dict(zip(["r", "area", "rays", "flux", "emis", "redshift", "time"], ref.T))
    with tempfile.TemporaryDirectory() as tmp:
        out_path = os.path.join(tmp, "emis_cli.dat")
        par = os.path.join(tmp, "emis.par")
        with open(par, "w") as f:
            f.write(
                "source = 0 5 1E-3 1.5707\nV = 0\nspin = 0.998\n"
                "dcosalpha = 0.05\ndbeta = 0.05\nNr = 100\nlogbin_r = 1\n"
                "integrator = rk45\nsteplim = 20000\n"
            )
        rc = main([f"--parfile={par}", f"--outfile={out_path}"])
        mine_cols = np.loadtxt(out_path)
    mine = dict(zip(["r", "area", "rays", "flux", "emis", "redshift", "time"],
                    mine_cols.T))
    gated = (
        (g["rays"] >= 100) & (mine["rays"] >= 100)
        & (np.abs(mine["rays"] - g["rays"]) < 0.10 * np.maximum(g["rays"], 1))
    )
    print(f"emissivity CLI [{backend}]: exit {rc}, {int(gated.sum())} gated bins")
    status = 0 if (rc == 0 and gated.sum() >= 15) else 1
    rec = {"exit": rc, "gated_bins": int(gated.sum()), "fields": {}}
    for fld, tol in THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / g[fld][gated] - 1.0)
        ok = dev.max() < tol
        status |= 0 if ok else 1
        rec["fields"][fld] = {"max_dev": float(dev.max()), "tol": tol,
                              "pass": bool(ok)}
        print(f"  {fld:9s} max dev {100 * dev.max():6.2f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    rec["pass"] = status == 0
    record["emissivity_cli"] = rec
    return status


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out_path = None
    if "--out" in argv:
        out_path = argv[argv.index("--out") + 1]
    only = None
    if "--only" in argv:
        only = set(argv[argv.index("--only") + 1].split(","))

    from raytrace_tpu.config import apply_platform_overrides

    apply_platform_overrides()  # honours RT_PLATFORM, enables compile cache
    import jax

    backend = jax.default_backend()
    if backend == "cpu" and os.environ.get("RT_VALIDATE_CPU", "0") != "1":
        print("no accelerator backend available — nothing to validate here "
              "(the CPU path is covered by tests/; set RT_VALIDATE_CPU=1 to "
              "force the same checks on CPU)")
        return 0

    if out_path is None:
        rnd = os.environ.get("RT_ROUND", "")
        out_path = f"VALIDATION_r{int(rnd):02d}.json" if rnd else "VALIDATION.json"

    record = {"backend": backend, "device": str(jax.devices()[0]),
              "checks_order": ["emissivity", "disc_image_far_field",
                               "caustic_discplane", "caustic_plane",
                               "caustic_sourceplane", "emissivity_cli"]}
    checks = {"emissivity": check_emissivity,
              "disc_image_far_field": check_disc_image_far_field,
              "caustic_discplane": check_caustic_jacobian,
              "caustic_plane": check_caustic_plane,
              "caustic_sourceplane": check_caustic_sourceplane,
              "emissivity_cli": check_emissivity_cli}
    status = 0
    for name, fn in checks.items():
        if only is None or name in only:
            status |= fn(backend, record)
    record["pass"] = status == 0

    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"{'PASS' if status == 0 else 'FAIL'} — wrote {out_path}")
    return status


if __name__ == "__main__":
    sys.exit(main())
