"""On-hardware validation: the TPU Pallas pipeline vs the reference goldens.

Runs production pipelines on the live accelerator backend — f32, DOPRI5,
the Pallas kernel via trace_auto — and compares against stored outputs of
the reference C++ binaries with the reference's own count-gated
methodologies:

  * emissivity (point source h = 5, spin 0.998): binned observables,
    emissivity_rk45_test.cpp:57-63 gating (bins with >= 100 rays in both
    runs and counts within 10%; thresholds emissivity ±10%, redshift ±0.5%,
    time ±5%). Measured (TPU v5e, 2026-08-18): max dev 3.6% / 0.03% / 0.12%
    over 26 gated bins.
  * imageplane_disc_image at the canonical far-field config (dist = 10^4,
    incl 80, 501x501 rays -> 250x250 image, RK45 tol 1e-8 —
    par_example/imageplane_disc_image.par_example): per-pixel maps at
    count >= 3 in both runs. This is the precision-critical f32 regime
    (SURVEY §7): f64-seeded starts, dtype-scaled knife-edge regularisation,
    4 radial decades of f32 marching.

The CPU test suite pins everything to f64 CPU (tests/conftest.py); this is
the complementary check that the production TPU path — f32 arithmetic,
Mosaic-compiled kernel, multi-phase compaction — stays inside the same
statistical envelope.

Usage:  python -m analysis.tpu_validation        (exit 0 = PASS)
"""

from __future__ import annotations

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


def check_emissivity(backend):
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
    status = 0
    for fld, tol in THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / g[fld][gated] - 1.0)
        ok = dev.max() < tol
        status |= 0 if ok else 1
        print(f"  {fld:9s} max dev {100 * dev.max():6.2f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    return status


def check_disc_image_far_field(backend):
    if not os.path.exists(IMAGE_GOLDEN):
        print(f"disc_image d=1e4: golden {IMAGE_GOLDEN} not present — skipped")
        return 0
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

    dn = abs(int(mine["counts"].sum()) - int(counts.sum()))
    print(f"disc_image d=1e4 [{backend}]: rays on disc mine="
          f"{int(mine['counts'].sum())} ref={int(counts.sum())}")
    status = 0 if dn <= 0.02 * counts.sum() else 1
    gated = (counts >= 3) & (mine["counts"] >= 3)
    print(f"  {int(gated.sum())} gated pixels (count >= 3 both)")
    for fld, tol in IMAGE_THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / ref[fld][gated] - 1.0)
        med = np.median(dev)
        ok = med < tol
        status |= 0 if ok else 1
        print(f"  {fld:9s} median dev {100 * med:7.3f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    return status


def main(argv=None):
    from raytrace_tpu.config import apply_platform_overrides

    apply_platform_overrides()  # honours RT_PLATFORM, enables compile cache
    import jax

    backend = jax.default_backend()
    if backend == "cpu" and os.environ.get("RT_VALIDATE_CPU", "0") != "1":
        print("no accelerator backend available — nothing to validate here "
              "(the CPU path is covered by tests/; set RT_VALIDATE_CPU=1 to "
              "force the same checks on CPU)")
        return 0

    status = check_emissivity(backend)
    status |= check_disc_image_far_field(backend)
    return status


if __name__ == "__main__":
    sys.exit(main())
