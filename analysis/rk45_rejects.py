"""RK45 accept/reject observability — study CLI.

Core accounting lives in ``raytrace_tpu.ops.diagnostics`` (importable
from installed console scripts); this script runs the canonical-workload
sweep table:

    python -m analysis.rk45_rejects [tol ...]

Result (2026-08-21, v5e, tol 1e-8, 5040 rays): mean reject fraction
3.8%, p90 15%, p99 19.5% — rejection waste is minor; the RK4 <-> RK45
throughput ratio is stage-count (7 vs 4 evals) plus controller ops, not
rejections. Recorded per round in BENCH_NOTES via bench.py.
"""

from __future__ import annotations

from raytrace_tpu.ops.diagnostics import rk45_reject_stats  # noqa: F401


def main(argv=None):
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.config import apply_platform_overrides
    from raytrace_tpu.ops.integrate import StepControl
    from raytrace_tpu.sources import PointSourceGrid, point_source

    apply_platform_overrides()
    tols = [float(t) for t in (argv or sys.argv[1:])] or [1e-6, 1e-8, 1e-10]
    spin = 0.998
    grid = PointSourceGrid.from_steps(0.05, 0.05)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin, grid=grid)
    if jax.default_backend() != "cpu":
        rays = jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
            rays,
        )
    print(f"canonical lamppost workload, {int((np.asarray(rays.steps) == 0).sum())} "
          f"rays, backend={jax.default_backend()}")
    for tol in tols:
        stats = rk45_reject_stats(
            rays, jnp.asarray(spin, rays.r.dtype),
            ctrl=StepControl(rk45_tol=tol),
        )
        print(f"tol={tol:g}: {stats}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
