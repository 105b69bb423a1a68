"""Driver benchmark: RK4 geodesic throughput on the canonical lamppost workload.

Workload matches the reference perf test (integrator_perf_test.cpp:35-44)
at the dense grid the reference uses for emissivity comparisons
(dcosalpha = dbeta = 0.01 -> 125,800 rays; docs/session_2026-03-01.md:40):
spin 0.998, source at r = 5, theta = 1e-3, RK4 march to the disc/escape.

Prints ONE JSON line:
  {"metric": "rk4_steps_per_s_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / 1e7}
vs_baseline is against the driver target of >= 10M RK4 steps/s/chip
(BASELINE.json); the reference CPU whole-box figure is ~4.5e8 steps/s
(BASELINE.md).

Runs on whatever backend JAX selects (the real TPU chip under the driver).
TPU computes in f32 (f64 is demoted by XLA on TPU); source construction is
done in f64 and cast, and binned-output accuracy at f32 is covered by
tests/test_emissivity.py.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.config import enable_compilation_cache

enable_compilation_cache()


def main():
    from raytrace_tpu.ops import trace_compacted
    from raytrace_tpu.sources import PointSourceGrid, point_source

    spin = 0.998
    grid = PointSourceGrid.from_steps(0.01, 0.01)
    rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin, grid=grid)

    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    rays = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, rays
    )
    s = jnp.asarray(spin, dtype)

    # 30k steps covers every well-behaved RK4 ray (the reference measured a
    # 27,154-step max on this workload, docs/session_2026-03-01.md) while
    # bounding the stuck photon-sphere tail.
    steplim = 30_000

    if on_tpu:
        # Pallas kernel: each ray block marches to completion in VMEM — one
        # HBM load/store per ray for the whole propagation. The fused driver
        # runs the full compaction schedule (wide march -> device-side
        # gather of survivors -> narrow stuck-ray tail) as ONE dispatch, so
        # no host round trips land between phases.
        from raytrace_tpu.ops.pallas_kernel import trace_pallas_fused

        run = lambda: trace_pallas_fused(
            rays, s, method="rk4", r_max=1000.0, steplim=steplim
        )
    else:
        run = lambda: trace_compacted(
            rays, s, method="rk4", r_max=1000.0, steplim=steplim, phase_iters=2048
        )

    # warm-up / compile
    out = run()
    jax.block_until_ready(out)

    # Timed section ends when every output buffer is materialised on the
    # chip (block_until_ready), matching the reference's timing of the
    # propagation phase (integrator_perf_test.cpp:74-79) — not the extra
    # network round trips this box pays to *fetch* results through the
    # remote-TPU tunnel (a real TPU host dispatches in microseconds).
    t0 = time.time()
    out = run()
    jax.block_until_ready(out)
    wall = time.time() - t0

    live = np.asarray(rays.steps) == 0
    steps = np.abs(np.asarray(out.steps)).astype(np.int64)
    stuck = (np.asarray(out.status) & 8) != 0
    useful = steps[live & ~stuck].sum()

    value = useful / wall
    print(
        json.dumps(
            {
                "metric": "rk4_steps_per_s_chip",
                "value": round(value),
                "unit": "steps/s",
                "vs_baseline": round(value / 1e7, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
