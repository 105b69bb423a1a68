"""Measured speed-of-light estimate for the geodesic kernel.

The march is VPU-bound: no matmuls, and each ``geodesic_rates`` call
(kerr.py:215, 4x per RK4 step / 7x per DOPRI5 attempt) costs 1 sin, 1 cos,
1 divide, 2 sqrt and ~30 fused mul/adds per lane. This script measures the
chip's actual throughput for exactly that op mix with a pure-XLA
elementwise loop (no kernel overheads, no masking, no memory traffic), and
reports the idealized step ceiling it implies.

Measured (TPU v5e, 2026-08-21): 6.67G rates-equivalent/s, i.e. an
idealized ~1.67G RK4 steps/s if a step were exactly 4 rates bodies.
Against the kernel's benched 1.32G steps/s, and charging the real step's
extra work (4-stage state combination, adaptive step heuristic,
sign-flip/termination bookkeeping — roughly 1-1.5 further rates-bodies of
VPU work), the kernel runs at ~85-90% of the transcendental roofline.

History: at round 3's 720M steps/s this script attributed the ~40-45%
residual to masked-lane retirement granularity. The round-4 profiler
trace (analysis/profiles/rk4_march_tpu) showed the truth: the residual
was mostly the compaction gathers (jnp.nonzero lowering to serialised
TPU scatters, 10.4 ms each = 36% of the march) plus an unnecessary
mid-width phase; fixing those took the kernel to 1.32G. Retirement waste
itself is small — the measured per-block iteration overhead of natural
grid order is 1.36x useful steps under the shipped open_iters=1536
schedule, with an (unachievable) oracle lifetime-sort ceiling of 1.04x
(analysis/lifetime_sort_study.py, hardware-confirmed
negative result for sorting).

Usage:  python -m analysis.vpu_roofline
"""

from __future__ import annotations

import sys
import time


def main():
    from raytrace_tpu.config import apply_platform_overrides

    apply_platform_overrides()
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no accelerator backend — the roofline is a hardware number")
        return 0

    n = 125_952  # the bench batch, (32,128)-tile friendly
    iters = 2_000

    @jax.jit
    def micro(x):
        def body(i, y):
            # one geodesic_rates-equivalent: sin, cos, divide, 2 sqrt,
            # ~30 fused mul/adds
            s = jnp.sin(y)
            c = jnp.cos(y)
            d = 1.0 / (y * y + 2.0)
            q1 = jnp.sqrt(jnp.abs(y) + 1.0)
            q2 = jnp.sqrt(y * y + 3.0)
            p = y * 1.000001 + 0.3
            for _ in range(10):
                p = p * y + 0.1
            return s * c * d * 1e-3 + q1 * 1e-3 + q2 * 1e-3 + p * 1e-6 + y * 0.999

        return jax.lax.fori_loop(0, iters, body, x)

    x = jnp.linspace(0.1, 1.1, n, dtype=jnp.float32)
    r = micro(x)
    _ = float(jnp.max(r))  # compile + completion barrier
    t0 = time.time()
    r = micro(x)
    _ = float(jnp.max(r))
    wall = time.time() - t0
    rate = n * iters / wall
    print(f"VPU rates-equivalent throughput: {rate / 1e9:.2f}G calls/s "
          f"({wall:.3f} s for {n} lanes x {iters} iters)")
    print(f"idealized RK4 ceiling (4 rates bodies/step): {rate / 4 / 1e6:.0f}M steps/s")
    print(f"idealized DOPRI5 ceiling (7 bodies/attempt): {rate / 7 / 1e6:.0f}M steps/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
