"""Driver benchmark: geodesic throughput on the canonical lamppost workload.

Workload matches the reference perf test (integrator_perf_test.cpp:35-44)
at the dense grid the reference uses for emissivity comparisons
(dcosalpha = dbeta = 0.01 -> 125,800 rays; docs/session_2026-03-01.md:40):
spin 0.998, source at r = 5, theta = 1e-3, march to the disc/escape.

Prints ONE JSON line (the driver contract):
  {"metric": "rk4_steps_per_s_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / 1e7}
vs_baseline is against the driver target of >= 10M RK4 steps/s/chip
(BASELINE.json); the reference CPU whole-box figure is ~4.5e8 steps/s
(BASELINE.md).

Every invocation benches BOTH integrators: the primary method (RK4, or
RT_BENCH_METHOD to override) supplies the stdout JSON line; the other
(RK45 — the reference's production integrator, emissivity.cpp:91) is
measured in the same process and recorded alongside it in
BENCH_NOTES.jsonl, so the adaptive path is on the permanent per-round
cadence without env fiddling (set RT_BENCH_SECONDARY=0 to skip). Each
notes row carries stuck-ray counts and a stuck_ok verdict — the
stuck-ray regression class (BENCH_NOTES 2026-08-20T01:54) stays visible.

Runs on whatever backend JAX selects (the real TPU chip under the driver).
TPU computes in f32 (f64 is demoted by XLA on TPU); source construction is
done in f64 and cast, and binned-output accuracy at f32 is covered by
tests/test_emissivity.py.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.config import enable_compilation_cache

enable_compilation_cache()


def bench_once(method):
    """One timed propagation of the canonical workload; returns the
    primary value (useful steps/s) and the secondary-metrics record."""
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

    # RK4: 30k steps covers every well-behaved ray (the reference measured a
    # 27,154-step max on this workload, docs/session_2026-03-01.md).
    # RK45: well-behaved max is 34,223 (BASELINE.md); 40k bounds the stuck
    # photon-sphere tail while never cutting a legitimate ray.
    steplim = 40_000 if method == "rk45" else 30_000

    if on_tpu:
        # Pallas kernel: each ray block marches to completion in VMEM — one
        # HBM load/store per ray for the whole propagation. The fused driver
        # runs the full compaction schedule (wide march -> device-side
        # gather of survivors -> narrow stuck-ray tail -> drain) as ONE
        # dispatch, so no host round trips land between phases.
        from raytrace_tpu.ops.pallas_kernel import trace_pallas_fused

        run = lambda: trace_pallas_fused(
            rays, s, method=method, r_max=1000.0, steplim=steplim
        )
    else:
        run = lambda: trace_compacted(
            rays, s, method=method, r_max=1000.0, steplim=steplim, phase_iters=2048
        )

    def sync(o):
        # A scalar device->host fetch is the only reliable completion
        # barrier through the tunneled remote-TPU plugin: its
        # block_until_ready can return before the remote execution
        # finishes. One ~30 ms round trip of measurement overhead on a
        # multi-second march, and it depends on every marched lane.
        return int(jnp.max(jnp.abs(o.steps)))

    # warm-up / compile
    out = run()
    sync(out)

    # Timed section ends when the completion scalar lands on the host,
    # matching the reference's timing of the propagation phase
    # (integrator_perf_test.cpp:74-79) — not the extra network round trips
    # this box pays to *fetch the full results* through the tunnel (a real
    # TPU host dispatches in microseconds).
    # best of 3: the ~27 ms tunnel RTT rides the sync and its jitter is
    # the same order as the march's device time
    wall = np.inf
    for _ in range(3):
        t0 = time.time()
        out = run()
        sync(out)
        wall = min(wall, time.time() - t0)

    # Sustained throughput: K back-to-back async dispatches, one completion
    # barrier. After the round-4 compaction redesign the march's device time
    # (~20 ms) dropped below the tunnel's ~27 ms round trip, so the
    # single-dispatch wall above under-reports the chip by ~2x; pipelined
    # dispatches amortise the RTT the way a co-located production host
    # (dispatch latency in microseconds) trivially would. Kept as a
    # secondary metric — the conservative single-dispatch number stays on
    # the driver line.
    K = int(os.environ.get("RT_BENCH_SUSTAIN_K", "6"))
    # best of 2 pipelines: a single tunnel stall inside the dispatch train
    # otherwise under-reports the chip by ~1.5x (observed 450M vs 700M on
    # back-to-back RK45 runs, 2026-08-21) and the driver records ONE run
    wall_k = np.inf
    for _ in range(2):
        t0 = time.time()
        last = None
        for _ in range(K):
            last = run()
        sync(last)
        wall_k = min(wall_k, time.time() - t0)

    live = np.asarray(rays.steps) == 0
    steps = np.abs(np.asarray(out.steps)).astype(np.int64)
    stuck = (np.asarray(out.status) & 8) != 0
    useful = steps[live & ~stuck].sum()
    done = live & ~stuck

    value = useful / wall
    pct = np.percentile(steps[done], [50, 90, 99]).tolist() if done.any() else []
    n_stuck = int((stuck & live).sum())
    notes = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "method": method,
        "backend": jax.default_backend(),
        "n_rays": int(live.sum()),
        "wall_s": round(wall, 4),
        "steps_per_s": round(value),
        "rays_per_s": round(live.sum() / wall),
        "stuck_rays": n_stuck,
        "stuck_ok": n_stuck == 0,
        "steps_p50_p90_p99": [round(p) for p in pct],
        "steps_per_s_sustained": round(K * useful / wall_k),
        "sustain_k": K,
    }

    if method == "rk45" and os.environ.get("RT_BENCH_REJECTS", "1") != "0":
        # Reject-trial accounting (integrator_perf_test.cpp:119-169
        # analogue): decomposes the RK4<->RK45 throughput ratio into
        # stage-count vs controller-rejection waste. Measured on the 0.05
        # sub-grid (the reference perf-test density) — the fraction is a
        # controller property, not a batch-size one.
        try:
            from raytrace_tpu.ops.diagnostics import rk45_reject_stats
            from raytrace_tpu.sources import PointSourceGrid, point_source

            sub = point_source(
                (0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin,
                grid=PointSourceGrid.from_steps(0.05, 0.05),
            )
            sub = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float64 else a, sub
            )
            notes["rejects"] = rk45_reject_stats(sub, s, n_steps=8192)
        except Exception as exc:  # never break the bench contract
            notes["rejects_error"] = repr(exc)

    return value, notes


def _append_notes(notes):
    try:
        path = os.path.join(os.path.dirname(__file__) or ".", "BENCH_NOTES.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(notes) + "\n")
    except OSError:
        pass


def main():
    primary = os.environ.get("RT_BENCH_METHOD", "rk4")
    value, notes = bench_once(primary)
    _append_notes(notes)

    # One JSON line (the driver contract) carrying BOTH integrators: the
    # reference always benches them together (integrator_perf_test.cpp:49-50),
    # and the round-4 verdict asked for rk45 + sustained as first-class
    # driver-tracked fields rather than BENCH_NOTES-only records.
    record = {
        "metric": f"{primary}_steps_per_s_chip",
        "value": round(value),
        "unit": "steps/s",
        "vs_baseline": round(value / 1e7, 3),
        f"{primary}_sustained": notes["steps_per_s_sustained"],
    }
    if os.environ.get("RT_BENCH_SECONDARY", "1") != "0":
        # never let a secondary failure suppress the primary metric line —
        # the driver contract is exactly one JSON line on stdout
        try:
            other = "rk45" if primary != "rk45" else "rk4"
            value2, notes2 = bench_once(other)
            notes2["secondary"] = True
            _append_notes(notes2)
            record[f"{other}_steps_per_s"] = round(value2)
            record[f"{other}_sustained"] = notes2["steps_per_s_sustained"]
            record["stuck_ok"] = bool(notes["stuck_ok"] and notes2["stuck_ok"])
        except Exception as exc:
            record["secondary_error"] = repr(exc)[:200]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
