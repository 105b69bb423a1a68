"""Sharded Pallas engine on real hardware: shard_map + Mosaic composition.

The CPU test suite exercises the sharded engine only in interpreter mode
(tests/test_parallel.py monkeypatches the route — Mosaic cannot lower on
CPU), and the single-chip bench runs the kernel unsharded. This check is
the missing link between them: on the live accelerator it runs

  1. ``sharded_trace`` over a 1-device ``rays`` mesh vs the unsharded
     ``trace_pallas_fused`` on the same f32 batch — outputs must be
     IDENTICAL (same kernel, same data, shard_map must be a no-op wrapper)
     and throughput within ~10%;
  2. ``sharded_emissivity_bins`` (trace + redshift + binning + psum merge
     under shard_map) vs the same f32 pipeline composed step-by-step
     around the unsharded kernel — binned counts must match exactly and
     summed observables bitwise.

Each run appends its measurements to BENCH_NOTES.jsonl
(check = "sharded_pallas_hw"), so the composition stays on the per-round
record. Replaces the reference's only parallel mechanism (the OpenMP ray
loop, raytracer.cpp:104) with evidence that the multi-chip path reuses
the benched single-chip kernel per shard.

Usage:  python -m analysis.sharded_hardware_check   (exit 0 = PASS)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    from raytrace_tpu.config import apply_platform_overrides

    apply_platform_overrides()
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        print("no accelerator backend — the sharded kernel composition can "
              "only be validated on hardware (CPU runs it in interpreter "
              "mode, tests/test_parallel.py)")
        return 0

    from raytrace_tpu.ops.pallas_kernel import trace_pallas_fused
    from raytrace_tpu.parallel import (
        make_ray_mesh,
        pad_rays,
        shard_rays,
        sharded_emissivity_bins,
        sharded_trace,
    )
    from raytrace_tpu.ops.reductions import bin_edges
    from raytrace_tpu.sources import PointSourceGrid, point_source

    spin = 0.998
    grid = PointSourceGrid.from_steps(0.02, 0.02)
    rays64 = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin, grid=grid)
    rays = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, rays64
    )
    s = jnp.float32(spin)
    kw = dict(method="rk45", r_max=1000.0, steplim=40_000)

    mesh = make_ray_mesh()
    n_dev = mesh.devices.size
    padded = pad_rays(rays, n_dev)
    sharded = shard_rays(padded, mesh)

    def timed(tag, fn):
        out = fn()
        _ = int(jnp.max(jnp.abs(out.steps)))  # completion barrier
        t0 = time.time()
        out = fn()
        _ = int(jnp.max(jnp.abs(out.steps)))
        wall = time.time() - t0
        print(f"{tag}: {wall:.3f} s")
        return out, wall

    out_u, wall_u = timed("unsharded trace_pallas_fused",
                          lambda: trace_pallas_fused(padded, s, **kw))
    out_s, wall_s = timed(f"sharded_trace over {n_dev}-device mesh",
                          lambda: sharded_trace(sharded, s, mesh, **kw))

    identical = all(
        bool(jnp.array_equal(a, b, equal_nan=True))
        for a, b in zip(jax.tree.leaves(out_u), jax.tree.leaves(out_s))
    )
    ratio = wall_s / wall_u
    print(f"outputs identical: {identical}; sharded/unsharded wall ratio "
          f"{ratio:.3f}")
    status = 0 if identical and ratio < 1.10 else 1

    # full sharded step: trace + redshift + binning + psum vs the same f32
    # pipeline composed step-by-step around the unsharded kernel (the app's
    # own functions; compute() itself runs x64 semantics so its TPU
    # demotion rounds differently — not an apples-to-apples oracle here)
    from raytrace_tpu.apps.emissivity import disc_hit_mask, emissivity_bin_weights
    from raytrace_tpu.ops.redshift import apply_redshift, range_phi, redshift_start
    from raytrace_tpu.ops.reductions import radial_bin_profile

    r_min = 1.0
    n_r = 60
    _, _, dr = bin_edges(r_min, 500.0, n_r, True)
    counts_s, sums_s = sharded_emissivity_bins(
        sharded, s, mesh, V=0.0, r_min=r_min, dr=float(dr), n_r=n_r,
        logbin_r=True, gamma=2.0, **kw)

    @jax.jit
    def single_chip_bins(batch, s):
        batch = redshift_start(batch, s, 0.0)
        out = trace_pallas_fused(batch, s, **kw)
        out = range_phi(out)
        out = apply_redshift(out, s, V=-1.0)
        mask = disc_hit_mask(out, s)
        return radial_bin_profile(out.r, mask,
                                  emissivity_bin_weights(out, 2.0, 1.0),
                                  r_min, float(dr), n_r, True)

    counts_1, sums_1 = single_chip_bins(padded, s)
    counts_s, counts_1 = np.asarray(counts_s), np.asarray(counts_1)
    emis_s, emis_1 = np.asarray(sums_s["emis"]), np.asarray(sums_1["emis"])
    counts_eq = bool((counts_s == counts_1).all())
    filled = counts_1 > 0
    with np.errstate(invalid="ignore"):
        rel = np.abs(emis_s[filled] / emis_1[filled] - 1.0)
    print(f"sharded_emissivity_bins: counts equal {counts_eq}; "
          f"max |emis| rel dev {rel.max():.2e} over {int(filled.sum())} bins")
    status |= 0 if counts_eq and rel.max() < 1e-6 else 1

    record = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "check": "sharded_pallas_hw",
        "backend": jax.default_backend(),
        "n_devices": int(n_dev),
        "n_rays": int(padded.n_rays),
        "wall_unsharded_s": round(wall_u, 4),
        "wall_sharded_s": round(wall_s, 4),
        "wall_ratio": round(ratio, 4),
        "outputs_identical": identical,
        "bin_counts_equal": counts_eq,
        "emis_max_rel_dev": float(rel.max()),
        "pass": status == 0,
    }
    try:
        with open("BENCH_NOTES.jsonl", "a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError:
        pass
    print("PASS" if status == 0 else "FAIL")
    return status


if __name__ == "__main__":
    sys.exit(main())
