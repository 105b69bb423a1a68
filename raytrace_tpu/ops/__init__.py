"""Integrator cores and on-device reductions (L1)."""

from raytrace_tpu.ops.integrate import (
    StepControl,
    trace,
    trace_compacted,
    STEPLIM,
    RK45_STEPLIM,
)
from raytrace_tpu.ops.reductions import radial_bin_profile, pixel_accumulate


def pallas_supported(method="rk45", dest=None) -> bool:
    """Single Pallas-routing predicate, shared by ``trace_auto`` and the
    shard-local engine selection in ``raytrace_tpu.parallel.sharding``.

    True when the march can run through the Mosaic kernel: an accelerator
    backend, a fixed-step or DOPRI5 method, and one of the destination
    surfaces the kernel implements (ThetaLimit / DiscWithISCO / FlatPlane /
    SphericalShell, with or without a boundary override). CPU and
    never-stopping velocity-field destinations take the XLA lock-step path.
    """
    import jax

    from raytrace_tpu.destinations import (
        DiscWithISCO,
        FlatPlane,
        SphericalShell,
        ThetaLimit,
    )

    return (
        jax.default_backend() != "cpu"
        and method in ("euler", "rk4", "rk45")
        and (
            dest is None
            or type(dest) in (ThetaLimit, DiscWithISCO, FlatPlane, SphericalShell)
        )
    )


def kernel_steplim(method, steplim=None) -> int:
    """Stuck-ray cap for the Pallas kernel when the caller gave none.

    The XLA-path defaults are sized for f64 CPU. RK4 is capped at 30k —
    just above the measured well-behaved maximum for the benched workloads.
    RK45 keeps the reference's own RK45_STEPLIM = 1e5 (raytracer.h:33-39):
    well-behaved RK45 rays stay under ~35k steps, but near-separatrix rays
    between "well-behaved" and "stuck" legitimately use the 35k-100k range
    at tight tolerances, and the fused compaction schedule makes the tail
    cheap (narrow blocks), so the conservative cap costs little.
    """
    if steplim is None or steplim <= 0:
        return 100_000 if method == "rk45" else 30_000
    return steplim


def trace_auto(rays, spin, **kw):
    """Route a propagation to the fastest path for the active backend.

    On an accelerator backend, every supported destination runs through the
    Pallas kernel — the whole march in VMEM, f32 — with the fused
    multi-phase long-tail compaction; otherwise the XLA lock-step path,
    f64 on CPU. Accepts the trace_compacted keyword set.

    ``progress=True`` (or RT_PROGRESS=1 in the environment) dispatches the
    compaction schedule phase by phase with a terminal progress bar
    between dispatches, on either engine — the compiled analogue of the
    reference's in-loop progress bar (raytracer.cpp:107-115).
    """
    import os

    method = kw.get("method", "rk45")
    dest = kw.get("dest")
    progress = kw.pop("progress", None)
    if progress is None:
        progress = os.environ.get("RT_PROGRESS", "0") == "1"
    if pallas_supported(method, dest):
        # the fused driver runs the whole compaction schedule (wide march,
        # device-side survivor gather, narrow stuck-ray tail, full-width
        # drain) as a single dispatch — no host round trips between phases,
        # which dominate on a network-tunneled chip
        from raytrace_tpu.ops.pallas_kernel import (
            trace_pallas_fused,
            trace_pallas_phased,
        )

        run = trace_pallas_phased if progress else trace_pallas_fused
        return run(
            rays,
            spin,
            method=method,
            dest=dest,
            r_max=kw.get("r_max", 1000.0),
            steplim=kernel_steplim(method, kw.get("steplim")),
            ctrl=kw.get("ctrl", StepControl()),
            boundary=kw.get("boundary"),
        )
    return trace_compacted(rays, spin, progress=progress, **kw)


__all__ = [
    "StepControl",
    "kernel_steplim",
    "pallas_supported",
    "trace",
    "trace_auto",
    "trace_compacted",
    "STEPLIM",
    "RK45_STEPLIM",
    "radial_bin_profile",
    "pixel_accumulate",
]
