"""Integrator cores and on-device reductions (L1)."""

from raytrace_tpu.ops.integrate import (
    StepControl,
    trace,
    trace_compacted,
    STEPLIM,
    RK45_STEPLIM,
)
from raytrace_tpu.ops.reductions import radial_bin_profile, pixel_accumulate


def trace_auto(rays, spin, **kw):
    """Route a propagation to the fastest path for the active backend.

    On an accelerator backend, every destination the framework ships
    (ThetaLimit / DiscWithISCO / FlatPlane / SphericalShell, with or
    without a boundary override) runs through the Pallas kernel — the
    whole march in VMEM, f32 — with the fused multi-phase long-tail
    compaction; CPU and never-stopping velocity-field destinations take
    the XLA lock-step path, f64 on CPU. Accepts the trace_compacted
    keyword set.
    """
    import jax

    from raytrace_tpu.destinations import (
        DiscWithISCO,
        FlatPlane,
        SphericalShell,
        ThetaLimit,
    )

    dest = kw.get("dest")
    pallas_ok = (
        jax.default_backend() != "cpu"
        and kw.get("method", "rk45") in ("euler", "rk4", "rk45")
        and (
            dest is None
            or type(dest) in (ThetaLimit, DiscWithISCO, FlatPlane, SphericalShell)
        )
    )
    if pallas_ok:
        # the fused driver runs the whole compaction schedule (wide march,
        # device-side survivor gather, narrow stuck-ray tail, full-width
        # drain) as a single dispatch — no host round trips between phases,
        # which dominate on a network-tunneled chip
        from raytrace_tpu.ops.pallas_kernel import trace_pallas_fused

        method = kw.get("method", "rk45")
        steplim = kw.get("steplim")
        if steplim is None or steplim <= 0:
            # the XLA-path defaults are sized for f64 CPU; the kernel caps
            # stuck rays at the measured well-behaved maximum (BASELINE.md)
            steplim = 100_000 if method == "rk45" else 30_000
        return trace_pallas_fused(
            rays,
            spin,
            method=method,
            dest=dest,
            r_max=kw.get("r_max", 1000.0),
            steplim=steplim,
            ctrl=kw.get("ctrl", StepControl()),
            boundary=kw.get("boundary"),
        )
    return trace_compacted(rays, spin, **kw)


__all__ = [
    "StepControl",
    "trace",
    "trace_auto",
    "trace_compacted",
    "STEPLIM",
    "RK45_STEPLIM",
    "radial_bin_profile",
    "pixel_accumulate",
]
