"""Pallas TPU kernel for the geodesic march: the speed-of-light path.

The XLA while-loop integrator streams the full ~20-array ray state through
HBM on every lock-step iteration. This kernel instead marches each block of
rays to completion *inside* one pallas_call: the block's state lives in
VMEM for the whole propagation, the per-step math runs on the VPU, and HBM
sees exactly one load and one store per ray. Blocks are (8, 128) = 1024
rays — the f32 tile — and the grid walks the blocks; different blocks
retire after different iteration counts, so the long tail of
photon-sphere-orbiting rays only costs iterations for its own block.

The step math is the same `_euler_rk4_body` used by the reference-faithful
XLA path (the helpers are pure jnp and trace identically inside the
kernel), so the two paths produce bit-identical f32 results — tested in
tests/test_pallas.py.

f32 only (TPU native); the f64 accuracy story lives on the XLA/CPU path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.destinations import (
    DiscWithISCO,
    FlatPlane,
    SphericalShell,
    ThetaLimit,
)
from raytrace_tpu.geometry.kerr import horizon_radius
from raytrace_tpu.ops.compaction import auto_schedule, run_phases, run_phases_progress
from raytrace_tpu.ops.integrate import (
    StepControl,
    _euler_rk4_body,
    _fresh_propagation_state,
    _refine_theta_crossing,
    _rk45_body,
)
from raytrace_tpu.rays import RAY_STATUS_NUMERIC, RAY_STATUS_STEPLIM, RayBatch

# Block shape: rows of the f32 (8,128) tile marched together. 8 rows = one
# vreg per op (finest early-retirement granularity); larger blocks amortise
# instruction issue over several vregs at the cost of coarser retirement.
# Hardware A/B on the canonical workload under the round-4 unified
# two-phase schedule (v5e 2026-08-21, analysis/kernel_sweep.py to
# re-measure): RK4 1139/1339/1289M steps/s at 16/32/64 rows -> default 32.
# Tunable via RT_PALLAS_ROWS.
import os as _os

_ROWS = int(_os.environ.get("RT_PALLAS_ROWS", "32"))
# RK45's block height is swept independently (RT_PALLAS_ROWS_RK45): the
# adaptive body is larger and carries the FSAL rates, so its VMEM/issue
# balance differs from RK4's. Measured under the unified two-phase
# schedule (v5e 2026-08-21): pre-FSAL 414/481/494M steps/s at 16/32/64
# rows; with the FSAL carry 524M @ 32 vs 503M @ 64 (the extra carried
# arrays favour the smaller block) -> default 32.
_ROWS_RK45 = int(_os.environ.get("RT_PALLAS_ROWS_RK45", "32"))
_BLOCK = (_ROWS, 128)
_BLOCK_N = _BLOCK[0] * _BLOCK[1]


def _method_rows(method):
    return _ROWS_RK45 if method == "rk45" else _ROWS


def _method_unroll(method):
    return _UNROLL_RK45 if method == "rk45" else _UNROLL


# Body sub-steps per while iteration (fewer cond reductions), per method.
# Round-5 sustained-rate A/B at 32 rows (analysis/kernel_sweep.py, two
# independent runs each): RK4 unroll 8 beats 4 by a consistent +2.5-3%
# (2520/2539M vs 2443/2478M sustained) — the fixed-step body is small
# enough that eight copies still fit the issue window; RK45's larger
# 7-stage body is a wash (716 vs 702, then 701 vs 707) -> RK4 defaults
# to 8, RK45 stays at 4. Tunable via RT_PALLAS_UNROLL(_RK45).
_UNROLL = int(_os.environ.get("RT_PALLAS_UNROLL", "8"))
_UNROLL_RK45 = int(_os.environ.get("RT_PALLAS_UNROLL_RK45", "4"))

# RayBatch fields marched by the kernel, in a fixed order. Sign/gate/bool
# fields travel as f32/int32 to keep every ref a (8,128) tile.
_F_FIELDS = (
    "t", "r", "theta", "phi", "pt", "pr", "ptheta", "pphi",
    "k", "h", "Q", "rdot_sign", "thetadot_sign", "dt", "emit",
)
_I_FIELDS = ("steps", "status", "rdot_flips", "equatorial_crossings")
_B_FIELDS = ("r_was_positive", "theta_was_positive")


def _make_kernel(method, dest_kind, ctrl: StepControl, unroll: int):
    n_f, n_i, n_b = len(_F_FIELDS), len(_I_FIELDS), len(_B_FIELDS)

    def kernel(scalars_ref, limits_ref, *refs):
        spin = scalars_ref[0]
        r_max = scalars_ref[1]
        # termination radius: the event horizon, or a boundary override (a
        # neutron-star surface, raytracer.h:152-162) — the caller decides
        horizon = scalars_ref[2]
        p0 = scalars_ref[3]  # theta_lim | r_isco | incl   | r_shell
        p1 = scalars_ref[4]  # unused    | r_out  | phi0   | unused
        p2 = scalars_ref[5]  # unused    | th_lim | z_s    | unused
        # runtime step budgets: keeping these out of the trace means one
        # kernel compilation per (method, destination) total — essential
        # when each Mosaic compile takes minutes over a remote-compile link
        steplim = limits_ref[0]
        max_iters = limits_ref[1]

        n_total = n_f + n_i + n_b
        in_refs = refs[:n_total]
        out_refs = refs[n_total:]

        if dest_kind == "theta":
            dest = ThetaLimit(p0)
        elif dest_kind == "isco":
            dest = DiscWithISCO(r_isco=p0, r_out=p1, theta_lim=p2)
        elif dest_kind == "plane":
            dest = FlatPlane(incl=p0, phi0=p1, z_s=p2)
        elif dest_kind == "shell":
            dest = SphericalShell(r_shell=p0)
        else:
            raise ValueError(dest_kind)

        fields = {}
        for idx, name in enumerate(_F_FIELDS):
            fields[name] = in_refs[idx][:]
        for idx, name in enumerate(_I_FIELDS):
            fields[name] = in_refs[n_f + idx][:]
        for idx, name in enumerate(_B_FIELDS):
            # gates stay int32 in the while carry: Mosaic cannot legalize
            # i1 vectors through scf.yield
            fields[name] = in_refs[n_f + n_i + idx][:]
        fields["alpha"] = jnp.zeros_like(fields["t"])
        fields["beta"] = jnp.zeros_like(fields["t"])
        fields["redshift"] = jnp.ones_like(fields["t"])
        st0 = RayBatch(**fields)

        def to_bool(st):
            return st.replace(
                **{nm: getattr(st, nm) != 0 for nm in _B_FIELDS}
            )

        def to_int(st):
            return st.replace(
                **{nm: getattr(st, nm).astype(jnp.int32) for nm in _B_FIELDS}
            )

        def cond(carry):
            st = carry[0]
            it = carry[2]
            # int32 max-reduction instead of jnp.any: Mosaic routes boolean
            # reductions through f64 under jax_enable_x64 and then refuses
            # to scalarise them
            alive = jnp.max(st.active.astype(jnp.int32)) > 0
            return alive & (it < max_iters)

        def body(carry):
            # unrolled sub-steps amortise the loop's cond reduction and
            # branch; the active mask is recomputed per sub-step so
            # semantics are unchanged (a retired block just overshoots the
            # cond check by < unroll iterations)
            if method == "rk45":
                st_i, step, it, rates = carry
                st = to_bool(st_i)
                for _ in range(unroll):
                    st, step, rates = _rk45_body(
                        st, spin, horizon, dest, r_max, steplim, ctrl,
                        st.active, step, rates,
                    )
                return to_int(st), step, it + unroll, rates
            st_i, step, it = carry
            st = to_bool(st_i)
            for _ in range(unroll):
                st, _ = _euler_rk4_body(
                    st, spin, horizon, dest, r_max, steplim, ctrl, method,
                    st.active,
                )
            return to_int(st), step, it + unroll

        if method == "rk45":
            from raytrace_tpu.ops.integrate import _seed_rk45_rates

            init = (st0, st0.dt, jnp.int32(0),
                    _seed_rk45_rates(to_bool(st0), to_bool(st0).active, spin))
            out_carry = lax.while_loop(cond, body, init)
            final, step_f = out_carry[0], out_carry[1]
        else:
            final, step_f, _ = lax.while_loop(
                cond, body, (st0, st0.dt, jnp.int32(0))
            )
        final = final.replace(dt=step_f)
        stuck = (
        (final.status & (RAY_STATUS_STEPLIM | RAY_STATUS_NUMERIC)) != 0
    ) & (final.steps > 0)
        final = final.replace(steps=jnp.where(stuck, -final.steps, final.steps))

        for idx, name in enumerate(_F_FIELDS):
            out_refs[idx][:] = getattr(final, name)
        for idx, name in enumerate(_I_FIELDS):
            out_refs[n_f + idx][:] = getattr(final, name)
        for idx, name in enumerate(_B_FIELDS):
            out_refs[n_f + n_i + idx][:] = getattr(final, name).astype(jnp.int32)

    return kernel


@partial(
    jax.jit,
    static_argnames=("method", "dest_kind", "ctrl", "rows", "unroll"),
)
def _trace_pallas_padded(
    f_in, i_in, b_in, scalars, limits, *, method, dest_kind, ctrl, rows, unroll
):
    blk = (rows, 128)
    blk_n = rows * 128
    n_blocks = f_in[0].shape[0] // blk_n
    shape = (n_blocks * blk[0], blk[1])
    f_in = [a.reshape(shape) for a in f_in]
    i_in = [a.reshape(shape) for a in i_in]
    b_in = [a.reshape(shape) for a in b_in]

    kernel = _make_kernel(method, dest_kind, ctrl, unroll)

    block = pl.BlockSpec(blk, lambda i: (i, 0), memory_space=pltpu.VMEM)
    scal = pl.BlockSpec(memory_space=pltpu.SMEM)
    n_arrays = len(f_in) + len(i_in) + len(b_in)
    # Trace the kernel with x64 disabled: the package enables x64 globally
    # (for CPU/f64 accuracy), but under x64 bare Python scalars trace as
    # 64-bit constants, which Mosaic cannot lower. All kernel inputs are
    # explicitly f32/int32, so 32-bit weak-typing is exactly right here.
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[scal, scal] + [block] * n_arrays,
            out_specs=[block] * n_arrays,
            out_shape=[jax.ShapeDtypeStruct(shape, a.dtype) for a in f_in + i_in + b_in],
        )(scalars, limits, *f_in, *i_in, *b_in)
    return [o.reshape(-1) for o in outs]


def trace_pallas(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest=None,
    r_max=1000.0,
    steplim: int = 30_000,
    ctrl: StepControl = StepControl(),
    max_iters: int | None = None,
    resume: bool = False,
    refine_crossing: bool = True,
    rows: int | None = None,
    unroll: int | None = None,
    boundary=None,
) -> RayBatch:
    """Pallas-kernel twin of trace() (f32; ThetaLimit / DiscWithISCO /
    FlatPlane / SphericalShell destinations, optional boundary override).

    Pads the batch to a whole number of (rows, 128) blocks with dead rays
    and returns the same RayBatch contract as trace(), including the final
    theta-crossing back-interpolation (idempotent, so applying it per
    compaction phase is safe).

    ``rows``/``unroll`` pick the block height and body unrolling (defaults
    RT_PALLAS_ROWS/RT_PALLAS_UNROLL). Tall blocks amortise instruction
    issue; short blocks retire earlier and cost fewer vregs per iteration —
    the right choice for long-tail phases where one block marches alone.
    Each distinct (rows, unroll, method, destination) combination compiles
    its own Mosaic kernel: keep the set small. Destination parameters and
    the boundary override are SMEM scalars, not static args, so varying
    them never recompiles.
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)
    if isinstance(dest, DiscWithISCO):
        dest_kind = "isco"
        params = (dest.r_isco, dest.r_out, dest.theta_lim)
    elif isinstance(dest, ThetaLimit):
        dest_kind = "theta"
        params = (dest.theta_lim, 0.0, 0.0)
    elif isinstance(dest, FlatPlane):
        dest_kind = "plane"
        params = (dest.incl, dest.phi0, dest.z_s)
    elif isinstance(dest, SphericalShell):
        dest_kind = "shell"
        params = (dest.r_shell, 0.0, 0.0)
    else:
        raise NotImplementedError(
            "pallas path supports ThetaLimit/DiscWithISCO/FlatPlane/"
            f"SphericalShell, got {type(dest)}"
        )
    if max_iters is None:
        max_iters = steplim + steplim // 4 + 16
    if rows is None:
        rows = _method_rows(method)
    if unroll is None:
        unroll = _method_unroll(method)

    n = rays.n_rays
    pad = (-n) % (rows * 128)
    f32 = jnp.float32

    def pad_to(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    horizon = horizon_radius(spin) if boundary is None else boundary
    if not resume:
        rays = _fresh_propagation_state(rays, spin, horizon, method, ctrl)

    f_in = [pad_to(getattr(rays, f).astype(f32)) for f in _F_FIELDS]
    i_in = [
        pad_to(getattr(rays, f).astype(jnp.int32), fill=-1 if f == "steps" else 0)
        for f in _I_FIELDS
    ]
    b_in = [pad_to(getattr(rays, f).astype(jnp.int32)) for f in _B_FIELDS]
    scalars = jnp.stack(
        [jnp.asarray(v, f32) for v in (spin, r_max, horizon, *params)]
    )
    limits = jnp.asarray([steplim, max_iters], dtype=jnp.int32)

    outs = _trace_pallas_padded(
        f_in, i_in, b_in, scalars, limits,
        method=method, dest_kind=dest_kind, ctrl=ctrl, rows=rows, unroll=unroll,
    )
    n_f, n_i = len(_F_FIELDS), len(_I_FIELDS)
    upd = {}
    for idx, name in enumerate(_F_FIELDS):
        upd[name] = outs[idx][:n].astype(rays.r.dtype)
    for idx, name in enumerate(_I_FIELDS):
        upd[name] = outs[n_f + idx][:n]
    for idx, name in enumerate(_B_FIELDS):
        upd[name] = outs[n_f + n_i + idx][:n] != 0
    out = rays.replace(**upd)
    if refine_crossing:
        out = _refine_crossing_jit(out, dest, spin)
    return out


# jitted so the whole refinement is one dispatch(tunneled-TPU friendly);
# dest is a flax struct pytree, so its traced parameters flow through
_refine_crossing_jit = jax.jit(_refine_theta_crossing)


@partial(
    jax.jit,
    static_argnames=("method", "schedule", "steplim", "ctrl", "r_max"),
)
def _trace_pallas_fused_jit(
    rays, spin, dest, boundary, *, method, schedule, steplim, ctrl, r_max
):
    total = steplim + steplim // 4 + 16
    horizon = horizon_radius(spin) if boundary is None else boundary
    # Fresh-propagation setup happens once here, on the full batch, so a
    # schedule whose FIRST phase is width-compacted still gets the gate
    # reset and (for rk45) the dt seeding; every kernel call below resumes.
    out = _fresh_propagation_state(rays, spin, horizon, method, ctrl)

    def phase(batch, s, iters, rows, unroll):
        return trace_pallas(
            batch, s, method=method, dest=dest, r_max=r_max, steplim=steplim,
            ctrl=ctrl, max_iters=iters, refine_crossing=False, rows=rows,
            unroll=unroll, resume=True, boundary=boundary,
        )

    out = run_phases(out, spin, schedule, total, phase)
    return _refine_theta_crossing(out, dest, spin)


def trace_pallas_phased(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest=None,
    r_max=1000.0,
    steplim: int = 30_000,
    ctrl: StepControl = StepControl(),
    schedule=None,
    boundary=None,
) -> RayBatch:
    """Host-dispatched twin of trace_pallas_fused with progress reporting.

    Runs the same compaction schedule, but one kernel dispatch per phase
    with a progress-bar update (iterations used / budget + live survivor
    count) between dispatches (compaction.run_phases_progress, the shared
    host driver) — the compiled analogue of the reference's in-loop
    progress bar (progress_bar.h:25-74, raytracer.cpp:107-115). Costs a
    couple of host round trips per phase (~30 ms each on a tunneled chip),
    so trace_auto selects it only when progress is requested.
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)
    total = steplim + steplim // 4 + 16
    if schedule is None:
        schedule = auto_schedule(rays.n_rays, total, rows=_method_rows(method), unroll=_method_unroll(method))
    horizon = horizon_radius(spin) if boundary is None else boundary
    out = _fresh_propagation_state(rays, spin, horizon, method, ctrl)

    def phase(batch, s, iters, rows, unroll):
        return trace_pallas(
            batch, s, method=method, dest=dest, r_max=r_max, steplim=steplim,
            ctrl=ctrl, max_iters=iters, refine_crossing=False, rows=rows,
            unroll=unroll, resume=True, boundary=boundary,
        )

    out = run_phases_progress(out, spin, schedule, total, phase,
                              label=f"march[{method}] {rays.n_rays} rays")
    return _refine_crossing_jit(out, dest, spin)


def trace_pallas_fused(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest=None,
    r_max=1000.0,
    steplim: int = 30_000,
    ctrl: StepControl = StepControl(),
    schedule=None,
    boundary=None,
) -> RayBatch:
    """Multi-phase pallas march fused into ONE device dispatch.

    A naive host-driven compaction loop pays 3+ host<->device round trips
    per phase boundary (activity mask to host, gather, scatter) — ~30 ms
    each on a tunneled chip, which dominated the bench wall. Here the whole
    schedule (march -> device-side compaction via fixed-width nonzero
    gather -> march -> ... -> full-width drain -> crossing refinement) is a
    single jitted program: phase widths are static, chosen up front by
    ``auto_schedule`` (or passed explicitly), so the only host interaction
    is the final fetch. The trailing drain phase (ops/compaction.py)
    finishes any lanes the static widths could not hold, with identical
    resume semantics — no host fallback needed, which also makes this
    function safe to call inside shard_map (parallel/sharding.py).
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)
    total = steplim + steplim // 4 + 16
    if schedule is None:
        # rows/unroll from the module tunables so RT_PALLAS_ROWS/_UNROLL
        # reach the fused production path (the one trace_auto routes to),
        # not just bare trace_pallas — kernel_sweep A/Bs this path.
        schedule = auto_schedule(rays.n_rays, total, rows=_method_rows(method), unroll=_method_unroll(method))
    return _trace_pallas_fused_jit(
        rays, spin, dest, boundary,
        method=method, schedule=tuple(tuple(p) for p in schedule),
        steplim=steplim, ctrl=ctrl, r_max=float(r_max),
    )
