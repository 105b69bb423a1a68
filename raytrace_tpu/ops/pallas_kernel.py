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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytrace_tpu.destinations import DiscWithISCO, ThetaLimit
from raytrace_tpu.geometry.kerr import horizon_radius
from raytrace_tpu.ops.integrate import (
    StepControl,
    _euler_rk4_body,
    _refine_theta_crossing,
    _rk45_body,
    _seed_rk45_step,
)
from raytrace_tpu.rays import RAY_STATUS_STEPLIM, RayBatch

# Block shape: rows of the f32 (8,128) tile marched together. 8 rows = one
# vreg per op (finest early-retirement granularity); larger blocks amortise
# instruction issue over several vregs at the cost of coarser retirement.
# Hardware A/B on the canonical workload (v5e): 8 rows 252-272M steps/s,
# 16 rows 320M, 32 rows 259-300M, 64 rows 274M -> default 16. Tunable via
# RT_PALLAS_ROWS.
import os as _os

_ROWS = int(_os.environ.get("RT_PALLAS_ROWS", "16"))
_BLOCK = (_ROWS, 128)
_BLOCK_N = _BLOCK[0] * _BLOCK[1]
# Body sub-steps per while iteration (fewer cond reductions): measured on
# v5e at 16 rows — 1: 285M, 2: 346M, 4: 324M steps/s -> default 2.
_UNROLL = int(_os.environ.get("RT_PALLAS_UNROLL", "2"))

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
        horizon = scalars_ref[2]
        p0 = scalars_ref[3]  # theta_lim | r_isco
        p1 = scalars_ref[4]  # unused    | r_out
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
        else:
            dest = DiscWithISCO(r_isco=p0, r_out=p1)

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
            st, step, it = carry
            # int32 max-reduction instead of jnp.any: Mosaic routes boolean
            # reductions through f64 under jax_enable_x64 and then refuses
            # to scalarise them
            alive = jnp.max(st.active.astype(jnp.int32)) > 0
            return alive & (it < max_iters)

        def body(carry):
            st_i, step, it = carry
            st = to_bool(st_i)
            # unrolled sub-steps amortise the loop's cond reduction and
            # branch; the active mask is recomputed per sub-step so
            # semantics are unchanged (a retired block just overshoots the
            # cond check by < unroll iterations)
            for _ in range(unroll):
                active = st.active
                if method == "rk45":
                    st, step = _rk45_body(
                        st, spin, horizon, dest, r_max, steplim, ctrl, active, step
                    )
                else:
                    st, _ = _euler_rk4_body(
                        st, spin, horizon, dest, r_max, steplim, ctrl, method, active
                    )
            return to_int(st), step, it + unroll

        final, step_f, _ = lax.while_loop(
            cond, body, (st0, st0.dt, jnp.int32(0))
        )
        final = final.replace(dt=step_f)
        stuck = ((final.status & RAY_STATUS_STEPLIM) != 0) & (final.steps > 0)
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
) -> RayBatch:
    """Pallas-kernel twin of trace() (f32, ThetaLimit / DiscWithISCO).

    Pads the batch to a whole number of (rows, 128) blocks with dead rays
    and returns the same RayBatch contract as trace(), including the final
    theta-crossing back-interpolation (idempotent, so applying it per
    compaction phase is safe).

    ``rows``/``unroll`` pick the block height and body unrolling (defaults
    RT_PALLAS_ROWS/RT_PALLAS_UNROLL). Tall blocks amortise instruction
    issue; short blocks retire earlier and cost fewer vregs per iteration —
    the right choice for long-tail phases where one block marches alone.
    Each distinct (rows, unroll, method, destination) combination compiles
    its own Mosaic kernel: keep the set small.
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)
    if isinstance(dest, DiscWithISCO):
        dest_kind = "isco"
        p0, p1 = dest.r_isco, dest.r_out
    elif isinstance(dest, ThetaLimit):
        dest_kind = "theta"
        p0, p1 = dest.theta_lim, 0.0
    else:
        raise NotImplementedError(f"pallas path supports ThetaLimit/DiscWithISCO, got {type(dest)}")
    if max_iters is None:
        max_iters = steplim + steplim // 4 + 16
    if rows is None:
        rows = _ROWS
    if unroll is None:
        unroll = _UNROLL

    n = rays.n_rays
    pad = (-n) % (rows * 128)
    f32 = jnp.float32

    def pad_to(a, fill=0):
        return jnp.pad(a, (0, pad), constant_values=fill) if pad else a

    horizon = horizon_radius(spin)
    if not resume:
        # propagation gate reset (matches trace())
        rays = rays.replace(
            r_was_positive=jnp.zeros_like(rays.r_was_positive),
            theta_was_positive=jnp.ones_like(rays.theta_was_positive),
        )
        if method == "rk45":
            rays = rays.replace(dt=_seed_rk45_step(rays, spin, horizon, ctrl))

    f_in = [pad_to(getattr(rays, f).astype(f32)) for f in _F_FIELDS]
    i_in = [
        pad_to(getattr(rays, f).astype(jnp.int32), fill=-1 if f == "steps" else 0)
        for f in _I_FIELDS
    ]
    b_in = [pad_to(getattr(rays, f).astype(jnp.int32)) for f in _B_FIELDS]
    scalars = jnp.asarray(
        [spin, r_max, horizon, p0, p1], dtype=f32
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


# jitted so the whole refinement is one dispatch (tunneled-TPU friendly);
# dest is a flax struct pytree, so its traced parameters flow through
_refine_crossing_jit = jax.jit(_refine_theta_crossing)


@jax.jit
def _active_mask(st: RayBatch):
    return st.active


@jax.jit
def _gather_sub(out: RayBatch, full_idx, live):
    sub = jax.tree.map(lambda a: a[full_idx], out)
    # padding lanes are dead clones of ray 0
    return sub.replace(
        steps=jnp.where(live, sub.steps, jnp.full_like(sub.steps, -1))
    )


@jax.jit
def _scatter_back(out: RayBatch, sub: RayBatch, src_idx):
    n = src_idx.shape[0]
    return jax.tree.map(lambda a, b: a.at[src_idx].set(b[:n]), out, sub)


def _auto_schedule(n: int, total: int):
    """Static compaction schedule: (iters, width, rows, unroll) per phase.

    Tuned against the measured per-ray step distribution of the canonical
    disc workloads (sharply bimodal: every ray needs a few hundred steps,
    ~0.04% photon-sphere creepers run to the step limit): a full-width
    opening march, one mid-width phase catching the p99 cluster, then the
    long stuck-ray tail in short (8,128) blocks where each iteration costs
    half the vregs. Widths carry ~25% headroom over the measured survivor
    counts; a workload that overflows them is drained correctly (if more
    slowly) by the host fallback in trace_pallas_fused.
    """
    bn16, bn8 = 16 * 128, 8 * 128
    full = -(-n // bn16) * bn16
    w2 = -(-int(0.45 * n) // bn16) * bn16
    w3 = -(-max(2 * bn8, n // 24) // bn8) * bn8
    if w2 >= full or n <= 4 * bn16:
        return ((total, None, 16, 2),)
    sched = [(512, None, 16, 2), (320, w2, 16, 2)]
    sched.append((total, w3, 8, 4) if w3 < w2 else (total, w2, 16, 2))
    return tuple(sched)


def _compact_device(out: RayBatch, width: int):
    """Gather the active lanes into a width-wide sub-batch, on device.

    ``jnp.nonzero(size=width)`` pads with index n (out of bounds): gathered
    as zeros and marked dead (steps = -1), and dropped again by the
    out-of-bounds scatter on the way back. If more than ``width`` lanes are
    active, the excess stays behind untouched (still active in ``out``) —
    the caller detects that via the final active count.
    """
    n = out.n_rays
    active = out.active
    count = jnp.sum(active.astype(jnp.int32))
    idx = jnp.nonzero(active, size=width, fill_value=n)[0].astype(jnp.int32)
    live = jnp.arange(width, dtype=jnp.int32) < count
    sub = jax.tree.map(
        # fill_value must be static (it is baked into the gather primitive)
        lambda a: jnp.take(a, idx, axis=0, mode="fill", fill_value=0),
        out,
    )
    sub = sub.replace(steps=jnp.where(live, sub.steps, jnp.full_like(sub.steps, -1)))
    return sub, idx


def _scatter_device(out: RayBatch, sub: RayBatch, idx):
    return jax.tree.map(lambda o, s: o.at[idx].set(s, mode="drop"), out, sub)


@partial(
    jax.jit,
    static_argnames=("method", "schedule", "steplim", "ctrl", "r_max"),
)
def _trace_pallas_fused_jit(rays, spin, dest, *, method, schedule, steplim, ctrl, r_max):
    n = rays.n_rays
    total = steplim + steplim // 4 + 16
    out, used, first = rays, 0, True
    for iters, width, rows, unroll in schedule:
        iters = min(iters, total - used)
        if iters <= 0:
            break
        kw = dict(
            method=method, dest=dest, r_max=r_max, steplim=steplim, ctrl=ctrl,
            max_iters=iters, refine_crossing=False, rows=rows, unroll=unroll,
        )
        if width is None or width >= n:
            out = trace_pallas(out, spin, resume=not first, **kw)
        else:
            sub, idx = _compact_device(out, width)
            sub = trace_pallas(sub, spin, resume=True, **kw)
            out = _scatter_device(out, sub, idx)
        used += iters
        first = False
    out = _refine_theta_crossing(out, dest, spin)
    return out, jnp.sum(out.active.astype(jnp.int32))


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
) -> RayBatch:
    """Multi-phase pallas march fused into ONE device dispatch.

    trace_pallas_compacted() pays 3+ host<->device round trips per phase
    boundary (activity mask to host, gather, scatter) — ~30 ms each on a
    tunneled chip, which dominated the bench wall. Here the whole schedule
    (march -> device-side compaction via fixed-width nonzero gather ->
    march -> ... -> crossing refinement) is a single jitted program: phase
    widths are static, chosen up front by ``_auto_schedule`` (or passed
    explicitly), so the only host interaction is the final fetch.

    Static widths cannot adapt to the workload, so each carries headroom;
    if a phase still overflows (more survivors than width), the excess
    lanes are simply left mid-flight — detected by the returned active
    count and drained by the host-loop fallback (identical resume
    semantics, so the result is exactly as if the schedule had fit).
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)
    total = steplim + steplim // 4 + 16
    if schedule is None:
        schedule = _auto_schedule(rays.n_rays, total)
    out, n_left = _trace_pallas_fused_jit(
        rays, spin, dest,
        method=method, schedule=tuple(tuple(p) for p in schedule),
        steplim=steplim, ctrl=ctrl, r_max=float(r_max),
    )
    if int(n_left) > 0:
        out = _host_drain(
            out, spin, method=method, dest=dest, r_max=r_max,
            steplim=steplim, ctrl=ctrl, max_iters=total,
        )
    return out


def _host_drain(out, spin, *, method, dest, r_max, steplim, ctrl, max_iters):
    """Finish any still-active lanes with host-driven compaction passes.

    One pass suffices when max_iters covers the full step budget (every ray
    either terminates or exhausts steplim and is flagged stuck); the loop
    guards the general case.
    """
    import numpy as np

    while True:
        idx = np.flatnonzero(np.asarray(_active_mask(out)))
        if idx.size == 0:
            return out
        kw = dict(
            method=method, dest=dest, r_max=r_max, steplim=steplim, ctrl=ctrl,
            max_iters=max_iters, resume=True,
        )
        width = max(8 * 128, 1 << int(idx.size - 1).bit_length())
        if width >= out.n_rays:
            out = trace_pallas(out, spin, **kw)
            continue
        full_idx = jnp.asarray(
            np.concatenate([idx, np.zeros(width - idx.size, dtype=idx.dtype)]),
            jnp.int32,
        )
        live = jnp.asarray(np.arange(width) < idx.size)
        sub = _gather_sub(out, full_idx, live)
        sub = trace_pallas(sub, spin, rows=8, unroll=4, **kw)
        out = _scatter_back(out, sub, jnp.asarray(idx, jnp.int32))


def trace_pallas_compacted(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest=None,
    r_max=1000.0,
    steplim: int = 30_000,
    ctrl: StepControl = StepControl(),
    phase_iters: int = 1024,
    growth: int = 32,
) -> RayBatch:
    """Multi-phase pallas march with shrinking batch width.

    The full batch runs ``phase_iters`` lock-step iterations (covering the
    p99 mass of rays — the step distribution is sharply bimodal, median
    ~400 vs a 30k stuck-ray tail on the canonical lamppost workload); the
    still-active survivors are then gathered into a power-of-two-wide
    sub-batch (floor one (8,128) block) and marched for a geometrically
    growing number of iterations, repeating until the step budget is spent.
    Measured on the bench workload this cuts the long-tail cost from more
    wall time than the whole main phase (54 survivors padded to a fixed
    8192-wide tail) to one block running alone.

    Phase-boundary costs are kept to a handful of dispatches: this chip may
    sit behind a network tunnel where every eager op is a round trip, so
    the gather/scatter/mask ops are jitted pytree-wide (one dispatch each)
    and ``growth`` is steep so the canonical workload runs exactly two
    phases (schedule chosen by simulating alternatives against measured
    per-ray step counts: 1024 + single tail issues ~27% fewer
    lane-iterations than 2048-based schedules). Iteration budgets live in SMEM scalars, so only each distinct
    *width* compiles a kernel — a handful of power-of-two shapes ever,
    reused across calls. Semantics identical to trace_pallas(): per-ray
    step counts, statuses and the adaptive dt carry across phases.
    """
    import numpy as np

    total = steplim + steplim // 4 + 16
    out = trace_pallas(
        rays, spin, method=method, dest=dest, r_max=r_max, steplim=steplim,
        ctrl=ctrl, max_iters=min(phase_iters, total),
    )
    used = min(phase_iters, total)
    this_phase = phase_iters

    while used < total:
        idx = np.flatnonzero(np.asarray(_active_mask(out)))
        if idx.size == 0:
            return out
        this_phase = min(this_phase * growth, total - used)
        width = max(_BLOCK_N, 1 << int(idx.size - 1).bit_length())
        if width >= out.n_rays:
            # no compaction possible: continue full-width
            out = trace_pallas(
                rays=out, spin=spin, method=method, dest=dest, r_max=r_max,
                steplim=steplim, ctrl=ctrl, max_iters=this_phase, resume=True,
            )
            used += this_phase
            continue
        full_idx = jnp.asarray(
            np.concatenate([idx, np.zeros(width - idx.size, dtype=idx.dtype)]),
            jnp.int32,
        )
        live = jnp.asarray(np.arange(width) < idx.size)
        sub = _gather_sub(out, full_idx, live)
        sub = trace_pallas(
            sub, spin, method=method, dest=dest, r_max=r_max, steplim=steplim,
            ctrl=ctrl, max_iters=this_phase, resume=True,
        )
        used += this_phase
        out = _scatter_back(out, sub, jnp.asarray(idx, jnp.int32))
    return out
