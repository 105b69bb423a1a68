"""Differentiable geodesic tracing.

``trace()`` uses lax.while_loop, which is not reverse-mode differentiable;
this module provides ``trace_scan`` — the same masked lock-step march over a
*fixed* number of iterations via lax.scan with gradient checkpointing — so
the whole pipeline (source constants -> march -> redshift -> smooth
observables) is differentiable with respect to spin, source position /
height, velocity and emissivity parameters.

The reference has no gradient capability at all; this is the new
framework's north star (BASELINE.json): parameter gradients for fitting
observed emissivity profiles / line profiles / images.

Differentiation notes:
  * Masked freezing is AD-transparent: a frozen lane's state is an identity
    function of the carry, so gradients flow through the step at which each
    ray terminated.
  * The turning-point sign machinery uses sqrt(|x|), whose derivative blows
    up at turning points; rays passing exactly through one contribute noisy
    gradients (the underlying dynamics is genuinely non-smooth there:
    photon-sphere chaos). Validate gradients on smooth observables over
    robust ray sets, as the reference's own statistical test methodology
    suggests for forward values (SURVEY.md §4).
  * Step counts must cover the slowest ray of interest; unterminated rays
    simply keep integrating (their contribution to terminal-masked
    observables is zero but their gradient work is wasted), so pick
    n_steps around the p99 of the workload's step distribution.
  * Which parameters are *usefully* differentiable is physics, not
    implementation: gamma enters through a smooth analytic weight (exact
    gradients); source height/position move individual landing points
    smoothly (validated against the reference binary's finite differences,
    tests/test_diff.py); but the SPIN response of inner-disc observables
    at high spin is dominated by discrete membership changes — rays
    crossing the capture/escape boundary — whose boundary members are
    exactly the chaotic set. Stop-gradded masks cannot carry that term,
    and the rays that do are Lyapunov-amplified, so ensemble spin
    gradients serve sensitivity analysis on membership-stable observables
    (the FD-validated regime), not black-box descent through capture
    transitions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from raytrace_tpu.destinations import Destination, ThetaLimit
from raytrace_tpu.geometry.kerr import horizon_radius
from raytrace_tpu.ops.integrate import (
    StepControl,
    _euler_rk4_body,
    _refine_theta_crossing,
    _rk45_body,
    _seed_rk45_step,
)
from raytrace_tpu.rays import RAY_STATUS_NUMERIC, RAY_STATUS_STEPLIM, RayBatch


@partial(
    jax.jit,
    static_argnames=("method", "n_steps", "ctrl", "checkpoint_every", "refine_crossing"),
)
def trace_scan(
    rays: RayBatch,
    spin,
    *,
    method: str = "rk4",
    dest: Destination = None,
    r_max=1000.0,
    n_steps: int = 2048,
    ctrl: StepControl = StepControl(),
    boundary=None,
    checkpoint_every: int = 64,
    refine_crossing: bool = True,
) -> RayBatch:
    """Fixed-iteration differentiable twin of trace().

    Runs exactly n_steps lock-step iterations (terminated lanes frozen) as
    ceil(n_steps/checkpoint_every) scanned chunks, each rematerialised on
    the backward pass — memory O(n_steps/checkpoint_every) states instead
    of O(n_steps).
    """
    if dest is None:
        dest = ThetaLimit(jnp.pi / 2)

    horizon = horizon_radius(spin) if boundary is None else boundary
    steplim = n_steps + 1  # per-ray STEPLIM can't trigger within the budget

    # gate resets consume the incoming leaves (x & False / x | True) rather
    # than allocating fresh constants, so the scan carry keeps the batch's
    # device-variance under shard_map vma checking
    rays = rays.replace(
        r_was_positive=rays.r_was_positive & False,
        theta_was_positive=rays.theta_was_positive | True,
    )
    if method == "rk45":
        rays = rays.replace(dt=_seed_rk45_step(rays, spin, horizon, ctrl))

    n_chunks = -(-n_steps // checkpoint_every)

    def one_step(carry, _):
        st, step = carry
        active = st.active
        if method == "rk45":
            st, step = _rk45_body(
                st, spin, horizon, dest, r_max, steplim, ctrl, active, step
            )
        else:
            st, _unused = _euler_rk4_body(
                st, spin, horizon, dest, r_max, steplim, ctrl, method, active
            )
        return (st, step), None

    # outer scan of rematerialised chunks, inner scan of steps: the forward
    # pass stores only chunk boundaries; the backward pass recomputes one
    # chunk at a time, whose inner scan then holds checkpoint_every
    # residual states.
    @jax.checkpoint
    def chunk(carry, _):
        carry, _ = lax.scan(one_step, carry, None, length=checkpoint_every)
        return carry, None

    (final, step_f), _ = lax.scan(chunk, (rays, rays.dt), None, length=n_chunks)
    final = final.replace(dt=step_f)

    stuck = (
        (final.status & (RAY_STATUS_STEPLIM | RAY_STATUS_NUMERIC)) != 0
    ) & (final.steps > 0)
    final = final.replace(steps=jnp.where(stuck, -final.steps, final.steps))
    if refine_crossing:
        final = _refine_theta_crossing(final, dest, spin)
    return final


def smooth_radial_observable(out: RayBatch, mask, weights, r0, sigma_ln=0.25):
    """A smooth scalar observable for gradient work: the weights of masked
    rays accumulated under a log-normal radial window centred on r0.

    Bin-histogram observables are piecewise constant in the parameters
    (rays jump bins); this Gaussian kernel in ln r is the smooth analogue
    the gradients need.
    """
    r_safe = jnp.where(mask, out.r, r0)
    w_safe = jnp.where(mask, weights, 0.0)
    w = jnp.exp(-0.5 * ((jnp.log(r_safe) - jnp.log(r0)) / sigma_ln) ** 2)
    return jnp.sum(jnp.where(mask, w * w_safe, 0.0))


def emissivity_observable_from_angles(spin, h_source, gamma, cosalpha, beta,
                                      dead, *, n_steps=3072, r0=5.0,
                                      sigma_ln=0.3, r_max=500.0):
    """Differentiable emissivity observable for an explicit angle set.

    The per-ray kernel shared by ``emissivity_gradient_pipeline`` (full grid,
    one device) and ``parallel.sharded_emissivity_gradient`` (angle arrays
    sharded over the ray mesh axis): lamppost constants -> differentiable RK4
    march -> GR redshift -> smooth radial emissivity observable. The angle
    arrays are static grid geometry (not differentiated); spin / h / gamma
    are the differentiable parameters.
    """
    from raytrace_tpu.geometry import isco_radius
    from raytrace_tpu.ops.redshift import apply_redshift, redshift_start
    from raytrace_tpu.rays import RAY_STATUS_DEST
    from raytrace_tpu.sources import point_source_from_angles

    rays = point_source_from_angles(
        (0.0, h_source, 1e-3, 0.0), V=0.0, spin=spin,
        cosalpha=cosalpha, beta=beta, dead=dead,
    )
    rays = redshift_start(rays, spin, V=0.0)
    out = trace_scan(rays, spin, method="rk4", r_max=r_max, n_steps=n_steps)
    out = apply_redshift(out, spin, V=-1.0)
    hit = (
        out.ok
        & ((out.status & RAY_STATUS_DEST) != 0)
        & (out.redshift > 0)
        & (out.r >= isco_radius(spin))
    )
    # stop_gradient on the mask: it is piecewise constant in the parameters;
    # its jumps are the chaotic separatrix noise the smooth observable
    # averages over.
    hit = lax.stop_gradient(hit)
    g_safe = jnp.where(hit, out.redshift, 1.0)
    return smooth_radial_observable(out, hit, 1.0 / g_safe**gamma, r0, sigma_ln)


def emissivity_binned_profile(spin, h_source, gamma, grid, *, r_min=None,
                              r_disc=500.0, n_r=100, logbin_r=True,
                              n_steps=6144, r_max=1000.0, method="rk4",
                              checkpoint_every=64):
    """Differentiable twin of ``apps.emissivity.compute``'s binned output.

    Same bins, same hit criterion (apps.emissivity.disc_hit_mask), same
    per-ray emissivity weight 1/g^gamma and proper-area normalisation as
    the app — but marched with trace_scan so the profile is differentiable
    with respect to (spin, h_source, gamma). The hit mask and bin
    assignment are stop-gradiented: they are piecewise constant in the
    parameters, and their jump contributions (rays migrating between bins)
    are exactly what the reference-FD validation methodology gates out
    (count-gated bins / smooth radial functionals — tests/test_diff.py).

    Returns (emis, counts): per-bin area-normalised emissivity [n_r] and
    ray counts [n_r].
    """
    from raytrace_tpu.apps.emissivity import disc_hit_mask
    from raytrace_tpu.geometry import integrate_disc_area_bins, isco_radius
    from raytrace_tpu.ops.redshift import apply_redshift, redshift_start
    from raytrace_tpu.ops.reductions import bin_edges, radial_bin_profile
    from raytrace_tpu.sources import grid_angles, point_source_from_angles

    rmin = isco_radius(spin) if r_min is None else r_min
    disc_r, disc_width, dr = bin_edges(rmin, r_disc, n_r, logbin_r)
    areas = integrate_disc_area_bins(disc_r, disc_r + disc_width, spin)

    cosalpha, beta, dead = grid_angles(grid)
    rays = point_source_from_angles(
        (0.0, h_source, 1e-3, 0.0), V=0.0, spin=spin,
        cosalpha=cosalpha, beta=beta, dead=dead,
    )
    rays = redshift_start(rays, spin, V=0.0)
    out = trace_scan(rays, spin, method=method, r_max=r_max, n_steps=n_steps,
                     checkpoint_every=checkpoint_every)
    out = apply_redshift(out, spin, V=-1.0)
    mask = lax.stop_gradient(disc_hit_mask(out, spin))
    g = jnp.where(mask, out.redshift, 1.0)
    counts, sums = radial_bin_profile(
        lax.stop_gradient(out.r), mask, {"emis": 1.0 / g**gamma},
        rmin, dr, n_r, logbin_r,
    )
    return sums["emis"] / areas, counts


def emissivity_gradient_pipeline(spin, h_source, gamma, grid, *, n_steps=3072,
                                 r0=5.0, sigma_ln=0.3, r_max=500.0):
    """End-to-end differentiable emissivity observable E(spin, h, gamma).

    Builds the lamppost, marches with the differentiable RK4 core, applies
    the GR redshift, and evaluates the smooth radial emissivity observable.
    All three arguments are differentiable; use jax.grad on this directly.
    """
    from raytrace_tpu.sources import grid_angles

    cosalpha, beta, dead = grid_angles(grid)
    return emissivity_observable_from_angles(
        spin, h_source, gamma, cosalpha, beta, dead,
        n_steps=n_steps, r0=r0, sigma_ln=sigma_ln, r_max=r_max,
    )
