"""RK45 accept/reject observability (core accounting).

The reference found its worst integrator bug through a step-count
histogram in its perf test (/root/reference/src/tests/
integrator_perf_test.cpp:119-169). The masked lock-step DOPRI5 has a
second hidden cost plain step counts cannot show: *rejected trials* —
iterations a lane spends re-attempting a step the error controller
refused — which consume full 7-stage evaluations but advance nothing.
This module surfaces them per lane so the RK4 <-> RK45 throughput ratio
decomposes into stage-count cost vs rejection waste.

Method: a fixed-iteration scan over the production ``_rk45_body``
carrying one extra per-lane counter of active iterations. The body
increments ``steps`` only on accepted steps and flip-skips, so per lane
``rejects = trials - (|steps_final| - |steps_initial|)``. No RayBatch
field is added: the counter lives in the scan carry only.

Callers: bench.py secondary rows, rt-perf-test, and the
``analysis/rk45_rejects.py`` study CLI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from raytrace_tpu.destinations import ThetaLimit
from raytrace_tpu.geometry.kerr import horizon_radius
from raytrace_tpu.ops.integrate import (StepControl, _rk45_body,
                                        _seed_rk45_rates, _seed_rk45_step)
from raytrace_tpu.rays import RayBatch


@partial(jax.jit, static_argnames=("n_steps", "ctrl"))
def _march_with_trials(rays: RayBatch, spin, r_max, n_steps: int,
                       ctrl: StepControl):
    dest = ThetaLimit(jnp.pi / 2)
    horizon = horizon_radius(spin)
    steplim = n_steps + 1
    rays = rays.replace(
        r_was_positive=rays.r_was_positive & False,
        theta_was_positive=rays.theta_was_positive | True,
        dt=_seed_rk45_step(rays, spin, horizon, ctrl),
    )

    def one(carry, _):
        st, step, trials, rates = carry
        a = st.active
        st, step, rates = _rk45_body(
            st, spin, horizon, dest, r_max, steplim, ctrl, a, step, rates
        )
        return (st, step, trials + a.astype(jnp.int32), rates), None

    init = (rays, rays.dt, jnp.zeros_like(rays.steps),
            _seed_rk45_rates(rays, rays.active, spin))
    (final, _, trials, _), _ = lax.scan(one, init, None, length=n_steps)
    return final, trials


def rk45_reject_stats(rays: RayBatch, spin, *, r_max=1000.0, n_steps=8192,
                      ctrl: StepControl = StepControl()):
    """Per-lane trial/reject accounting over ``n_steps`` lock-step
    iterations of the production DOPRI5 body.

    Returns a dict of summary statistics over the lanes that *finished*
    within the budget (reject fractions of still-running photon-sphere
    lanes would be dominated by their unfinished tail): p50/p99/mean
    reject fraction, total trial and reject counts, and the number of
    unfinished lanes (excluded from the fractions, reported for honesty).
    """
    live = np.asarray(rays.steps) == 0
    final, trials = _march_with_trials(
        rays, spin, jnp.asarray(r_max, rays.r.dtype), int(n_steps), ctrl
    )
    trials = np.asarray(trials).astype(np.int64)
    moved = np.abs(np.asarray(final.steps)).astype(np.int64) - np.abs(
        np.asarray(rays.steps)
    ).astype(np.int64)
    rejects = trials - moved
    finished = live & ~np.asarray(final.active)
    n_fin = int(finished.sum())
    if n_fin:
        frac = rejects[finished] / np.maximum(trials[finished], 1)
        p50, p90, p99 = np.percentile(frac, [50, 90, 99])
        mean = float(frac.mean())
    else:  # pragma: no cover - degenerate budget
        p50 = p90 = p99 = mean = float("nan")
    return {
        "n_lanes": int(live.sum()),
        "n_finished": n_fin,
        "n_unfinished": int(live.sum()) - n_fin,
        "trials_total": int(trials[finished].sum()),
        "rejects_total": int(rejects[finished].sum()),
        "reject_frac_p50": round(float(p50), 4),
        "reject_frac_p90": round(float(p90), 4),
        "reject_frac_p99": round(float(p99), 4),
        "reject_frac_mean": round(mean, 4),
    }


