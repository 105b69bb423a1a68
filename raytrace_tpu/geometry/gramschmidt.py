"""Metric Gram-Schmidt orthonormal tetrad for an arbitrary timelike 4-velocity.

Capability of the reference ``src/include/gramschmidt_basis.h``: given an
observer 4-velocity u^mu at (r, theta), build an orthonormal frame
(et, e_phi, e_theta, e_r) whose timelike leg is u. Used for disc plunge-region
proper areas and for sources with arbitrary velocity (PointSourceVel).

Batched: all inputs broadcast; vectors are (t, r, theta, phi) tuples of arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytrace_tpu.geometry.kerr import MetricCoeffs, Tetrad, metric_coeffs, metric_dot


def _project_out(g: MetricCoeffs, v, e):
    """v minus its metric projection onto e (one Gram-Schmidt sweep step)."""
    coef = metric_dot(g, v, e) / metric_dot(g, e, e)
    return tuple(vi - coef * ei for vi, ei in zip(v, e))


def _normalise(g: MetricCoeffs, e):
    norm = jnp.sqrt(jnp.abs(metric_dot(g, e, e)))
    return tuple(ei / norm for ei in e)


def _orient(e, component_idx, want_positive):
    """Flip the whole vector so its given component has the requested sign.

    Mirrors the right-handedness fixups of gramschmidt_basis.h:83-85: the
    r leg keeps a positive r component, the theta leg a *negative* theta
    component (the reference's disc-frame convention, cf. the e22 =
    -1/sqrt(rhosq) leg in raytracer.cpp:648), the phi leg a positive phi
    component.
    """
    c = e[component_idx]
    flip = jnp.where(want_positive, c < 0, c > 0)
    sign = jnp.where(flip, -1.0, 1.0)
    return tuple(sign * ei for ei in e)


def gram_schmidt_tetrad(r, theta, u, a) -> Tetrad:
    """Orthonormal frame for 4-velocity u at (r, theta) in Kerr spin a.

    Seeds the spacelike legs with the coordinate r, theta and phi directions
    (in that priority order), orthogonalises against u and each other under
    the metric, orients them per the reference convention, and returns them
    ordered (et, e_phi, e_theta, e_r).
    """
    g = metric_coeffs(r, theta, a)
    shape = jnp.broadcast_shapes(*(jnp.shape(c) for c in u))
    zero = jnp.zeros(shape, dtype=jnp.result_type(*u))
    one = jnp.ones_like(zero)

    et = tuple(jnp.broadcast_to(ui, shape).astype(zero.dtype) for ui in u)

    seed_r = (zero, one, zero, zero)
    seed_theta = (zero, zero, one, zero)
    seed_phi = (zero, zero, zero, one)

    er = _project_out(g, seed_r, et)
    etheta = _project_out(g, _project_out(g, seed_theta, et), er)
    ephi = _project_out(g, _project_out(g, _project_out(g, seed_phi, et), er), etheta)

    er = _orient(er, 1, True)
    etheta = _orient(etheta, 2, False)
    ephi = _orient(ephi, 3, True)

    return Tetrad(
        et=_normalise(g, et),
        ephi=_normalise(g, ephi),
        etheta=_normalise(g, etheta),
        er=_normalise(g, er),
    )
