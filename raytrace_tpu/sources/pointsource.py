"""Lamppost point source: a grid of rays over emission direction.

Capability of the reference PointSource (src/raytracer/pointsource.cpp):
every ray starts from one Boyer-Lindquist position; the launch direction is
a 2-D grid over (cos alpha, beta) in the orthonormal rest frame of a source
orbiting azimuthally at angular velocity V, so equal grid cells are equal
solid angles and the ray set samples an isotropic emitter.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from raytrace_tpu.geometry.kerr import constants_from_angles
from raytrace_tpu.rays import RayBatch, blank_batch


@dataclasses.dataclass(frozen=True)
class PointSourceGrid:
    """Static grid geometry (the batch shape must be known at trace time)."""

    n_cosalpha: int
    n_beta: int
    dcosalpha: float
    dbeta: float
    cosalpha0: float
    cosalphamax: float
    beta0: float
    betamax: float

    @classmethod
    def from_steps(cls, dcosalpha, dbeta, cosalpha0=-0.995, cosalphamax=0.995,
                   beta0=-jnp.pi, betamax=jnp.pi):
        # Grid-count convention of the reference ctor (pointsource.cpp:16-17):
        # truncating int conversion of (range/step) + 1.
        n_cosalpha = int((cosalphamax - cosalpha0) / dcosalpha) + 1
        n_beta = int((betamax - beta0) / dbeta) + 1
        return cls(n_cosalpha, n_beta, float(dcosalpha), float(dbeta),
                   float(cosalpha0), float(cosalphamax), float(beta0), float(betamax))

    @property
    def n_rays(self) -> int:
        return self.n_cosalpha * self.n_beta


def grid_angles(grid: PointSourceGrid, dtype=jnp.float64):
    """The grid's flat (cos alpha, beta, dead) arrays.

    Exposed separately so sharded/differentiable pipelines can split the
    (static, non-differentiable) direction grid across devices while the
    (differentiable) source-frame construction happens per shard.
    """
    i = jnp.arange(grid.n_cosalpha)
    j = jnp.arange(grid.n_beta)
    cosalpha = (grid.cosalpha0 + i[:, None] * grid.dcosalpha).astype(dtype)
    beta = (grid.beta0 + j[None, :] * grid.dbeta).astype(dtype)
    cosalpha, beta = jnp.broadcast_arrays(cosalpha, beta)
    cosalpha = cosalpha.reshape(-1)
    beta = beta.reshape(-1)
    dead = (cosalpha >= grid.cosalphamax) | (beta >= grid.betamax)
    return cosalpha, beta, dead


def point_source_from_angles(
    pos,
    V,
    spin,
    cosalpha,
    beta,
    dead=None,
    E=1.0,
    dtype=jnp.float64,
) -> RayBatch:
    """Lamppost batch from explicit per-ray emission angles.

    Same physics as ``point_source`` (reference pointsource.cpp:30-64) for an
    arbitrary set of (cos alpha, beta) directions; differentiable w.r.t.
    ``pos``, ``V`` and ``spin``. ``dead`` rows get steps = -1.
    """
    cosalpha = jnp.asarray(cosalpha, dtype=dtype)
    beta = jnp.asarray(beta, dtype=dtype)
    if dead is None:
        dead = jnp.zeros(cosalpha.shape, dtype=bool)
    alpha = jnp.arccos(jnp.clip(cosalpha, -1.0, 1.0))

    t0, r0, th0, ph0 = (jnp.asarray(p, dtype=dtype) for p in pos)
    n = cosalpha.shape[0]
    # every per-ray leaf is derived from the caller's angle arrays rather
    # than from fresh jnp.zeros/full constants, so under shard_map the whole
    # batch inherits their device-variance (vma) — fresh constants are
    # mesh-invariant and break check_vma typing of the march's scan carry
    zero = cosalpha * jnp.asarray(0.0, dtype)
    izero = zero.astype(jnp.int32)
    full = lambda v: zero + v

    r = full(r0)
    theta = full(th0)
    c = constants_from_angles(r, theta, alpha, beta, jnp.asarray(V, dtype=dtype), spin, E)

    base = blank_batch(n, dtype)
    return base.replace(
        t=full(t0),
        r=r,
        theta=theta,
        phi=full(ph0),
        pt=zero,
        pr=zero,
        ptheta=zero,
        pphi=zero,
        k=c.k,
        h=c.h,
        Q=c.Q,
        rdot_sign=c.rdot_sign,
        thetadot_sign=c.thetadot_sign,
        r_was_positive=zero > 1.0,
        theta_was_positive=zero < 1.0,
        dt=zero,
        steps=jnp.where(dead, izero - 1, izero),
        status=izero,
        rdot_flips=izero,
        equatorial_crossings=izero,
        emit=full(1.0),
        redshift=full(1.0),
        alpha=cosalpha,  # reference stores cos(alpha) in .alpha (pointsource.cpp:48)
        beta=beta,
    )


def point_source(
    pos,
    V,
    spin,
    grid: PointSourceGrid,
    E=1.0,
    dtype=jnp.float64,
) -> RayBatch:
    """Build the lamppost ray batch.

    Args:
      pos: (t, r, theta, phi) of the source.
      V: angular velocity Omega = dphi/dt of the source frame (0 = static,
         or pass keplerian_omega(r, spin) for an orbiting source).
      spin: black-hole spin.
      grid: direction grid. Rows at the top grid edge (cosalpha >=
        cosalphamax or beta >= betamax) are dead padding with steps = -1,
        exactly like the reference (pointsource.cpp:40-44), so histogram
        denominators that count grid cells match.
      E: emitted energy scale.
    """
    cosalpha, beta, dead = grid_angles(grid, dtype)
    return point_source_from_angles(pos, V, spin, cosalpha, beta, dead, E, dtype)
