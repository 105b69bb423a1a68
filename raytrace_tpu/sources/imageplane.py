"""Backward-traced image plane: the observer's camera grid.

Capability of the reference ImagePlane / ImagePlaneBundles
(src/raytracer/imageplane.cpp, imageplane_bundles.h): rays start on a
distant plane perpendicular to the line of sight (distance D, inclination
incl) and are traced *backwards in time* towards the hole. Time reversal is
implemented by negating the spin for the propagation (imageplane.cpp:12) —
the Kerr time-reversal symmetry t -> -t, phi -> -phi is equivalent to
a -> -a. All redshift calls must therefore pass reverse=True.

The constants of motion come from the analytic impact parameters
(imageplane.cpp:100-113): k = 1 (unit energy at infinity), h = -x sin i,
l_theta = y, Q = l_theta^2 - (a cos theta)^2 + (h / tan theta)^2. The
closed forms for h and l_theta are what the reference's
(b, beta)-parametrised expressions reduce to; they avoid the b = 0 center
singularity.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from raytrace_tpu.geometry.kerr import metric_coeffs
from raytrace_tpu.rays import RayBatch, blank_batch


@dataclasses.dataclass(frozen=True)
class ImagePlaneGrid:
    """Static image-plane grid geometry.

    Note: the reference x-grid strides by dy due to a copy-paste quirk
    (imageplane.cpp:43); every app passes dx == dy so this grid uses dx
    properly (SURVEY.md §7, quirks to normalise).
    """

    nx: int
    ny: int
    x0: float
    y0: float
    dx: float
    dy: float

    @classmethod
    def from_steps(cls, x0, xmax, dx, y0, ymax, dy):
        nx = int((xmax - x0) / dx) + 1
        ny = int((ymax - y0) / dy) + 1
        return cls(nx, ny, float(x0), float(y0), float(dx), float(dy))

    @property
    def n_rays(self) -> int:
        return self.nx * self.ny

    def xy(self, dtype=jnp.float64):
        x = self.x0 + jnp.arange(self.nx, dtype=dtype) * self.dx
        y = self.y0 + jnp.arange(self.ny, dtype=dtype) * self.dy
        X, Y = jnp.meshgrid(x, y, indexing="ij")
        return X.reshape(-1), Y.reshape(-1)

    def x_index(self, x):
        """Pixel index from a stored plane coordinate (imageplane.h:36-60)."""
        return jnp.round((x - self.x0) / self.dx).astype(jnp.int32)

    def y_index(self, y):
        return jnp.round((y - self.y0) / self.dy).astype(jnp.int32)


def _plane_ray(x, y, D, incl, phi0, a_trace, dtype):
    """Initial BL position, momentum and constants for one plane point.

    Geometry and null-condition quadratic per imageplane.cpp:50-113;
    a_trace is the (already negated) propagation spin.
    """
    t = jnp.zeros_like(x)
    r = jnp.sqrt(D * D + x * x + y * y)
    theta = jnp.arccos((D * jnp.cos(incl) + y * jnp.sin(incl)) / r)
    phi = phi0 + jnp.arctan2(x, D * jnp.sin(incl) - y * jnp.cos(incl))

    pr = D / r
    ptheta = jnp.sin(jnp.arccos(D / r)) / r
    denom = x * x + (D * jnp.sin(incl) - y * jnp.cos(incl)) ** 2
    pphi = x * jnp.sin(incl) / denom

    # p^t from the null condition g_munu p^mu p^nu = 0 (positive root)
    g = metric_coeffs(r, theta, a_trace)
    A = g.g_tt
    B = 2.0 * g.g_tphi * pphi
    C = g.g_rr * pr * pr + g.g_thth * ptheta * ptheta + g.g_phph * pphi * pphi
    disc = jnp.sqrt(B * B - 4.0 * A * C)
    pt = (-B + disc) / (2.0 * A)
    pt = jnp.where(pt < 0, (-B - disc) / (2.0 * A), pt)

    # analytic constants of motion (imageplane.cpp:100-113; closed forms).
    # Rays with y = 0 start *exactly at their polar turning point*
    # (thetadot_sq(theta_0) = l_theta^2 = 0 identically), where the
    # integrator's turning-point sign gate degenerates to a rounding
    # coin-flip — the unlucky sign marches the ray into the forbidden
    # region and it spirals off over the pole (the reference has the same
    # y = 0 knife edge). Regularise with a small polar impact parameter:
    # it must beat the ~1e-14 catastrophic-cancellation noise in
    # thetadot_sq(theta_0) = Q - (h cot - a k cos)(...), so 1e-4 r_g —
    # still 10^3 x below any practical pixel scale.
    k = jnp.ones_like(x)
    h = -x * jnp.sin(incl)
    ltheta = jnp.where(y == 0, 1e-4, y)
    Q = ltheta * ltheta - (a_trace * jnp.cos(theta)) ** 2 + (h / jnp.tan(theta)) ** 2

    rdot_sign = -jnp.ones_like(x)
    thetadot_sign = jnp.where(ltheta >= 0, 1.0, -1.0).astype(dtype)
    return t, r, theta, phi, (pt, pr, ptheta, pphi), (k, h, Q), rdot_sign, thetadot_sign


def image_plane(
    dist,
    incl_deg,
    grid: ImagePlaneGrid,
    spin,
    phi0=0.0,
    dtype=jnp.float64,
) -> RayBatch:
    """Build the backward-traced camera batch.

    Propagate the result with ``trace(rays, spin=-spin, ...)`` (or use
    ``trace_spin`` below) and pass reverse=True to all redshift calls.
    ``rays.alpha`` / ``rays.beta`` store the plane (x, y) coordinates
    (imageplane.cpp:117-118).
    """
    a_trace = -spin  # time reversal (imageplane.cpp:12)
    incl = jnp.asarray(incl_deg, dtype=dtype) * jnp.pi / 180.0
    x, y = grid.xy(dtype)
    D = jnp.asarray(dist, dtype=dtype)

    t, r, theta, phi, mom, consts, rdot_sign, thetadot_sign = _plane_ray(
        x, y, D, incl, jnp.asarray(phi0, dtype=dtype), a_trace, dtype
    )
    base = blank_batch(grid.n_rays, dtype)
    return base.replace(
        t=t,
        r=r,
        theta=theta,
        phi=phi,
        pt=mom[0],
        pr=mom[1],
        ptheta=mom[2],
        pphi=mom[3],
        k=consts[0],
        h=consts[1],
        Q=consts[2],
        rdot_sign=rdot_sign,
        thetadot_sign=thetadot_sign,
        steps=jnp.zeros((grid.n_rays,), dtype=jnp.int32),
        alpha=x,
        beta=y,
    )


def image_plane_bundles(
    dist,
    incl_deg,
    grid: ImagePlaneGrid,
    spin,
    phi0=0.0,
    eps_frac=0.01,
    dtype=jnp.float64,
):
    """5-ray bundles per pixel: centre + E/W/N/S satellites at +-eps.

    Capability of imageplane_bundles.h:44-200, used by the caustic apps for
    local lensing Jacobians. Returns a RayBatch of 5 * nx * ny rays ordered
    [centre, east(+x), west(-x), north(+y), south(-y)] x pixels — i.e. ray
    index = bundle_slot * n_pixels + pixel — plus the eps actually used.
    """
    a_trace = -spin
    incl = jnp.asarray(incl_deg, dtype=dtype) * jnp.pi / 180.0
    xc, yc = grid.xy(dtype)
    D = jnp.asarray(dist, dtype=dtype)
    eps = eps_frac * min(grid.dx, grid.dy)

    offsets = [(0.0, 0.0), (eps, 0.0), (-eps, 0.0), (0.0, eps), (0.0, -eps)]
    xs = jnp.concatenate([xc + ox for ox, _ in offsets])
    ys = jnp.concatenate([yc + oy for _, oy in offsets])

    t, r, theta, phi, mom, consts, rdot_sign, thetadot_sign = _plane_ray(
        xs, ys, D, incl, jnp.asarray(phi0, dtype=dtype), a_trace, dtype
    )
    n = xs.shape[0]
    base = blank_batch(n, dtype)
    rays = base.replace(
        t=t,
        r=r,
        theta=theta,
        phi=phi,
        pt=mom[0],
        pr=mom[1],
        ptheta=mom[2],
        pphi=mom[3],
        k=consts[0],
        h=consts[1],
        Q=consts[2],
        rdot_sign=rdot_sign,
        thetadot_sign=thetadot_sign,
        steps=jnp.zeros((n,), dtype=jnp.int32),
        alpha=xs,
        beta=ys,
    )
    return rays, eps
