import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from raytrace_tpu.geometry.kerr import geodesic_rates

rng = np.random.default_rng(0)
n = 200000
r = rng.uniform(1.1, 1000, n)
theta = rng.uniform(1e-4, np.pi - 1e-4, n)
k = rng.uniform(0.5, 2, n)
h = rng.uniform(-6, 6, n)
Q = rng.uniform(-3, 30, n)
a = 0.998

def old_rates(r, theta, k, h, Q, a):
    sin_t, cos_t = np.sin(theta), np.cos(theta)
    sin2 = sin_t * sin_t
    rhosq = r*r + (a*cos_t)*(a*cos_t)
    delta = r*r - 2.0*r + a*a
    inv_rd = 1.0/(rhosq*delta)
    inv_sin = 1.0/sin_t
    inv_rhosq = delta*inv_rd
    pt = ((rhosq*(r*r+a*a) + 2.0*a*a*r*sin2)*k - 2.0*a*r*h)*inv_rd
    pphi = (2.0*a*r*sin2*k + (rhosq-2.0*r)*h)*inv_rd*(inv_sin*inv_sin)
    cot = h*cos_t*inv_sin
    tds = (Q + (k*a*cos_t+cot)*(k*a*cos_t-cot))*(inv_rhosq*inv_rhosq)
    ptheta = np.sqrt(np.abs(tds))
    rds = (k*pt - h*pphi - rhosq*ptheta*ptheta)*(delta*inv_rhosq)
    return pt, pphi, tds, rds

sgn = np.ones(n)
new = geodesic_rates(jnp.asarray(r), jnp.asarray(theta), jnp.asarray(k), jnp.asarray(h), jnp.asarray(Q), jnp.asarray(sgn), jnp.asarray(sgn), a)
pt_o, pphi_o, tds_o, rds_o = old_rates(r, theta, k, h, Q, a)
for name, nv, ov in [("pt", new.pt, pt_o), ("pphi", new.pphi, pphi_o), ("thetadot_sq", new.thetadot_sq, tds_o), ("rdot_sq", new.rdot_sq, rds_o)]:
    nv = np.asarray(nv)
    rel = np.abs(nv - ov) / np.maximum(np.abs(ov), 1e-30)
    print(f"{name:12s} max rel dev {rel.max():.3e}  median {np.median(rel):.3e}")
