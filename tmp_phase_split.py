import jax, jax.numpy as jnp, numpy as np
from raytrace_tpu.config import enable_compilation_cache
enable_compilation_cache()
from raytrace_tpu.ops.pallas_kernel import trace_pallas_compacted
from raytrace_tpu.sources import PointSourceGrid, point_source

spin = 0.998
grid = PointSourceGrid.from_steps(0.01, 0.01)
rays = point_source((0.0, 5.0, 1e-3, 0.0), V=0.0, spin=spin, grid=grid)
rays = jax.tree.map(lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a, rays)
s = jnp.asarray(spin, jnp.float32)
out = trace_pallas_compacted(rays, s, method="rk4", r_max=1000.0, steplim=30_000)
steps = np.abs(np.asarray(out.steps))
np.save("/tmp/steps.npy", steps)
q = np.percentile(steps, [50, 90, 99, 99.9, 99.95, 99.99, 100])
print("percentiles 50/90/99/99.9/99.95/99.99/max:", q.astype(int))
for k in (128, 256, 512, 768, 1024, 1536, 2048, 4096, 8192, 16384, 29999):
    print(f"survivors > {k:6d}: {(steps > k).sum():7d}")
