import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""TPU timing: counting-sort vs comparison-sort binning + projection parts."""
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
from ggrt_official_tpu.ops.rasterizer import projection as rp, tiling

H, W = 320, 448
g = 860_160
ks = jax.random.split(jax.random.PRNGKey(0), 8)
means = jnp.stack([
    jax.random.uniform(ks[0], (g,), minval=-2.0, maxval=2.0),
    jax.random.uniform(ks[1], (g,), minval=-1.5, maxval=1.5),
    jax.random.uniform(ks[2], (g,), minval=1.2, maxval=8.0)], axis=-1)
scales = jax.random.uniform(ks[3], (g, 3), minval=0.002, maxval=0.02)
cov = jnp.eye(3)[None] * (scales[..., None] ** 2)
sh = jax.random.normal(ks[4], (g, 3, 25)) * 0.2
opa = jax.random.uniform(ks[5], (g,), minval=0.05, maxval=0.9)
extr = jnp.eye(4)
intr = jnp.array([[1.2, 0., 0.5], [0., 1.2, 0.5], [0., 0., 1.]])
near = jnp.float32(1.0)
far = jnp.float32(20.0)
args = (means, cov, sh, opa, extr)


def project(m, c, s, o, e):
    return rp.project_gaussians(m, c, s, o, e, intr, near, far, (H, W))


def bench(name, fn, n=10):
    fj = jax.jit(fn)
    t0 = time.time(); jax.block_until_ready(fj(*args)); log(f"{name} compile {time.time()-t0:.1f}s")
    t0 = time.time(); [jax.block_until_ready(fj(*args)) for _ in range(n)]
    log(f"  {name}: {(time.time()-t0)/n*1e3:.1f}ms")


# Projection sub-parts.
bench("proj:means-only", lambda m, c, s, o, e: project(m, c, s, o, e).mean2d)
bench("proj:no-sh", lambda m, c, s, o, e: (project(m, c, s, o, e).conic,
                                            project(m, c, s, o, e).radius))
bench("proj:full", lambda m, c, s, o, e: project(m, c, s, o, e))

# Binning comparison.
bench("bin:sort", lambda *a: tiling.bin_gaussians(project(*a), (H, W), max_dup=8,
                                                   max_per_tile=1024).gaussian_ids)
bench("bin:counting", lambda *a: tiling.bin_gaussians_counting(
    project(*a), (H, W), max_dup=8, max_per_tile=1024).gaussian_ids)

# Equality check.
a = jax.jit(lambda *a: tiling.bin_gaussians(project(*a), (H, W), max_dup=8, max_per_tile=1024).gaussian_ids)(*args)
b = jax.jit(lambda *a: tiling.bin_gaussians_counting(project(*a), (H, W), max_dup=8, max_per_tile=1024).gaussian_ids)(*args)
import numpy as np
log("binning equal:", bool((np.asarray(a) == np.asarray(b)).all()))
