import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""Isolate axon-tunnel dispatch/fetch overhead from device compute.

Hypothesis: block_until_ready over the tunnel fetches (or round-trips
proportionally to) outputs, inflating timings of large-output functions.
Measure the same pipeline returning (a) full outputs vs (b) scalar
reductions, plus a pure dispatch no-op.
"""
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


log("devices:", jax.devices())
from ggrt_official_tpu.ops.rasterizer import projection as rp, tiling, pallas_composite

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
bg = jnp.zeros(3)
args = (means, cov, sh, opa, extr)


def bench(name, fn, n=20):
    fj = jax.jit(fn)
    t0 = time.time(); jax.block_until_ready(fj(*args)); log(f"{name} compile {time.time()-t0:.1f}s")
    t0 = time.time(); [jax.block_until_ready(fj(*args)) for _ in range(n)]
    log(f"  {name}: {(time.time()-t0)/n*1e3:.2f}ms")


bench("noop-scalar", lambda m, c, s, o, e: jnp.sum(e))
bench("proj-sum", lambda *a: jnp.sum(rp.project_gaussians(*a, intr, near, far, (H, W)).mean2d))


def full(*a):
    pg = rp.project_gaussians(*a, intr, near, far, (H, W))
    bn = tiling.bin_gaussians_counting(pg, (H, W), max_dup=8, max_per_tile=1024)
    return pallas_composite.composite_tiles_pallas(pg, bn, bg, (H, W))


bench("fwd-sum", lambda *a: jnp.sum(full(*a)))
bench("fwd-full-img", lambda *a: full(*a))


def loss(*a):
    return jnp.mean(full(*a) ** 2)


g_full = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
g_sum = jax.jit(lambda *a: sum(jnp.sum(x) for x in jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)))
for name, fj in (("grad-full", g_full), ("grad-sum", g_sum)):
    t0 = time.time(); jax.block_until_ready(fj(*args)); log(f"{name} compile {time.time()-t0:.1f}s")
    t0 = time.time(); [jax.block_until_ready(fj(*args)) for _ in range(10)]
    log(f"  {name}: {(time.time()-t0)/10*1e3:.2f}ms")
