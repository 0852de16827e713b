import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
"""TPU timing: pallas vs tiled compositing on the 860k-gaussian scene."""
import time
import jax, jax.numpy as jnp

def log(*a): print(*a, flush=True)
log("devices:", jax.devices())

from ggrt_official_tpu.ops.rasterizer import projection as rp, tiling, composite, pallas_composite

H, W = 320, 448
key = jax.random.PRNGKey(0)
g = 860_000
ks = jax.random.split(key, 8)
means = jnp.stack([
    jax.random.uniform(ks[0], (g,), minval=-2.0, maxval=2.0),
    jax.random.uniform(ks[1], (g,), minval=-1.5, maxval=1.5),
    jax.random.uniform(ks[2], (g,), minval=1.2, maxval=8.0)], axis=-1)
scales = jax.random.uniform(ks[3], (g, 3), minval=0.002, maxval=0.02)
cov = jnp.eye(3)[None] * (scales[..., None] ** 2)
sh = jax.random.normal(ks[4], (g, 3, 25)) * 0.2
opa = jax.random.uniform(ks[5], (g,), minval=0.05, maxval=0.9)
extr = jnp.eye(4); intr = jnp.array([[1.2,0.,0.5],[0.,1.2,0.5],[0.,0.,1.]])
near = jnp.float32(1.0); far = jnp.float32(20.0); bg = jnp.zeros(3)

def make_fwd(backend):
    def fwd(m,c,s,o,e):
        pg = rp.project_gaussians(m,c,s,o,e, intr, near, far, (H, W))
        bn = tiling.bin_gaussians(pg, (H, W), max_dup=8, max_per_tile=1024)
        if backend == "tiled":
            return composite.composite_tiles(pg, bn, bg, (H, W), tile_chunk=16)
        return pallas_composite.composite_tiles_pallas(pg, bn, bg, (H, W))
    return fwd

args = (means, cov, sh, opa, extr)
imgs = {}
for backend in ("pallas", "tiled"):
    fj = jax.jit(make_fwd(backend))
    t0=time.time(); img = jax.block_until_ready(fj(*args)); log(f"{backend} fwd compile+run {time.time()-t0:.1f}s")
    t0=time.time(); [jax.block_until_ready(fj(*args)) for _ in range(10)]; log(f"  {backend} fwd run {(time.time()-t0)/10*1e3:.1f}ms")
    imgs[backend] = img

import numpy as np
d = np.abs(np.asarray(imgs["pallas"]) - np.asarray(imgs["tiled"]))
log("fwd parity max abs diff:", d.max(), "mean:", d.mean())

for backend in ("pallas", "tiled"):
    lj = jax.jit(jax.grad(lambda *a: jnp.mean(make_fwd(backend)(*a)**2), argnums=(0,1,2,3,4)))
    t0=time.time(); o = jax.block_until_ready(lj(*args)); log(f"{backend} fwd+bwd compile+run {time.time()-t0:.1f}s")
    t0=time.time(); [jax.block_until_ready(lj(*args)) for _ in range(10)]; log(f"  {backend} fwd+bwd run {(time.time()-t0)/10*1e3:.1f}ms")
    if backend == "pallas":
        gp = o
    else:
        gt = o
for name, a, b in zip(("means","cov","sh","opa","extr"), gt, gp):
    a, b = np.asarray(a), np.asarray(b)
    s = np.abs(a).max() + 1e-8
    log(f"grad {name}: rel max diff {np.abs(a-b).max()/s:.2e}")
