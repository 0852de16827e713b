import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, sys
import jax, jax.numpy as jnp

def log(*a):
    print(*a, flush=True)

log("devices:", jax.devices())
from ggrt_official_tpu.ops.rasterizer import projection as rp, tiling, composite
H, W = 320, 448
key = jax.random.PRNGKey(0)
n_gauss = 860_000
ks = jax.random.split(key, 8)
g = n_gauss
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

def project(means, cov, sh, opa, extr):
    return rp.project_gaussians(means, cov, sh, opa, extr, intr, near, far, (H, W))
pj = jax.jit(project)
t0=time.time(); pg = jax.block_until_ready(pj(means, cov, sh, opa, extr)); log(f"project compile+run {time.time()-t0:.2f}s")
t0=time.time(); [jax.block_until_ready(pj(means, cov, sh, opa, extr)) for _ in range(5)]; log(f"  project run {(time.time()-t0)/5*1e3:.1f}ms")

for max_dup in (8,):
    bj = jax.jit(lambda m,c,s,o,e: tiling.bin_gaussians(project(m,c,s,o,e), (H, W), max_dup=max_dup, max_per_tile=1024))
    t0=time.time(); bn = jax.block_until_ready(bj(means, cov, sh, opa, extr)); log(f"bin dup={max_dup} compile+run {time.time()-t0:.2f}s")
    t0=time.time(); [jax.block_until_ready(bj(means, cov, sh, opa, extr)) for _ in range(5)]; log(f"  bin run {(time.time()-t0)/5*1e3:.1f}ms")
    log("  counts: max", int(jnp.max(bn.counts)), "mean", float(jnp.mean(bn.counts)))

def fwd(m,c,s,o,e):
    pg = project(m,c,s,o,e)
    bn = tiling.bin_gaussians(pg, (H, W), max_dup=8, max_per_tile=1024)
    return composite.composite_tiles(pg, bn, bg, (H, W), tile_chunk=16)
fj = jax.jit(fwd)
t0=time.time(); img = jax.block_until_ready(fj(means, cov, sh, opa, extr)); log(f"fwd compile+run {time.time()-t0:.2f}s")
t0=time.time(); [jax.block_until_ready(fj(means, cov, sh, opa, extr)) for _ in range(5)]; log(f"  fwd run {(time.time()-t0)/5*1e3:.1f}ms")

def loss(m,c,s,o,e):
    return jnp.mean(fwd(m,c,s,o,e)**2)
gj = jax.jit(jax.grad(loss, argnums=(0,1,2,3,4)))
t0=time.time(); o_ = jax.block_until_ready(gj(means, cov, sh, opa, extr)); log(f"fwd+bwd compile+run {time.time()-t0:.2f}s")
t0=time.time(); [jax.block_until_ready(gj(means, cov, sh, opa, extr)) for _ in range(5)]; log(f"  fwd+bwd run {(time.time()-t0)/5*1e3:.1f}ms")
