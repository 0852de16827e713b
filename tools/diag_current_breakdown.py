import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
log("devices:", jax.devices())
from ggrt_official_tpu.ops.rasterizer import projection as rp, tiling, composite, pallas_composite
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
extr = jnp.eye(4); intr = jnp.array([[1.2,0.,0.5],[0.,1.2,0.5],[0.,0.,1.]])
near = jnp.float32(1.0); far = jnp.float32(20.0); bg = jnp.zeros(3)
args = (means, cov, sh, opa, extr)

def project(m,c,s,o,e):
    return rp.project_gaussians(m,c,s,o,e, intr, near, far, (H, W))
def bench(name, fn):
    fj = jax.jit(fn)
    t0=time.time(); jax.block_until_ready(fj(*args)); log(f"{name} compile {time.time()-t0:.1f}s")
    t0=time.time(); [jax.block_until_ready(fj(*args)) for _ in range(10)]; log(f"  {name}: {(time.time()-t0)/10*1e3:.1f}ms")

bench("project", project)
bench("project+bin", lambda *a: tiling.bin_gaussians(project(*a), (H, W), max_dup=8, max_per_tile=1024).gaussian_ids)
def gathered(*a):
    pg = project(*a)
    bn = tiling.bin_gaussians(pg, (H, W), max_dup=8, max_per_tile=1024)
    return composite.gather_tile_records(pg, bn.gaussian_ids)
bench("project+bin+gather", gathered)
def full(*a):
    pg = project(*a)
    bn = tiling.bin_gaussians(pg, (H, W), max_dup=8, max_per_tile=1024)
    return pallas_composite.composite_tiles_pallas(pg, bn, bg, (H, W))
bench("full-fwd-pallas", full)
bench("fwd+bwd", None) if False else None
gj = jax.jit(jax.grad(lambda *a: jnp.mean(full(*a)**2), argnums=(0,1,2,3,4)))
t0=time.time(); jax.block_until_ready(gj(*args)); log(f"fwd+bwd compile {time.time()-t0:.1f}s")
t0=time.time(); [jax.block_until_ready(gj(*args)) for _ in range(10)]; log(f"  fwd+bwd: {(time.time()-t0)/10*1e3:.1f}ms")
