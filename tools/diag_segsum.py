"""A/B the records-VJP scatter implementations on TPU at bench scale.

Round-3 queue #1: the (t*K)-row scatter-add in _gather_rows_bwd measured
10.9 ms (XLA serializes ~76 ns/row). Candidates:

  A. XLA scatter-add (round-3 shipping path before this diag)
  B. sorted pallas segment-sum (segment_sum.scatter_add_rows)
  C. full pallas-backend render fwd+bwd step with each impl

Run on the real TPU: python tools/diag_segsum.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_inputs  # noqa: E402
from ggrt_official_tpu.ops.rasterizer import pallas_composite, tiling  # noqa: E402
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians  # noqa: E402
from ggrt_official_tpu.ops.rasterizer.segment_sum import scatter_add_rows  # noqa: E402

H, W = 320, 448
K = 1024


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = c(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {ms:.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return out


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    pg = project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    )
    binning = tiling.bin_gaussians_banked(pg, (H, W), max_dup=8, max_per_tile=K)
    g = int(pg.mean2d.shape[0])
    t = binning.gaussian_ids.shape[0]
    ids = binning.gaussian_ids
    idx = jnp.where(ids >= 0, ids, g).reshape(-1)
    key = jax.random.PRNGKey(0)
    dgath = jax.random.normal(key, (t * K, 9), jnp.float32)
    live = int(jnp.sum((ids >= 0)))
    print(f"g={g} t={t} K={K} rows={t*K} live={live}", flush=True)

    def xla_scatter(idx, dgath):
        full = jnp.zeros((g + 1, 9), jnp.float32)
        return full.at[idx].add(dgath, mode="drop")[:g]

    def seg(idx, dgath):
        return scatter_add_rows(idx, dgath, jnp.zeros((g, 9), jnp.float32))

    a = timeit("A xla scatter-add", xla_scatter, idx, dgath)
    b = timeit("B pallas segsum   ", seg, idx, dgath)
    err = float(jnp.max(jnp.abs(a - b)))
    rel = err / float(jnp.max(jnp.abs(a)) + 1e-30)
    print(f"max abs diff {err:.3e} (rel {rel:.3e})", flush=True)

    # C: whole pallas fwd+bwd step A/B
    from ggrt_official_tpu.ops.rasterizer import api

    def step(means, cov, sh, opa, extr):
        img = api.render(
            extr, intr, near, far, (H, W), bg, means, cov, sh, opa,
            backend="pallas", max_dup=8, max_per_tile=K, binning_mode="banked",
        )
        return jnp.sum(img * img)

    gfn = jax.grad(step, argnums=(0, 1, 2, 3, 4))
    for impl in ("xla", "segsum"):
        pallas_composite._SCATTER_IMPL = impl
        timeit(f"C step fwd+bwd [{impl}]",
               lambda *a: gfn(*a)[0].sum(), means, cov, sh, opa, extr, iters=10)


def parts():
    """Component timing of the segsum path."""
    import jax, jax.numpy as jnp
    from ggrt_official_tpu.ops.rasterizer import segment_sum as ss

    g, n, c = 860160, 163840, 9
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (n,), 0, g).astype(jnp.int32)
    vals = jax.random.normal(key, (n, c), jnp.float32)

    w = jax.random.normal(jax.random.PRNGKey(9), (n,))
    wg = jax.random.normal(jax.random.PRNGKey(10), (g,))

    def just_sort(ids, vals):
        # order-sensitive consumer: sum(x) alone is sort-invariant and XLA
        # DCEs the whole sort.
        ops = (ids,) + tuple(vals[:, j] for j in range(c))
        out = jax.lax.sort(ops, num_keys=1)
        return sum(jnp.dot(o, w) for o in out[1:]) + jnp.dot(out[0].astype(jnp.float32), w)

    timeit("sort 10-operand", just_sort, ids, vals)

    def sort_stack(ids, vals):
        ops = (ids,) + tuple(vals[:, j] for j in range(c))
        s = jax.lax.sort(ops, num_keys=1)
        v = jnp.stack(s[1:], axis=0)
        return jnp.dot(s[0].astype(jnp.float32), w) + jnp.dot(v.sum(0), w)

    timeit("sort+stack    ", sort_stack, ids, vals)

    def full(ids, vals):
        out = ss.scatter_add_rows(ids, vals, jnp.zeros((g, c)))
        return jnp.dot(out.sum(1), wg)

    timeit("full segsum   ", full, ids, vals)


if __name__ == "__main__":
    if __import__("sys").argv[-1] == "parts":
        parts()
    else:
        main()
