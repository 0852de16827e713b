"""Per-stage timing of the fwd+bwd rasterize step at the bench population.

Isolates each candidate bottleneck so the round-2 optimization queue is
driven by measurements, not guesses:

  * projection fwd / fwd+vjp        (860k gaussians, SH deg 4)
  * depth argsort (N keys)
  * dup + packed single-key sort    (N*max_dup keys, 3 payloads vs 1)
  * build_records fwd / fwd+vjp     (gather + scatter-add transpose)
  * pallas fwd kernel alone / bwd kernel alone
  * full fwd / full fwd+bwd         (cross-check vs bench.py)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_inputs
from ggrt_official_tpu.ops.rasterizer import pallas_composite, tiling
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

H, W = 320, 448
KW = dict(max_dup=8, max_per_tile=1024)


def timeit(name, fn, *args, iters=10):
    fj = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(fj(*args))
    print(f"{name}: compile {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        out = fj(*args)
    jax.block_until_ready(out)
    print(f"  {name}: {(time.time() - t0) / iters * 1e3:.2f} ms", flush=True)
    return out


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    m, c, s, o, e = means[0], cov[0], sh[0], opa[0], extr[0]
    i3, nr, fr, bg0 = intr[0], near[0], far[0], bg[0]
    g = m.shape[0]

    def project(m, c, s, o, e):
        return project_gaussians(m, c, s, o, e, i3, nr, fr, (H, W))

    timeit("project fwd", lambda *a: project(*a).mean2d.sum(), m, c, s, o, e)
    timeit(
        "project fwd+vjp",
        jax.grad(lambda *a: sum(jnp.sum(x) for x in project(*a)[:3]), argnums=(0, 1, 2, 3, 4)),
        m, c, s, o, e,
    )

    pg = jax.jit(project)(m, c, s, o, e)
    pg = jax.tree.map(jax.lax.stop_gradient, pg)

    timeit("depth argsort (N)", lambda d: jnp.argsort(d).sum(), pg.depth)

    # The duplication + big sort inside bin_gaussians.
    timeit(
        "bin_gaussians (dup + sort3 + segments)",
        lambda pg: tiling.bin_gaussians(pg, (H, W), **KW).gaussian_ids.sum(),
        pg,
    )

    # Sort cost in isolation: 3-payload vs 1-payload.
    def sort3(tile, rank, gid):
        packed = (tile << 20) | rank
        return jax.lax.sort((packed, tile, gid), num_keys=1)[2].sum()

    def sort1(tile, rank):
        packed = (tile << 20) | rank
        return jax.lax.sort((packed,), num_keys=1)[0].sum()

    n = g * KW["max_dup"]
    key = jax.random.PRNGKey(1)
    tile = jax.random.randint(key, (n,), 0, 161, dtype=jnp.int32)
    rank = jax.random.randint(key, (n,), 0, g, dtype=jnp.int32) % (1 << 20)
    gid = jnp.arange(n, dtype=jnp.int32) % g
    timeit("lax.sort 3 payloads (N*dup)", sort3, tile, rank, gid)
    timeit("lax.sort 1 payload  (N*dup)", sort1, tile, rank)

    binning = jax.jit(
        lambda pg: tiling.bin_gaussians(pg, (H, W), **KW)
    )(pg)
    # Restore the static (python-int) tile counts the jit boundary erased.
    binning = binning._replace(
        num_tiles_y=int(binning.num_tiles_y), num_tiles_x=int(binning.num_tiles_x)
    )

    timeit(
        "build_records fwd",
        lambda pg: sum(jnp.sum(x) for x in pallas_composite.build_records(pg, binning)[:2]),
        pg,
    )
    timeit(
        "build_records fwd+vjp",
        jax.grad(
            lambda m2, con, col, op: sum(
                jnp.sum(x)
                for x in pallas_composite.build_records(
                    pg._replace(mean2d=m2, conic=con, color=col, opacity=op), binning
                )[:2]
            ),
            argnums=(0, 1, 2, 3),
        ),
        pg.mean2d, pg.conic, pg.color, pg.opacity,
    )

    records, colors, counts = jax.jit(
        lambda pg: pallas_composite.build_records(pg, binning)
    )(pg)

    timeit(
        "pallas fwd kernel",
        lambda r, c, n: pallas_composite._fwd_raw(r, c, n)[0].sum(),
        records, colors, counts,
    )
    acc, tfin, tst, nexec = jax.jit(pallas_composite._fwd_raw)(records, colors, counts)
    gout = jnp.ones_like(acc)
    gtfin = jnp.ones_like(tfin)
    timeit(
        "pallas bwd kernel",
        lambda r, c: sum(
            jnp.sum(x)
            for x in pallas_composite._bwd_raw(r, c, tst, nexec, tfin, gout, gtfin)
        ),
        records, colors,
    )

    def full(m, c, s, o, e):
        pg = project(m, c, s, o, e)
        bn = tiling.bin_gaussians(pg, (H, W), **KW)
        return pallas_composite.composite_tiles_pallas(pg, bn, bg0, (H, W))

    timeit("full fwd", lambda *a: jnp.mean(full(*a) ** 2), m, c, s, o, e)
    timeit(
        "full fwd+bwd",
        jax.grad(lambda *a: jnp.mean(full(*a) ** 2), argnums=(0, 1, 2, 3, 4)),
        m, c, s, o, e,
    )


if __name__ == "__main__":
    main()
