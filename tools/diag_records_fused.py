"""build_records variants: 4 separate component gathers (current) vs one
fused (g, 9)-row gather + single scatter-add transpose.

Also times the binning sub-steps that don't involve the big sort:
rank-scatter vs enumeration div/mod, to see what the non-sort ~24 ms of
bin_gaussians is made of.
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
from ggrt_official_tpu.ops.rasterizer import pallas_composite as pc
from ggrt_official_tpu.ops.rasterizer import tiling
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians

H, W = 320, 448
KW = dict(max_dup=8, max_per_tile=1024)
TILE_H, TILE_W = tiling.TILE_H, tiling.TILE_W


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


def build_records_fused(pg, binning):
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    num_tiles = nty * ntx
    ids = binning.gaussian_ids
    K = ids.shape[1]

    safe_ids = jnp.maximum(ids, 0)
    present = (ids >= 0).astype(jnp.float32)

    comp = jnp.concatenate(
        [pg.mean2d, pg.conic, pg.color, pg.opacity[:, None]], axis=-1
    )  # (g, 9)
    gath = comp[safe_ids]                                 # (t, K, 9)
    mean2d = gath[..., 0:2]
    conic = gath[..., 2:5]
    color = gath[..., 5:8]
    opacity = gath[..., 8] * present

    t_idx = jnp.arange(num_tiles, dtype=jnp.float32)
    ox = (t_idx % ntx) * TILE_W + (TILE_W - 1) / 2.0
    oy = (t_idx // ntx) * TILE_H + (TILE_H - 1) / 2.0
    mx = mean2d[..., 0] - ox[:, None]
    my = mean2d[..., 1] - oy[:, None]

    ca, cb, cc = conic[..., 0], conic[..., 1], conic[..., 2]
    ca_s = jnp.maximum(ca, 1e-12)
    l00 = jnp.sqrt(ca_s)
    l01 = cb / l00
    l11 = jnp.sqrt(jnp.maximum(cc - l01 * l01, 1e-12))
    cu = -(l00 * mx + l01 * my)
    cv = -l11 * my

    zeros = jnp.zeros_like(ca)
    records = jnp.stack([l00, l01, cu, l11, cv, opacity, zeros, zeros], axis=1)
    colors = jnp.stack(
        [color[..., 0], color[..., 1], color[..., 2], jnp.zeros_like(ca)], axis=1
    )
    counts = binning.counts.astype(jnp.float32)[:, None]
    return records, colors, counts


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    m, c, s, o, e = means[0], cov[0], sh[0], opa[0], extr[0]
    i3, nr, fr = intr[0], near[0], far[0]
    g = m.shape[0]

    pg = jax.jit(
        lambda m, c, s, o, e: project_gaussians(m, c, s, o, e, i3, nr, fr, (H, W))
    )(m, c, s, o, e)
    pg = jax.tree.map(jax.lax.stop_gradient, pg)
    binning = jax.jit(lambda pg: tiling.bin_gaussians(pg, (H, W), **KW))(pg)
    binning = binning._replace(
        num_tiles_y=int(binning.num_tiles_y), num_tiles_x=int(binning.num_tiles_x)
    )

    for name, fn in [("current", pc.build_records), ("fused", build_records_fused)]:
        timeit(
            f"build_records[{name}] fwd",
            lambda m2, con, col, op, _fn=fn: sum(
                jnp.sum(x)
                for x in _fn(
                    pg._replace(mean2d=m2, conic=con, color=col, opacity=op), binning
                )[:2]
            ),
            pg.mean2d, pg.conic, pg.color, pg.opacity,
        )
        timeit(
            f"build_records[{name}] fwd+vjp",
            jax.grad(
                lambda m2, con, col, op, _fn=fn: sum(
                    jnp.sum(x)
                    for x in _fn(
                        pg._replace(mean2d=m2, conic=con, color=col, opacity=op),
                        binning,
                    )[:2]
                ),
                argnums=(0, 1, 2, 3),
            ),
            pg.mean2d, pg.conic, pg.color, pg.opacity,
        )

    # equality check
    a = jax.jit(lambda: pc.build_records(pg, binning))()
    b = jax.jit(lambda: build_records_fused(pg, binning))()
    import numpy as np

    for x, y, nm in zip(a, b, ("records", "colors", "counts")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0, rtol=0)
    print("fused == current exactly", flush=True)

    # ---- binning sub-steps (non-sort part) ----
    visible = pg.valid & (pg.radius > 0.0)

    timeit(
        "rank via scatter (zeros.at[order].set)",
        lambda d: jnp.zeros(g, jnp.int32)
        .at[jnp.argsort(jnp.where(visible, d, jnp.inf))]
        .set(jnp.arange(g, dtype=jnp.int32))
        .sum(),
        pg.depth,
    )

    ntx = -(-W // TILE_W)
    nty = -(-H // TILE_H)
    x0 = jnp.clip(((pg.mean2d[:, 0] - pg.radius) / TILE_W).astype(jnp.int32), 0, ntx)
    nx = jnp.clip(
        jnp.floor((pg.mean2d[:, 0] + pg.radius + TILE_W - 1) / TILE_W).astype(jnp.int32),
        0, ntx,
    ) - x0
    y0 = jnp.clip(((pg.mean2d[:, 1] - pg.radius) / TILE_H).astype(jnp.int32), 0, nty)

    def enum_divmod(nx, x0, y0):
        slot = jnp.arange(KW["max_dup"], dtype=jnp.int32)
        nx_safe = jnp.maximum(nx, 1)
        ty = y0[:, None] + slot[None, :] // nx_safe[:, None]
        tx = x0[:, None] + slot[None, :] % nx_safe[:, None]
        return (ty * ntx + tx).sum()

    timeit("dup enumeration (div/mod)", enum_divmod, nx, x0, y0)


if __name__ == "__main__":
    main()
