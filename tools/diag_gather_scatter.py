"""Measure TPU gather/scatter primitive costs at bench scale to pick the
records-construction strategy (round-2 queue: build_records fwd+vjp is
13.7 ms, dominated by the VJP's scatter-add into the (g, 9) component
matrix).

Candidate structures measured here:
  A. row gather (t*K, 9) <- comp[(g,9)] by ids            (current fwd)
  B. scatter-ADD (t*K, 9) rows into (g, 9) by ids         (current bwd, AD)
  C. permutation scatter-SET of int32 ids (counting path fwd)
  D. permutation scatter-SET of (9,) f32 rows (fused records-from-dup)
  E. big row gather (g*dup, 9) <- (t*K+1, 9) by inv_pos   (gather-based bwd)
     + dup-axis reduction
  F. counting binning vs sort binning, standalone fwd
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_inputs  # noqa: E402
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians  # noqa: E402
from ggrt_official_tpu.ops.rasterizer import tiling  # noqa: E402

H, W = 320, 448
MAX_DUP = 8
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
    g = means.shape[1]
    pg = project_gaussians(
        means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0], (H, W)
    )
    pg = jax.tree_util.tree_map(jax.block_until_ready, pg)

    binning = jax.jit(
        lambda pg: tiling.bin_gaussians(pg, (H, W), max_dup=MAX_DUP, max_per_tile=K)
    )(pg)
    jax.block_until_ready(binning.gaussian_ids)
    T = binning.gaussian_ids.shape[0]
    print(f"g={g} dup={MAX_DUP} tiles={T} K={K} stream={g*MAX_DUP}", flush=True)

    key = jax.random.PRNGKey(1)
    comp = jax.random.normal(key, (g, 9))
    ids = binning.gaussian_ids
    safe_ids = jnp.maximum(ids, 0)

    # A: row gather (current fwd)
    timeit("A  gather (t,K,9) <- comp[ids]", lambda c, i: c[i], comp, safe_ids)

    # B: scatter-add rows (what AD generates for A's VJP)
    dg = jax.random.normal(key, (T, K, 9))
    timeit(
        "B  scatter-ADD (t*K,9) -> (g,9)",
        lambda d, i: jnp.zeros((g, 9)).at[i.reshape(-1)].add(d.reshape(-1, 9)),
        dg, safe_ids,
    )

    # C: permutation scatter-set of int32 (counting-path structure)
    stream = g * MAX_DUP
    kpos = jax.random.permutation(key, stream) % (T * K)
    vals = jnp.arange(stream, dtype=jnp.int32)
    timeit(
        "C  scatter-SET int32 stream -> (t*K,)",
        lambda p, v: jnp.full((T * K + 1,), -1, jnp.int32).at[p].set(v, mode="drop"),
        kpos, vals,
    )

    # D: permutation scatter-set of f32 rows
    rows = jax.random.normal(key, (stream, 9))
    timeit(
        "D  scatter-SET (stream,9) -> (t*K,9)",
        lambda p, r: jnp.zeros((T * K + 1, 9)).at[p].set(r, mode="drop"),
        kpos, rows,
    )

    # E: big gather (g*dup, 9) + dup reduction (gather-based bwd)
    dflat = jnp.concatenate([dg.reshape(-1, 9), jnp.zeros((1, 9))], axis=0)
    inv = jax.random.randint(key, (g, MAX_DUP), 0, T * K)
    timeit(
        "E  gather (g,dup,9) <- (t*K,9) + sum(dup)",
        lambda d, i: d[i].sum(axis=1),
        dflat, inv,
    )

    # E2: same gather expressed as take along flattened rows
    timeit(
        "E2 gather one-comp (g,dup) x9 + sum",
        lambda d, i: sum(d[:, c][i].sum(axis=1) for c in range(9)),
        dflat, inv,
    )

    # F: binning variants standalone
    timeit(
        "F1 bin_gaussians (sort)",
        lambda p: tiling.bin_gaussians(p, (H, W), max_dup=MAX_DUP, max_per_tile=K),
        pg,
    )
    timeit(
        "F2 bin_gaussians_counting",
        lambda p: tiling.bin_gaussians_counting(p, (H, W), max_dup=MAX_DUP, max_per_tile=K),
        pg,
    )


if __name__ == "__main__":
    main()
