"""Internal stage timing of bin_gaussians_banked at bench scale.

Round-3 queue #2: banked binning ~13.5 ms of the 42.9 ms step. Stages:
  1. per-gaussian sort (g keys, payloads gid+win)
  2. searchsorted group starts (t+1 queries)
  3. per-slot segment gathers (S gathers of (t, L) from the sorted arrays)
  4. per-tile merge: 2-key lax.sort over (t, sum L_s)
Alternatives measured:
  4b. bitonic top-K merge of the already-sorted streams (log-depth rolls)
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
from ggrt_official_tpu.ops.rasterizer import tiling  # noqa: E402
from ggrt_official_tpu.ops.rasterizer.projection import project_gaussians  # noqa: E402

H, W = 320, 448
K = 1024


def timeit(name, fn, *args, iters=20):
    fj = jax.jit(fn)
    t0 = time.time()
    out = jax.block_until_ready(fj(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fj(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time() - t0) / iters * 1e3:.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    pg = jax.jit(
        lambda *a: project_gaussians(*a, (H, W))
    )(means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0])
    pg = jax.tree.map(jax.lax.stop_gradient, pg)
    g = pg.mean2d.shape[0]
    w = jax.random.normal(jax.random.PRNGKey(3), (g,))

    timeit(
        "banked total      ",
        lambda pg: jnp.dot(
            tiling.bin_gaussians_banked(pg, (H, W), max_dup=8, max_per_tile=K)
            .gaussian_ids.reshape(-1)
            .astype(jnp.float32),
            jnp.ones((160 * K,)),
        ),
        pg,
    )

    # Stage 1: the per-gaussian sort alone.
    ntx, nty = -(-W // 128), -(-H // 8)
    num_tiles = ntx * nty
    qbits = min(20, 31 - (num_tiles + 1).bit_length())

    def stage1(pg):
        x0, x1, y0, y1, visible = tiling._tile_aabb(pg, ntx, nty, 128, 8)
        x0w, y0w, nxw, nyw = tiling._dup_window_banked(pg, x0, x1, y0, y1, 128, 8, 1, 8)
        visible = visible & (nxw > 0) & (nyw > 0)
        q = tiling._quantize_depth(pg.depth, visible, qbits)
        group = jnp.where(visible, y0w * ntx + x0w, num_tiles).astype(jnp.int32)
        key = (group << qbits) | q
        win_pack = (nxw | (nyw << 2)).astype(jnp.int32)
        ks, gs, ws = jax.lax.sort(
            (key, jnp.arange(g, dtype=jnp.int32), win_pack), num_keys=1
        )
        return jnp.dot(gs.astype(jnp.float32), w)

    timeit("stage1 aabb+sort  ", stage1, pg)

    # Stage 3+4 proxy: gathers + the (t, 3072) 2-key merge sort on random
    # but realistically-shaped data.
    key = jax.random.PRNGKey(0)
    total_l = K + K + K // 4 + K // 4 + 4 * (K // 8)
    qa = jax.random.randint(key, (num_tiles, total_l), 0, 1 << qbits, jnp.int32)
    ga = jax.random.randint(key, (num_tiles, total_l), 0, g, jnp.int32)

    def merge_sort(qa, ga):
        qf, gf = jax.lax.sort((qa, ga), dimension=1, num_keys=2)
        return jnp.dot(gf[:, :K].reshape(-1).astype(jnp.float32), jnp.ones((num_tiles * K,)))

    timeit("stage4 merge sort ", merge_sort, qa, ga)

    # 4b: bitonic top-K tree merge of 8 sorted streams (pad short streams).
    def bitonic_merge_sorted(a, b):
        """Front-K of two ascending (t, K) key arrays via the bitonic
        half-cleaner: min(a, reverse(b)) is the K smallest AND bitonic;
        then log2(K) compare-exchange stages sort it (reshape pairing)."""
        kk = a.shape[1]
        m = jnp.minimum(a, b[:, ::-1])
        s = kk // 2
        while s >= 1:
            t_, k_ = m.shape
            r = m.reshape(t_, k_ // (2 * s), 2, s)
            lo = jnp.minimum(r[:, :, 0, :], r[:, :, 1, :])
            hi = jnp.maximum(r[:, :, 0, :], r[:, :, 1, :])
            m = jnp.stack([lo, hi], axis=2).reshape(t_, k_)
            s //= 2
        return m

    def tree_merge(qa):
        streams = []
        off = 0
        for L in (K, K, K // 4, K // 4, K // 8, K // 8, K // 8, K // 8):
            s = jax.lax.sort(qa[:, off:off + L], dimension=1)
            s = jnp.pad(s, ((0, 0), (0, K - L)), constant_values=(1 << 30))
            streams.append(s)
            off += L
        while len(streams) > 1:
            nxt = []
            for i in range(0, len(streams), 2):
                nxt.append(bitonic_merge_sorted(streams[i], streams[i + 1]))
            streams = nxt
        return jnp.dot(streams[0].reshape(-1).astype(jnp.float32),
                       jnp.ones((num_tiles * K,)))

    timeit("4b bitonic tree   ", tree_merge, qa)


if __name__ == "__main__" and sys.argv[-1] != "gathers":
    main()


def gathers():
    """Isolate the per-slot segment gathers + an un-DCE-able banked total."""
    import jax, jax.numpy as jnp
    means, cov, sh, opa, extr, intr, near, far, bg = build_inputs(jax, jnp, H, W)
    pg = jax.jit(
        lambda *a: project_gaussians(*a, (H, W))
    )(means[0], cov[0], sh[0], opa[0], extr[0], intr[0], near[0], far[0])
    pg = jax.tree.map(jax.lax.stop_gradient, pg)
    g = pg.mean2d.shape[0]
    ntx, nty = -(-W // 128), -(-H // 8)
    num_tiles = ntx * nty
    K = 1024
    wk = jax.random.normal(jax.random.PRNGKey(5), (num_tiles * K,))

    def banked_total(pg, wk):
        b = tiling.bin_gaussians_banked(pg, (H, W), max_dup=8, max_per_tile=K)
        return jnp.dot(b.gaussian_ids.reshape(-1).astype(jnp.float32), wk)

    timeit("banked total (no DCE)", banked_total, pg, wk)

    # Per-slot gathers alone: realistic (t, S) seg_lo/seg_total + the three
    # sorted arrays; reproduces the budgets loop of bin_gaussians_banked.
    key = jax.random.PRNGKey(1)
    gid_sorted = jax.random.randint(key, (g,), 0, g, jnp.int32)
    win_sorted = jax.random.randint(key, (g,), 0, 16, jnp.int32)
    q_sorted = jax.random.randint(key, (g,), 0, 1 << 20, jnp.int32)
    seg_lo = jax.random.randint(key, (num_tiles, 8), 0, g - 2048, jnp.int32)
    seg_total = jax.random.randint(key, (num_tiles, 8), 0, 2048, jnp.int32)
    budgets = [K, K, K // 4, K // 4, K // 8, K // 8, K // 8, K // 8]
    wq = jax.random.normal(jax.random.PRNGKey(6), (num_tiles, sum(budgets)))

    def slot_gathers(gid_sorted, win_sorted, q_sorted, seg_lo, seg_total, wq):
        q_cols, gid_cols = [], []
        for s in range(8):
            L = budgets[s]
            k_r = jnp.arange(L, dtype=jnp.int32)
            lo = seg_lo[:, s]
            length = jnp.minimum(seg_total[:, s], L)
            pos = jnp.clip(lo[:, None] + k_r[None, :], 0, g - 1)
            in_seg = k_r[None, :] < length[:, None]
            gid_at = gid_sorted[pos]
            win_at = win_sorted[pos]
            ok = in_seg & (win_at > 2)
            q_cols.append(jnp.where(ok, q_sorted[pos], (1 << 20) - 1))
            gid_cols.append(jnp.where(ok, gid_at, 0x7FFFFFFF))
        q_all = jnp.concatenate(q_cols, axis=1)
        gid_all = jnp.concatenate(gid_cols, axis=1)
        return jnp.sum(q_all * wq) + jnp.sum(gid_all * wq)

    timeit("slot gathers alone  ", slot_gathers, gid_sorted, win_sorted,
           q_sorted, seg_lo, seg_total, wq)


if __name__ == "__main__" and sys.argv[-1] == "gathers":
    gathers()
