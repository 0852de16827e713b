"""Pallas TPU kernels for per-tile alpha compositing (fwd + custom VJP).

The speed-of-light path replacing the XLA `composite.py` fallback: each
8x128 screen tile is one grid step; the tile's K-deep Gaussian list lives
in VMEM; pixels fill exactly one f32 VPU register tile (8 sublanes x 128
lanes); the per-Gaussian loop runs front-to-back with CUDA-identical
semantics (alpha clamp 0.99, skip < 1/255, transmittance early-out 1e-4 —
see SURVEY.md §2.1 and projection.py constants).

The backward kernel re-walks each tile back-to-front, reconstructing the
transmittance from the forward's final T (division by (1-alpha), the CUDA
trick) and accumulating dL/d{mean2d, conic, color, opacity} per Gaussian —
all Gaussian/camera gradients then flow through JAX AD outside the kernel
via the gather's scatter-add transpose.

Record layout (t, K, 8): [mean_x, mean_y, conic_a, conic_b, conic_c,
opacity, _, _] and colors (t, K, 4): [r, g, b, _] — padded so lane loads
stay aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, ProjectedGaussians
from .tiling import TILE_H, TILE_W, TileBinning


def _pixel_coords(tile_y, tile_x, dtype):
    py = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
    px = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
    x = (tile_x * TILE_W + px).astype(dtype)
    y = (tile_y * TILE_H + py).astype(dtype)
    return x, y


def _fwd_kernel(ntx_ref, rec_ref, col_ref, bg_ref, out_ref, tfin_ref, ncontrib_ref):
    t = pl.program_id(0)
    ntx = ntx_ref[0]
    tile_y = t // ntx
    tile_x = t % ntx
    K = rec_ref.shape[1]

    x, y = _pixel_coords(tile_y, tile_x, rec_ref.dtype)

    def body(k, carry):
        # `done` is a float 0/1 mask: Mosaic cannot legalize i1-vector loop
        # carries (scf.for legalization failure), floats work everywhere.
        T_run, done, acc_r, acc_g, acc_b, n_contrib = carry
        mx = rec_ref[0, k, 0]
        my = rec_ref[0, k, 1]
        ca = rec_ref[0, k, 2]
        cb = rec_ref[0, k, 3]
        cc = rec_ref[0, k, 4]
        op = rec_ref[0, k, 5]
        dx = x - mx
        dy = y - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

        test = T_run * (1.0 - alpha)
        newly_done = (test < T_EPS).astype(T_run.dtype)
        contribute = (1.0 - jnp.maximum(done, newly_done)) * (alpha > 0.0).astype(T_run.dtype)
        w = contribute * alpha * T_run
        acc_r = acc_r + w * col_ref[0, k, 0]
        acc_g = acc_g + w * col_ref[0, k, 1]
        acc_b = acc_b + w * col_ref[0, k, 2]
        T_run = jnp.where(contribute > 0, test, T_run)
        n_contrib = jnp.where(contribute > 0, k + 1, n_contrib)
        done = jnp.maximum(done, newly_done)
        return T_run, done, acc_r, acc_g, acc_b, n_contrib

    shape = (TILE_H, TILE_W)
    init = (
        jnp.ones(shape, rec_ref.dtype),
        jnp.zeros(shape, rec_ref.dtype),
        jnp.zeros(shape, rec_ref.dtype),
        jnp.zeros(shape, rec_ref.dtype),
        jnp.zeros(shape, rec_ref.dtype),
        jnp.zeros(shape, jnp.int32),
    )
    # Manual 4x unroll (Mosaic's fori_loop only supports unroll=1/full):
    # amortizes loop control over four gaussians; K is a lane multiple.
    def body4(q, carry):
        for j in range(_UNROLL):
            carry = body(q * _UNROLL + j, carry)
        return carry

    T_run, done, acc_r, acc_g, acc_b, n_contrib = jax.lax.fori_loop(
        0, K // _UNROLL, body4, init
    )

    out_ref[0, 0] = acc_r + T_run * bg_ref[0]
    out_ref[0, 1] = acc_g + T_run * bg_ref[1]
    out_ref[0, 2] = acc_b + T_run * bg_ref[2]
    tfin_ref[0] = T_run
    ncontrib_ref[0] = n_contrib


_LANES = 128
_UNROLL = 8


def _bwd_kernel(
    ntx_ref, rec_ref, col_ref, bg_ref, tfin_ref, ncontrib_ref, gout_ref,
    dstage_ref,
):
    """Back-to-front gradient walk.

    Mosaic cannot store scalars to VMEM, so per-Gaussian gradients are
    staged into an (12, 128) register block — component on sublanes,
    gaussian (k mod 128) on lanes, set via iota masks — and flushed with
    one vector store per 128 Gaussians. The output is component-major
    (t, 16, K): rows 0-5 = d{mean_x, mean_y, conic_a, conic_b, conic_c,
    opacity}, rows 6-8 = dcolor rgb, rows 9-15 zero.
    """
    t = pl.program_id(0)
    ntx = ntx_ref[0]
    tile_y = t // ntx
    tile_x = t % ntx
    K = rec_ref.shape[1]

    x, y = _pixel_coords(tile_y, tile_x, tfin_ref.dtype)
    g_r = gout_ref[0, 0]
    g_g = gout_ref[0, 1]
    g_b = gout_ref[0, 2]
    T_final = tfin_ref[0]
    n_contrib = ncontrib_ref[0]
    g_dot_bg = g_r * bg_ref[0] + g_g * bg_ref[1] + g_b * bg_ref[2]

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (16, _LANES), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (16, _LANES), 0)

    def body(i, carry):
        # Walk back-to-front: k = K-1-i.
        T_next, accum, staging = carry
        k = K - 1 - i
        mx = rec_ref[0, k, 0]
        my = rec_ref[0, k, 1]
        ca = rec_ref[0, k, 2]
        cb = rec_ref[0, k, 3]
        cc = rec_ref[0, k, 4]
        op = rec_ref[0, k, 5]
        cr = col_ref[0, k, 0]
        cg = col_ref[0, k, 1]
        cb_col = col_ref[0, k, 2]

        dx = x - mx
        dy = y - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        G = jnp.exp(power)
        raw_alpha = op * G
        alpha = jnp.minimum(ALPHA_MAX, raw_alpha)
        valid = (power <= 0.0) & (alpha >= ALPHA_MIN)
        alpha = jnp.where(valid, alpha, 0.0)
        live = valid & (k < n_contrib)

        one_minus = jnp.where(live, 1.0 - alpha, 1.0)
        T_i = T_next / one_minus  # transmittance before gaussian k
        S = jnp.where(live, alpha * T_i, 0.0)

        g_dot_c = g_r * cr + g_g * cg + g_b * cb_col
        live_f = live.astype(T_i.dtype)
        dalpha = live_f * (g_dot_c * T_i - (accum + g_dot_bg * T_final) / one_minus)
        not_clamped = (raw_alpha < ALPHA_MAX).astype(T_i.dtype)
        dG = not_clamped * op * dalpha
        dop_pix = not_clamped * G * dalpha
        dpower = dG * G

        grads = jnp.stack(
            [
                jnp.sum((ca * dx + cb * dy) * dpower),   # dmx
                jnp.sum((cc * dy + cb * dx) * dpower),   # dmy
                jnp.sum(-0.5 * dx * dx * dpower),        # dca
                jnp.sum(-dx * dy * dpower),              # dcb
                jnp.sum(-0.5 * dy * dy * dpower),        # dcc
                jnp.sum(dop_pix),                        # dop
                jnp.sum(g_r * S),                        # dcol r
                jnp.sum(g_g * S),                        # dcol g
                jnp.sum(g_b * S),                        # dcol b
            ]
        )
        # Scatter the 9 scalars into staging[(0..8), k % 128] via masks.
        lane = k % _LANES
        col_mask = lane_ids == lane
        update = jnp.zeros_like(staging)
        for c in range(9):
            update = update + jnp.where(
                col_mask & (row_ids == c), grads[c], 0.0
            )
        staging = staging + update

        # Flush when the descending walk finishes a 128-lane block.
        @pl.when(lane == 0)
        def _():
            block = pl.multiple_of(k, _LANES)
            dstage_ref[0, :, pl.ds(block, _LANES)] = staging

        staging = jnp.where(lane == 0, jnp.zeros_like(staging), staging)

        accum = accum + g_dot_c * S
        return T_i, accum, staging

    shape = (TILE_H, TILE_W)
    def body4(q, carry):
        for j in range(_UNROLL):
            carry = body(q * _UNROLL + j, carry)
        return carry

    jax.lax.fori_loop(
        0, K // _UNROLL, body4,
        (T_final, jnp.zeros(shape, tfin_ref.dtype), jnp.zeros((16, _LANES), tfin_ref.dtype)),
    )


def _composite_fwd_raw(records, colors, background, ntx_arr, num_tiles):
    K = records.shape[1]
    grid = (num_tiles,)
    out, tfin, ncontrib = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # NOTE: records in SMEM would make the per-gaussian scalar
            # loads cheaper, but the full K-deep list overflows the 1MB SMEM
            # (padding inflates (K, 8) blocks ~16x). Round-2: chunked
            # VMEM->SMEM copies. VMEM scalar loads are correct, just slower.
            pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, TILE_H, TILE_W), records.dtype),
            jax.ShapeDtypeStruct((num_tiles, TILE_H, TILE_W), records.dtype),
            jax.ShapeDtypeStruct((num_tiles, TILE_H, TILE_W), jnp.int32),
        ],
    )(ntx_arr, records, colors, background)
    return out, tfin, ncontrib


def _composite_bwd_raw(records, colors, background, ntx_arr, tfin, ncontrib, gout, num_tiles):
    K = records.shape[1]
    grid = (num_tiles,)
    dstage = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 16, K), records.dtype),
    )(ntx_arr, records, colors, background, tfin, ncontrib, gout)
    # Component-major (t, 16, K) -> cotangents matching the fwd inputs.
    drec = jnp.concatenate(
        [jnp.swapaxes(dstage[:, :6], 1, 2), jnp.zeros((num_tiles, K, 2), records.dtype)],
        axis=-1,
    )
    dcol = jnp.concatenate(
        [jnp.swapaxes(dstage[:, 6:9], 1, 2), jnp.zeros((num_tiles, K, 1), records.dtype)],
        axis=-1,
    )
    return drec, dcol


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _composite_tiles_core(records, colors, background, ntx, num_tiles):
    ntx_arr = jnp.array([ntx], jnp.int32)
    out, _, _ = _composite_fwd_raw(records, colors, background, ntx_arr, num_tiles)
    return out


def _core_fwd(records, colors, background, ntx, num_tiles):
    ntx_arr = jnp.array([ntx], jnp.int32)
    out, tfin, ncontrib = _composite_fwd_raw(records, colors, background, ntx_arr, num_tiles)
    return out, (records, colors, background, tfin, ncontrib)


def _core_bwd(ntx, num_tiles, residuals, gout):
    records, colors, background, tfin, ncontrib = residuals
    ntx_arr = jnp.array([ntx], jnp.int32)
    drec, dcol = _composite_bwd_raw(
        records, colors, background, ntx_arr, tfin, ncontrib, gout, num_tiles
    )
    # dL/dbackground = sum over pixels of g * T_final.
    dbg = jnp.einsum("tchw,thw->c", gout, tfin)
    return drec, dcol, dbg


_composite_tiles_core.defvjp(_core_fwd, _core_bwd)


def composite_tiles_pallas(
    pg: ProjectedGaussians,
    binning: TileBinning,
    background: jnp.ndarray,
    image_shape: tuple[int, int],
) -> jnp.ndarray:
    """Drop-in replacement for composite.composite_tiles (Pallas backend)."""
    h, w = image_shape
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    num_tiles = nty * ntx
    dtype = pg.mean2d.dtype

    ids = binning.gaussian_ids
    safe_ids = jnp.maximum(ids, 0)
    present = (ids >= 0).astype(dtype)

    mean2d = pg.mean2d[safe_ids]                      # (t, K, 2)
    conic = pg.conic[safe_ids]                        # (t, K, 3)
    color = pg.color[safe_ids]                        # (t, K, 3)
    opacity = pg.opacity[safe_ids] * present          # (t, K)

    zeros = jnp.zeros_like(opacity)
    records = jnp.stack(
        [
            mean2d[..., 0], mean2d[..., 1],
            conic[..., 0], conic[..., 1], conic[..., 2],
            opacity, zeros, zeros,
        ],
        axis=-1,
    )  # (t, K, 8)
    colors = jnp.concatenate([color, jnp.zeros_like(color[..., :1])], axis=-1)

    # The backward staging flushes 128 gaussians per store: pad K up to a
    # lane multiple (zero opacity = no-op; jnp.pad's VJP unpads cotangents).
    K = records.shape[1]
    K_pad = -(-K // 128) * 128
    if K_pad != K:
        records = jnp.pad(records, ((0, 0), (0, K_pad - K), (0, 0)))
        colors = jnp.pad(colors, ((0, 0), (0, K_pad - K), (0, 0)))

    out = _composite_tiles_core(records, colors, background, int(ntx), int(num_tiles))
    img = out.reshape(nty, ntx, 3, TILE_H, TILE_W)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, nty * TILE_H, ntx * TILE_W)
    return img[:, :h, :w]
