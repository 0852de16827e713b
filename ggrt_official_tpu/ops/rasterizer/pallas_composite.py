"""Pallas TPU kernels for per-tile alpha compositing (fwd + custom VJP).

Round-2 redesign: the round-1 kernel walked one Gaussian per loop step and
paid 9 scalar VMEM loads per Gaussian (~154 ms/step fwd+bwd). This version
processes 128-Gaussian chunks as whole vector registers:

  * records are stored component-major (tiles, 8, K) holding the CHOLESKY
    factorization of each Gaussian's conic + its tile-LOCAL mean folded
    into linear coefficients: rows [l00, l01, cu, l11, cv, opacity, 0, 0]
    so that u = l00·x + l01·y + cu, v = l11·y + cv are screen-space
    whitened offsets and alpha = opacity · exp(-(u² + v²)/2). Opacity is
    stored RAW, not as log: TPU's f32 log carries ~3.4e-4 relative error
    (measured, tools/diag_exp_precision.py) and the log→exp roundtrip the
    round-1 kernel used cost the image ~2.3e-4 absolute vs the XLA
    compositor, which computes op·exp(power) directly.
  * layout: pixels on sublanes (P = 1024 rows), Gaussians on lanes
    (chunks of 128). Per-Gaussian coefficients slice naturally as (1, CH)
    rows of the record block and broadcast against (P, 1) pixel-basis
    columns — pure f32 VPU ops. (An earlier MXU formulation evaluated
    u/v as basis matmuls; Mosaic runs those below f32 precision and the
    cancellation-prone linear terms lost ~3 digits vs the XLA path on
    real hardware. Only the cancellation-free color/gradient reductions
    use the MXU.)
  * transmittance is an inclusive cumprod of (1-alpha) along the Gaussian
    (lane) axis via 7 Hillis-Steele roll steps; the CUDA early-stop
    semantics (contribute iff T·Π(1-α) ≥ 1e-4, which self-latches because
    T is monotone) fall out as a single comparison.
  * per-tile dynamic work: a while-loop over ceil(count/128) chunks that
    also exits early once every pixel's transmittance is dead — the
    per-pixel early termination the CUDA kernel gets for free.
  * backward re-walks executed chunks back-to-front with the same
    structure; suffix sums along the Gaussian axis are lane rolls.
    Gradients flow to the record/color tensors; JAX AD chains them to
    Gaussian params and camera through the (pure-jnp) record construction
    and the gather's scatter-add transpose.

CUDA-parity semantics (alpha clamp 0.99, skip < 1/255, transmittance
early-out 1e-4) match /root/reference's external rasterizer contract
(SURVEY.md §2.1, cuda_splatting.py:118-125).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS, ProjectedGaussians
from .tiling import TILE_H, TILE_W, TileBinning

_CH = 128                      # gaussians per chunk (lane axis)
_P = TILE_H * TILE_W           # pixels of the DEFAULT tile (sublane axis)
_PREC = jax.lax.Precision.HIGHEST


def _basis(tile_h: int = TILE_H, tile_w: int = TILE_W):
    """(P, 3) pixel basis [x_local, y_local, 1], tile-centered coords.

    The tile shape is a free parameter: pixels live on the SUBLANE axis of
    every (P, CH) array (lanes hold gaussian chunks), so P = tile_h·tile_w
    only needs to be a multiple of 8 — nothing ties tile_w to the 128-lane
    width. Smaller tiles cut the per-(gaussian, tile)-pair pixel work
    (CUDA uses 256-px 16x16 tiles; our default 8x128 = 1024 px evaluates
    4x the pixels per pair) at the cost of more tiles and duplicates."""
    P = tile_h * tile_w
    p = jax.lax.broadcasted_iota(jnp.int32, (P, 3), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (P, 3), 1)
    px = (p % tile_w).astype(jnp.float32) - (tile_w - 1) / 2.0
    py = (p // tile_w).astype(jnp.float32) - (tile_h - 1) / 2.0
    return jnp.where(r == 0, px, jnp.where(r == 1, py, 1.0))


def _cumprod_lanes(x):
    """Inclusive cumprod along axis 1 via Hillis-Steele rolls."""
    n = x.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        x = x * jnp.where(ids >= s, pltpu.roll(x, s, 1), 1.0)
        s *= 2
    return x


def _suffix_sum_excl_lanes(x):
    """Exclusive suffix sum along axis 1 (sum over j > i)."""
    n = x.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    v = x
    s = 1
    while s < n:
        x = x + jnp.where(ids < n - s, pltpu.roll(x, n - s, 1), 0.0)
        s *= 2
    return x - v


def _chunk_quantities(B, A):
    """Per-chunk math, exact f32 VPU broadcasts.

    B: (8, CH) record rows; A: (P, 3) pixel basis.
    Returns (u, v, e, araw, alpha, om), each (P, CH); e = exp(-q/2),
    araw = op·e (unclamped), alpha gated+clamped to CUDA semantics."""
    X = A[:, 0:1]
    Y = A[:, 1:2]
    u = X * B[0:1, :] + Y * B[1:2, :] + B[2:3, :]
    v = Y * B[3:4, :] + B[4:5, :]
    e = jnp.exp(-0.5 * (u * u + v * v))
    araw = B[5:6, :] * e
    alpha = jnp.where(araw >= ALPHA_MIN, jnp.minimum(araw, ALPHA_MAX), 0.0)
    return u, v, e, araw, alpha, 1.0 - alpha


def _fwd_kernel(counts_ref, rec_ref, col_ref, acc_ref, tfin_ref, tst_ref, nexec_ref,
                *, tile_h: int, tile_w: int):
    K = rec_ref.shape[2]
    nch = K // _CH
    _P = tile_h * tile_w
    A = _basis(tile_h, tile_w)
    t = pl.program_id(0)
    need = jnp.minimum((counts_ref[t] + _CH - 1) // _CH, nch)

    # Accumulators live in the output VMEM blocks (read-modify-write):
    # while-loop carries would need Mosaic to unify the replicated layout of
    # constant inits with the concrete body layouts, which it refuses
    # ("Invalid relayout ... replicated in destination but not in source");
    # dynamic lane-offset stores (tst_ref[0, :, c]) are also rejected unless
    # 128-aligned, hence the lane-masked full-block select.
    acc_ref[0] = jnp.zeros((_P, 4), jnp.float32)
    tst_ref[0] = jnp.ones((_P, nch), jnp.float32)

    def body(carry):
        c, T_run = carry
        lane = jax.lax.broadcasted_iota(jnp.int32, (_P, nch), 1)
        tst_ref[0] = jnp.where(lane == c, T_run, tst_ref[0])
        off = pl.multiple_of(c * _CH, _CH)
        B = rec_ref[0, :, pl.ds(off, _CH)]
        C = col_ref[0, :, pl.ds(off, _CH)]
        _, _, _, _, alpha, om = _chunk_quantities(B, A)
        Tw = _cumprod_lanes(om)
        TT = T_run * Tw                      # (P, CH): T *after* gaussian g
        contrib = TT >= T_EPS
        w = jnp.where(contrib, alpha * TT / om, 0.0)
        # acc[p, c_] += sum_g w[p, g] * C[c_, g] — exact VPU reductions; a
        # dot_general here runs below f32 precision under Mosaic (HIGHEST
        # is not honored) and cost the image ~2e-4 absolute error.
        acc_ref[0] = acc_ref[0] + jnp.concatenate(
            [
                jnp.sum(w * C[0:1, :], axis=1, keepdims=True),
                jnp.sum(w * C[1:2, :], axis=1, keepdims=True),
                jnp.sum(w * C[2:3, :], axis=1, keepdims=True),
                jnp.zeros((_P, 1), jnp.float32),
            ],
            axis=1,
        )
        T_new = jnp.min(jnp.where(contrib, TT, T_run), axis=1, keepdims=True)
        return c + 1, T_new

    def cond(carry):
        c, T_run = carry
        return (c < need) & (jnp.max(T_run) >= T_EPS)

    c0 = jnp.zeros((), jnp.int32)
    T0 = jnp.ones((_P, 1), jnp.float32)
    c_fin, T_fin = jax.lax.while_loop(cond, body, (c0, T0))

    tfin_ref[0] = T_fin                      # (P, 1) frozen final T
    # Executed-chunk count, broadcast to an (8, 128) vector tile (Mosaic
    # cannot store scalars to VMEM; SMEM outputs reject per-grid-step
    # block maps; VMEM blocks need (8, 128)-aligned trailing dims).
    nexec_ref[0] = jnp.full((8, 128), c_fin.astype(jnp.float32))


def _bwd_kernel(
    nexec_ref, rec_ref, col_ref, tst_ref, tfin_ref, g_ref, gtfin_ref,
    drec_ref, dcol_ref,
    *, tile_h: int, tile_w: int,
):
    K = rec_ref.shape[2]
    _P = tile_h * tile_w
    A = _basis(tile_h, tile_w)
    nexec = nexec_ref[0, 0, 0].astype(jnp.int32)

    drec_ref[0] = jnp.zeros((8, K), jnp.float32)
    dcol_ref[0] = jnp.zeros((4, K), jnp.float32)

    dacc = g_ref[0]                                   # (P, 4)
    bgterm = gtfin_ref[0] * tfin_ref[0]               # (P, 1)

    def body(i, accum):
        c = nexec - 1 - i
        off = pl.multiple_of(c * _CH, _CH)
        B = rec_ref[0, :, pl.ds(off, _CH)]
        C = col_ref[0, :, pl.ds(off, _CH)]
        u, v, e, araw, alpha, om = _chunk_quantities(B, A)
        Tw = _cumprod_lanes(om)
        # Dynamic lane-index loads need 128 alignment; select the chunk's
        # T-start column with a lane mask instead.
        lane = jax.lax.broadcasted_iota(jnp.int32, tst_ref.shape[1:], 1)
        T_start = jnp.sum(
            jnp.where(lane == c, tst_ref[0], 0.0), axis=1, keepdims=True
        )                                              # (P, 1)
        TT = T_start * Tw
        contrib = TT >= T_EPS
        Tb = TT / om
        w = jnp.where(contrib, alpha * Tb, 0.0)        # (P, CH)

        # dL/dw[p, g] = sum_c dacc[p, c] * C[c, g] — exact VPU broadcasts
        # (MXU dots run below f32 precision under Mosaic).
        dwdot = (
            dacc[:, 0:1] * C[0:1, :]
            + dacc[:, 1:2] * C[1:2, :]
            + dacc[:, 2:3] * C[2:3, :]
        )                                              # (P, CH)
        # dcol[c_, g] = sum_p dacc[p, c_] * w[p, g]
        dcol_ref[0, :, pl.ds(off, _CH)] = jnp.concatenate(
            [
                jnp.sum(dacc[:, 0:1] * w, axis=0, keepdims=True),
                jnp.sum(dacc[:, 1:2] * w, axis=0, keepdims=True),
                jnp.sum(dacc[:, 2:3] * w, axis=0, keepdims=True),
                jnp.zeros((1, _CH), jnp.float32),
            ],
            axis=0,
        )

        vchunk = dwdot * w
        sfx = _suffix_sum_excl_lanes(vchunk)
        dalpha = jnp.where(
            contrib, dwdot * Tb - (sfx + accum + bgterm) / om, 0.0
        )
        live = (araw >= ALPHA_MIN) & (araw < ALPHA_MAX)
        daraw = jnp.where(live, dalpha, 0.0)            # (P, CH)
        dq2 = daraw * araw                               # wrt -(u²+v²)/2

        du = -u * dq2
        dv = -v * dq2
        X = A[:, 0:1]
        Y = A[:, 1:2]
        # d l00 = sum_p du * x ; d l01 = sum_p du * y ; d cu = sum_p du ...
        dl00 = jnp.sum(du * X, axis=0, keepdims=True)   # (1, CH)
        dl01 = jnp.sum(du * Y, axis=0, keepdims=True)
        dcu = jnp.sum(du, axis=0, keepdims=True)
        dl11 = jnp.sum(dv * Y, axis=0, keepdims=True)
        dcv = jnp.sum(dv, axis=0, keepdims=True)
        dop = jnp.sum(daraw * e, axis=0, keepdims=True)
        drec_ref[0, 0:1, pl.ds(off, _CH)] = dl00
        drec_ref[0, 1:2, pl.ds(off, _CH)] = dl01
        drec_ref[0, 2:3, pl.ds(off, _CH)] = dcu
        drec_ref[0, 3:4, pl.ds(off, _CH)] = dl11
        drec_ref[0, 4:5, pl.ds(off, _CH)] = dcv
        drec_ref[0, 5:6, pl.ds(off, _CH)] = dop

        return accum + jnp.sum(vchunk, axis=1, keepdims=True)

    jax.lax.fori_loop(0, nexec, body, jnp.zeros((_P, 1), jnp.float32))


def _fwd_raw(records, colors, counts, tile_h=TILE_H, tile_w=TILE_W):
    from functools import partial

    num_tiles, _, K = records.shape
    nch = K // _CH
    _P = tile_h * tile_w
    counts_i = counts.reshape(-1).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, K), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 4, K), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _P, 4), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, _P, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, _P, nch), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0)),
        ],
    )
    acc, tfin, tst, nexec = pl.pallas_call(
        partial(_fwd_kernel, tile_h=tile_h, tile_w=tile_w),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, _P, 4), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, _P, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, _P, nch), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=num_tiles * nch * 40 * _CH * _P,
            bytes_accessed=num_tiles * (12 * K + 4 * _P * (nch + 4)) * 4,
            transcendentals=num_tiles * nch * _CH * _P,
        ),
    )(counts_i, records, colors)
    return acc, tfin, tst, nexec


def _bwd_raw(records, colors, tst, nexec, tfin, gout, gtfin, tile_h=TILE_H, tile_w=TILE_W):
    from functools import partial

    num_tiles, _, K = records.shape
    nch = K // _CH
    _P = tile_h * tile_w
    drec, dcol = pl.pallas_call(
        partial(_bwd_kernel, tile_h=tile_h, tile_w=tile_w),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _P, nch), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _P, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _P, 4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _P, 1), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, K), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, K), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 4, K), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * num_tiles * K * 40 * _P,
            bytes_accessed=num_tiles * (24 * K + 4 * _P * (K // _CH + 8)) * 4,
            transcendentals=num_tiles * K * _P,
        ),
    )(nexec, records, colors, tst, tfin, gout, gtfin)
    return drec, dcol


_CORE_CACHE: dict = {}


def _get_composite_core(tile_h: int, tile_w: int):
    """custom_vjp compositing core for one static tile shape (cached so the
    same jaxpr-identity function is reused across traces)."""
    key = (tile_h, tile_w)
    if key in _CORE_CACHE:
        return _CORE_CACHE[key]

    @jax.custom_vjp
    def _composite_core(records, colors, counts):
        acc, tfin, _, _ = _fwd_raw(records, colors, counts, tile_h, tile_w)
        return acc, tfin

    def _core_fwd(records, colors, counts):
        acc, tfin, tst, nexec = _fwd_raw(records, colors, counts, tile_h, tile_w)
        return (acc, tfin), (records, colors, counts, tst, nexec, tfin)

    def _core_bwd(res, gouts):
        records, colors, counts, tst, nexec, tfin = res
        gout, gtfin = gouts
        drec, dcol = _bwd_raw(
            records, colors, tst, nexec, tfin, gout, gtfin, tile_h, tile_w
        )
        return drec, dcol, jnp.zeros_like(counts)

    _composite_core.defvjp(_core_fwd, _core_bwd)
    _CORE_CACHE[key] = _composite_core
    return _composite_core


# Default-tile-shape core (the tile-parallel renderer and diag tools bind it
# directly).
_composite_core = _get_composite_core(TILE_H, TILE_W)


_USE_INV_VJP = True


@jax.custom_vjp
def _gather_rows(comp, ids):
    """comp[max(ids, 0)] with an explicit scatter-add pullback over the LIVE
    list entries only.

    Letting JAX transpose the gather makes a (tiles·K)-row scatter whose
    index array includes every padded entry; round 2 replaced it with an
    inv_pos gather over the full (g, max_dup) dup table — 6.9M mostly-dead
    rows, 20.6 ms at bench scale. Scattering just the (tiles·K) live rows
    (164k) measures 10.9 ms (diag round 3); dead entries (ids < 0) route to
    a dump row. No inv_pos needed.
    """
    return comp[jnp.maximum(ids, 0)]


def _gather_rows_fwd(comp, ids):
    return comp[jnp.maximum(ids, 0)], (ids, comp.shape[0])


_SCATTER_IMPL = "segsum"  # "segsum" (sorted pallas segment-sum) | "xla"


def _gather_rows_bwd(res, dgath):
    ids, g = res
    t, K, C = dgath.shape
    idx = jnp.where(ids >= 0, ids, g).reshape(-1)
    if _SCATTER_IMPL == "segsum":
        # Sorted-rows pallas segment-sum: ~1.5 ms vs 10.9 ms for the XLA
        # scatter at bench scale (segment_sum.py has the why).
        from .segment_sum import scatter_add_rows

        dcomp = scatter_add_rows(
            idx, dgath.reshape(t * K, C), jnp.zeros((g, C), dgath.dtype)
        )
    else:
        full = jnp.zeros((g + 1, C), dgath.dtype)
        dcomp = full.at[idx].add(dgath.reshape(t * K, C), mode="drop")[:g]
    import numpy as np

    f0 = np.zeros(ids.shape, jax.dtypes.float0)
    return dcomp, f0


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def build_records(pg: ProjectedGaussians, binning: TileBinning,
                  tile_h: int = TILE_H, tile_w: int = TILE_W):
    """Gather per-tile Gaussian lists into component-major record tensors.

    Differentiable jnp: gradients chain conic→Cholesky and
    mean→linear-coefficient automatically; the list gather's pullback uses
    binning's inverse map when available (no scatter-add — see
    _gather_rows), falling back to JAX AD's scatter-add otherwise.
    """
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x
    num_tiles = nty * ntx
    ids = binning.gaussian_ids
    K0 = ids.shape[1]
    K_pad = max(_CH, -(-K0 // _CH) * _CH)

    safe_ids0 = jnp.maximum(ids, 0)

    # One fused (g, 9)-row gather instead of four per-component gathers:
    # measured 7.7 -> 4.0 ms fwd and 19.4 -> 14.3 ms fwd+vjp at the bench
    # population (tools/diag_records_fused.py, bit-exact).
    comp = jnp.concatenate(
        [pg.mean2d, pg.conic, pg.color, pg.opacity[:, None]], axis=-1
    )  # (g, 9)
    if _USE_INV_VJP:
        gath = _gather_rows(comp, ids)  # (t, K0, 9)
    else:
        gath = comp[safe_ids0]
    if K_pad != K0:
        ids = jnp.pad(ids, ((0, 0), (0, K_pad - K0)), constant_values=-1)
        gath = jnp.pad(gath, ((0, 0), (0, K_pad - K0), (0, 0)))
    present = (ids >= 0).astype(jnp.float32)
    mean2d = gath[..., 0:2]
    conic = gath[..., 2:5]
    color = gath[..., 5:8]
    opacity = gath[..., 8] * present

    t_idx = jnp.arange(num_tiles, dtype=jnp.float32)
    ox = (t_idx % ntx) * tile_w + (tile_w - 1) / 2.0
    oy = (t_idx // ntx) * tile_h + (tile_h - 1) / 2.0
    mx = mean2d[..., 0] - ox[:, None]
    my = mean2d[..., 1] - oy[:, None]

    ca, cb, cc = conic[..., 0], conic[..., 1], conic[..., 2]
    # Cholesky of the conic [[ca, cb], [cb, cc]]; invalid (padded/culled)
    # entries are clamped to keep sqrt-gradients finite — their alpha is
    # killed by opacity 0 → below the 1/255 cutoff.
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
    )  # (t, 4, K)
    counts = binning.counts.astype(jnp.float32)[:, None]  # (t, 1)
    return records, colors, counts


def composite_tiles_pallas(
    pg: ProjectedGaussians,
    binning: TileBinning,
    background: jnp.ndarray,
    image_shape: tuple[int, int],
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
) -> jnp.ndarray:
    """Drop-in replacement for composite.composite_tiles (Pallas backend)."""
    h, w = image_shape
    nty, ntx = binning.num_tiles_y, binning.num_tiles_x

    records, colors, counts = build_records(pg, binning, tile_h, tile_w)
    core = _get_composite_core(tile_h, tile_w)
    acc, tfin = core(records, colors, counts)  # (t, P, 4), (t, P, 1)

    rgb = jnp.swapaxes(acc[..., :3], 1, 2)                # (t, 3, P)
    img = rgb + jnp.swapaxes(tfin, 1, 2) * background[None, :, None]
    img = img.reshape(nty, ntx, 3, tile_h, tile_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, nty * tile_h, ntx * tile_w)
    return img[:, :h, :w]
