"""Pallas contiguous-segment gather for banked binning.

Banked binning's per-(tile, slot) streams are CONTIGUOUS RUNS of the
(group, depth)-sorted per-gaussian arrays — but expressed as an XLA
gather they cost 10.6 ms of banked's 13.2 ms at bench scale (profiled:
one fused gather, HBM-latency-bound at 2.5 GB/s; tools/diag_banked.py /
BENCH_NOTES round 3). The CUDA reference never pays this: its per-tile
lists are contiguous after the global radix sort (SURVEY.md §2.1 step 4).

This kernel restores contiguity: one grid step per tile DMAs the S slot
windows (each 128-aligned, budget+128 wide) straight out of HBM and
masks validity by ABSOLUTE position — the downstream flat merge sort
reorders everything anyway, so the valid run does not need to start at
column 0 and no unaligned lane shift is ever needed. Outputs are the
flat-merge inputs directly: packed (tile<<qbits | q) keys and gaussian
ids, sentinel-filled outside the valid runs.

Sort payloads arrive packed as gidwin = gid | (win << _GID_BITS)
(gid < 2^25; win = nxw | nyw<<2 in up to 6 bits, so the packed value
never reaches the sign bit — ADVICE r3: the old 27/5-bit split
overflowed for tall windows and silently corrupted the recovered window
shape). Each slot then needs only two DMAs.

Output blocking (ADVICE r3): tiles are grouped m rows per output block
on a (num_tiles/m, m) grid — the inner grid dimension revisits one
(m, ncol) block, so VMEM holds 2·m·ncol int32 (~1.6 MB at waymo's
640×25600) instead of the whole (num_tiles, ncol) pair (131 MB there,
a guaranteed compile failure against ~16 MB/core VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 128
_GID_BITS = 25
_GID_MASK = (1 << _GID_BITS) - 1
# win bits live in [_GID_BITS, 31): callers must gate win_pack < _WIN_LIMIT.
_WIN_LIMIT = 1 << (31 - _GID_BITS)
INVALID_GID = 0x7FFFFFFF


def _make_kernel(budgets, dydx, qbits, m_rows):
    widths = [L + _ALIGN for L in budgets]
    offs = [sum(widths[:i]) for i in range(len(widths))]
    qmask = (1 << qbits) - 1

    def kernel(al_ref, lo_ref, hi_ref, key_hbm, gw_hbm, pk_ref, gid_ref,
               kbufs, gbufs, sems):
        bi = pl.program_id(1)
        t = pl.program_id(0) * m_rows + bi
        S = len(budgets)

        def dmas(s):
            # al arrives PRE-DIVIDED by 128: multiplying back makes the
            # 128-divisibility of the dynamic slice offset provable to
            # Mosaic (a raw scalar offset fails its divisibility check).
            a = al_ref[t * S + s] * _ALIGN
            w = widths[s]
            return (
                pltpu.make_async_copy(
                    key_hbm.at[:, pl.ds(a, w)], kbufs[s], sems.at[2 * s]
                ),
                pltpu.make_async_copy(
                    gw_hbm.at[:, pl.ds(a, w)], gbufs[s], sems.at[2 * s + 1]
                ),
            )

        started = [dmas(s) for s in range(S)]
        for ck, cg in started:
            ck.start()
            cg.start()

        tile_hi = t << qbits
        for s in range(S):
            ck, cg = started[s]
            ck.wait()
            cg.wait()
            w = widths[s]
            al = al_ref[t * S + s] * _ALIGN
            lo = lo_ref[t * S + s]
            hi = hi_ref[t * S + s]
            pos = al + jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
            key = kbufs[s][:]
            gw = gbufs[s][:]
            win = jax.lax.shift_right_logical(gw, _GID_BITS)
            nxw = win & 3
            nyw = jax.lax.shift_right_logical(win, 2)
            dy, dx = dydx[s]
            valid = (
                (pos >= lo) & (pos < hi) & (dy < nyw) & (dx < nxw)
            )
            q = key & qmask
            pk_ref[pl.ds(bi, 1), pl.ds(offs[s], w)] = jnp.where(
                valid, tile_hi | q, tile_hi | qmask
            )
            gid_ref[pl.ds(bi, 1), pl.ds(offs[s], w)] = jnp.where(
                valid, gw & _GID_MASK, INVALID_GID
            )

    return kernel, widths


def _block_rows(num_tiles: int) -> int:
    """Output rows per VMEM block: 8 (one int32 sublane group) when the
    tile count divides, else the whole array (tiny images only — callers
    gate the kernel on the resulting VMEM footprint)."""
    return 8 if num_tiles % 8 == 0 else num_tiles


@functools.lru_cache(maxsize=None)
def _build(budgets, dydx, qbits, num_tiles, n_pad):
    budgets = list(budgets)
    dydx = list(dydx)
    S = len(budgets)
    assert all(b % _ALIGN == 0 for b in budgets), (
        f"banked_gather budgets must be {_ALIGN}-aligned (Mosaic DMA widths "
        f"and output column offsets), got {budgets}"
    )
    m = _block_rows(num_tiles)
    kernel, widths = _make_kernel(budgets, dydx, qbits, m)
    ncol = sum(widths)

    @jax.custom_batching.custom_vmap
    def run(key_sorted, gw_sorted, al, lo, hi):
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(num_tiles // m, m),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                # (m, ncol) row blocks revisited along the inner grid dim:
                # each invocation writes row bi, the block flushes when the
                # outer index advances. Bounded VMEM at any tile count.
                out_specs=[
                    pl.BlockSpec((m, ncol), lambda bo, bi, *_: (bo, 0)),
                    pl.BlockSpec((m, ncol), lambda bo, bi, *_: (bo, 0)),
                ],
                scratch_shapes=[
                    [pltpu.VMEM((1, w), jnp.int32) for w in widths],
                    [pltpu.VMEM((1, w), jnp.int32) for w in widths],
                    pltpu.SemaphoreType.DMA((2 * S,)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((num_tiles, ncol), jnp.int32),
                jax.ShapeDtypeStruct((num_tiles, ncol), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=num_tiles * ncol * 10,
                bytes_accessed=num_tiles * ncol * 4 * 4,
                transcendentals=0,
            ),
        )(al.reshape(-1), lo.reshape(-1), hi.reshape(-1),
          key_sorted[None, :], gw_sorted[None, :])
        return tuple(out)

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, key_sorted, gw_sorted, al, lo, hi):
        def one(i):
            args = [
                (a[i] if b else a)
                for a, b in zip((key_sorted, gw_sorted, al, lo, hi), in_batched)
            ]
            return run(*args)

        res = jax.lax.map(one, jnp.arange(axis_size))
        return res, (True, True)

    return run


def gather_streams(key_sorted, gw_sorted, al, lo, hi, *, budgets, dydx,
                   qbits, num_tiles):
    """(packed, gid) flat-merge inputs, (num_tiles, sum(budgets)+S*128).

    key_sorted/gw_sorted: (n_pad,) int32, n_pad covering every window
    [al*128, al*128 + budget + 128). al/lo/hi: (num_tiles, S) int32 window
    descriptors (al = aligned start / 128, [lo, hi) the valid run)."""
    run = _build(tuple(budgets), tuple(dydx), qbits, num_tiles,
                 key_sorted.shape[-1])
    return run(key_sorted, gw_sorted, al, lo, hi)
