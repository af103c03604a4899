"""Pallas TPU kernel for banded local-alignment DP.

The performance path of the seed-extend aligner (the lax.scan version in
banded_dp.py remains as the adaptive-band/CPU-compat path).  Design:

  * STATIC band in the "standard frame": target windows are constructed
    so the seed diagonal sits exactly at band center (c0 = W/2), hence
    the cell (i, j) always reads t[i-1+j] — a plain dynamic row slice,
    no per-batch gathers.  W defaults to 512, covering +-256 of diagonal
    drift (PacBio indel random walk over 10-20 kb stays well inside).
  * sentinel masking instead of explicit validity masks: q pads with 254,
    t pads with 255 — sentinels never match anything, so out-of-range
    cells can never rise above the local-alignment floor of 0.
  * the row loop lives INSIDE the kernel; the Pallas grid is
    (batch_tiles, row_chunks) with the DP state (H, best) carried across
    row chunks in VMEM scratch (TPU grid steps execute sequentially).
  * direction bits stream out per row-chunk as (TB, K, W) uint8 blocks;
    traceback reuses the device traceback of banded_dp (band centers are
    constant in the standard frame).

Layout notes (pallas_guide.md): W is a multiple of 128 (lane width);
per-row tensors are (TB, W) with TB >= 8 to fill sublanes; the
query-gap chain uses a log2(W)-step Kogge-Stone max-plus scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_dp import BandedResult, STOP, DIAG, UP, LEFT

NEG = jnp.int32(-(1 << 28))
Q_SENTINEL = 254
T_SENTINEL = 255


def _dp_kernel(q_ref, t_ref, best_ref, dirs_ref, H_scr, best_scr, *,
               K, W, match, mismatch, gap, ks_shifts):
    chunk = pl.program_id(1)

    @pl.when(chunk == 0)
    def _init():
        H_scr[:] = jnp.zeros_like(H_scr)
        best_scr[:] = jnp.zeros_like(best_scr)

    def row(r, _):
        # global row index i = chunk*K + r + 1 consumes q[:, r] (local)
        i = chunk * K + r + 1
        H_prev = H_scr[:]
        q_col = q_ref[:, r][:, None].astype(jnp.int32)        # (TB, 1)
        t_row = t_ref[:, pl.ds(i - 1, W)].astype(jnp.int32)    # (TB, W)
        sub = jnp.where(t_row == q_col, match, mismatch)
        up_vals = jnp.concatenate(
            [H_prev[:, 1:], jnp.full((H_prev.shape[0], 1), NEG, jnp.int32)],
            axis=1)
        d_v = H_prev + sub
        u_v = up_vals + gap
        M = jnp.maximum(d_v, u_v)
        m_dir = jnp.where(d_v >= u_v, DIAG, UP).astype(jnp.uint8)
        m_dir = jnp.where(M > 0, m_dir, jnp.uint8(STOP))
        M = jnp.maximum(M, 0)
        H = M
        for sh in ks_shifts:
            shifted = jnp.concatenate(
                [jnp.full((H.shape[0], sh), NEG, jnp.int32), H[:, :-sh]],
                axis=1)
            H = jnp.maximum(H, shifted + gap * sh)
        dirs = jnp.where(H > M, jnp.uint8(LEFT), m_dir)
        H_scr[:] = H
        dirs_ref[:, r, :] = dirs
        # best tracking: (TB, 3) = score, i, j
        r_max = jnp.max(H, axis=1)
        r_arg = jnp.argmax(H, axis=1).astype(jnp.int32)
        upd = r_max > best_scr[:, 0]
        best_scr[:, 0] = jnp.where(upd, r_max, best_scr[:, 0])
        best_scr[:, 1] = jnp.where(upd, i, best_scr[:, 1])
        best_scr[:, 2] = jnp.where(upd, r_arg, best_scr[:, 2])
        return 0

    jax.lax.fori_loop(0, K, row, 0)
    best_ref[:] = best_scr[:]


class PallasBandedResult(NamedTuple):
    score: jax.Array
    best_i: jax.Array
    best_j: jax.Array
    dirs: jax.Array
    centers: jax.Array  # constant W/2 frame, for traceback compat


@functools.partial(jax.jit,
                   static_argnames=("W", "K", "TB", "match", "mismatch",
                                    "gap", "interpret"))
def banded_align_pallas(q, t, *, W=512, K=256, TB=8, match=2, mismatch=-4,
                        gap=-3, interpret=False) -> PallasBandedResult:
    """q: (B, NQ) uint8 padded with Q_SENTINEL beyond each query's length;
    t: (B, NQ + W) uint8 windows in the standard frame (seed diagonal at
    W/2), padded with T_SENTINEL.  B % TB == 0, NQ % K == 0 required
    (callers bucket-pad)."""
    B, NQ = q.shape
    assert B % TB == 0 and NQ % K == 0
    assert t.shape == (B, NQ + W)
    ks_shifts = tuple(1 << s for s in range(int(np.log2(W))))
    kernel = functools.partial(_dp_kernel, K=K, W=W, match=match,
                               mismatch=mismatch, gap=gap,
                               ks_shifts=ks_shifts)
    grid = (B // TB, NQ // K)
    best, dirs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, K), lambda b, i: (b, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, NQ + W), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, 3), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, K, W), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 3), jnp.int32),
            jax.ShapeDtypeStruct((B, NQ, W), jnp.uint8),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, W), jnp.int32),
            pltpu.VMEM((TB, 3), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, t)
    centers = jnp.full((B, NQ + 1), W // 2, jnp.int32)
    return PallasBandedResult(best[:, 0], best[:, 1], best[:, 2], dirs,
                              centers)


def standard_frame_windows(t_codes_list, diags, NQ, W):
    """Host helper: build (B, NQ + W) sentinel-padded target windows with
    each candidate's seed diagonal centered (window start = diag - W/2)."""
    B = len(t_codes_list)
    out = np.full((B, NQ + W), T_SENTINEL, np.uint8)
    starts = np.zeros(B, np.int64)
    for b, (codes, diag) in enumerate(zip(t_codes_list, diags)):
        ws = diag - W // 2
        starts[b] = ws
        lo = max(0, ws)
        hi = min(len(codes), ws + NQ + W)
        if hi > lo:
            out[b, lo - ws:hi - ws] = codes[lo:hi]
    return out, starts
