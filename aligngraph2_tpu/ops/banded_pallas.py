"""Pallas TPU kernel for banded local-alignment DP.

The performance path of the seed-extend aligner (the lax.scan version in
banded_dp.py remains as the adaptive-band/CPU-compat path).  Design:

  * STATIC band in the "standard frame": target windows are constructed
    so the seed diagonal sits exactly at band center (c0 = W/2), hence
    the cell (i, j) always reads t[i-1+j].  W defaults to 512, covering
    +-256 of diagonal drift (a PacBio indel random walk over 10-20 kb
    stays well inside).
  * sentinel masking instead of explicit validity masks: q pads with 254,
    t pads with 255 — sentinels never match anything, so out-of-range
    cells can never rise above the local-alignment floor of 0.
  * TRANSPOSED layout: all per-row tensors are (W, TB) with the BATCH on
    the 128-wide lane dimension (TB = 128 alignments per program) and the
    band on sublanes.  Mosaic requires dynamic indices on the tiled
    (last two) dims to be tile-aligned; in this layout every per-row
    access is either a static sublane slice (the target window, unrolled
    over the chunk's K rows) or a leading-dim store (dirs), so nothing
    fights the tiling rules and lane utilization is 100%.
  * the row loop lives INSIDE the kernel, fully unrolled over a K-row
    chunk; the Pallas grid is (batch_tiles, row_chunks) with the DP
    state (H, best) carried across row chunks in VMEM scratch (TPU grid
    steps execute sequentially).
  * the target window for a chunk overlaps the next (K + W rows), which
    BlockSpec can't express — the caller pre-expands t into per-chunk
    slabs (n_chunks, K+W, B); t is ~1000x smaller than the dirs stream,
    so the duplication is noise.
  * the query-gap chain is a log2(W)-step Kogge-Stone max-plus scan of
    sublane shifts.

Direction codes match banded_dp (STOP/DIAG/UP/LEFT); traceback_t walks
the packed word layout on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded_dp import STOP, DIAG, UP, LEFT

NEG = -(1 << 28)  # python int: pallas kernels cannot capture array consts
Q_SENTINEL = 254
T_SENTINEL = 255


def _dp_kernel(q_ref, slab_ref, qlen_ref, best_ref, words_ref, H_scr,
               bcol_scr, brow_scr, alive_scr, *, K, W, match,
               mismatch, gap, ks_shifts, x_drop, dt=jnp.int32,
               probe_no_ks=False):
    """q_ref (K, TB) u8; slab_ref (1, K+W, TB) u8; qlen_ref (1, TB) i32;
    best_ref (8, TB) i32; words_ref (K/16, W, TB) i32; H_scr (W, TB) i32;
    bcol_scr/brow_scr (W, TB) i32; alive_scr (1, 1) i32 SMEM.

    Directions leave the kernel PRE-PACKED: 16 consecutive rows' 2-bit
    codes accumulate in a VMEM register block and land in HBM as one
    int32 word per (column, lane) — 4x less write traffic than uint8
    rows (the dirs stream is the kernel's dominant HBM cost) and no
    separate repack pass before the traceback walk.

    Best-cell tracking is COLUMN-WISE: per band column, the running max
    (bcol) and the first row that attained it (brow, strict-> update).
    That is 3 cheap (W, TB) vector ops per row instead of two
    log2(W)-step cross-sublane reductions; one final reduction at the
    last chunk recovers exactly the scan path's (score, best_i, best_j)
    semantics — first row to reach the global max, then min column: the
    first global attainment is some column's first attainment, so
    min-over-max-score-columns of brow is that row, and every column
    holding the max at that row has brow == that row (an earlier brow
    would contradict minimality).

    The row loop is a fully STATIC unroll of all K rows: Mosaic needs
    the slab[r:r+W] sublane slices static, so the substitution compare
    fuses straight into the row recurrence — the previous version
    staged all K substitution rows through an int8 VMEM scratch first
    (an extra store+load round trip per cell and the r3 roofline
    culprit) to keep the word loop dynamic.

    x_drop > 0 adds tile-level early exit: once EVERY lane of the batch
    tile is dead (its rows ran past qlen, or — after it started scoring —
    its row frontier fell more than x_drop below its best), the remaining
    row chunks skip the DP and the words writes.  Skipped words are
    garbage, which is safe: traceback starts at best_i, which cannot
    advance after death."""
    chunk = pl.program_id(1)
    TB = H_scr.shape[1]

    @pl.when(chunk == 0)
    def _init():
        H_scr[:] = jnp.zeros_like(H_scr)
        bcol_scr[:] = jnp.zeros_like(bcol_scr)
        brow_scr[:] = jnp.zeros_like(brow_scr)
        if x_drop > 0:
            alive_scr[0, 0] = 1

    # narrow negative sentinel: deep enough that sentinel + the worst
    # K-S chain penalty can never climb past 0, shallow enough that the
    # int16 mode's compare DIFFERENCES can't wrap: with neg = -2^13,
    # scores <= match*NQ <= 2^14 and |gap|*W <= 1536, every a-b formed
    # below stays within +-2^15 - 1
    dt_np = np.dtype(dt)
    is16 = dt_np.itemsize == 2
    neg = NEG if not is16 else -(1 << 13)
    cst = dt_np.type

    # int16 mode: Mosaic on v5e rejects i16 vector COMPARISONS, but
    # sub/add/bitwise/arithmetic-shift vectorize at 2x lane density —
    # so every compare+select becomes subtract + sign-broadcast
    # (x >> 15 -> all-ones iff negative) + bitwise select, which is
    # exactly equal to jnp.where given the no-overflow bounds above.
    def _sign(x):
        return jax.lax.shift_right_arithmetic(x, cst(15))

    def _sel(mask, a, b):
        """mask all-ones -> a, zeros -> b (bitwise select)."""
        return b ^ ((b ^ a) & mask)

    def compute():
        t_slab = slab_ref[0].astype(dt)               # (K + W, TB)
        q_all = q_ref[:].astype(dt)                   # (K, TB)
        H = H_scr[:]
        bcol = bcol_scr[:]
        brow = brow_scr[:]
        for w in range(K // 16):                      # static unroll
            acc = jnp.zeros((W, TB), jnp.int32)
            for s in range(16):
                r = w * 16 + s
                i = chunk * K + (r + 1)               # global row index
                up_vals = jnp.concatenate(
                    [H[1:, :], jnp.full((1, TB), neg, dt)], axis=0)
                u_v = up_vals + cst(gap)
                if is16:
                    # compare-free int16 row: d==0 test via sign(d | -d),
                    # max/select via sign-broadcast bitwise select
                    d = t_slab[r:r + W, :] - q_all[r:r + 1, :]
                    ne_mask = _sign(d | (cst(0) - d))
                    sub = _sel(ne_mask, cst(mismatch), cst(match))
                    d_v = H + sub
                    ge_mask = ~_sign(d_v - u_v)       # -1 iff d_v >= u_v
                    M = _sel(ge_mask, d_v, u_v)
                    m_dir = _sel(ge_mask, cst(DIAG), cst(UP))
                    pos_mask = _sign(cst(0) - M)      # -1 iff M > 0
                    m_dir = m_dir & pos_mask          # STOP (=0) if M <= 0
                    M = M & pos_mask                  # max(M, 0)
                    H = M
                    if not probe_no_ks:
                        for sh in ks_shifts:
                            shifted = jnp.concatenate(
                                [jnp.full((sh, TB), neg, dt),
                                 H[:-sh, :]], axis=0) + cst(gap * sh)
                            H = _sel(~_sign(H - shifted), H, shifted)
                    code = _sel(_sign(M - H), cst(LEFT), m_dir)
                    upd_mask = _sign(bcol - H)        # -1 iff H > bcol
                    bcol = _sel(upd_mask, H, bcol)
                    brow = _sel(upd_mask,
                                jax.lax.convert_element_type(i, dt), brow)
                else:
                    # substitution fused into the recurrence (static
                    # slice); masks from narrow compares must meet
                    # same-width operands (Mosaic can't relayout an i1
                    # vector between 16- and 32-bit lane shapes)
                    sub = jnp.where(
                        t_slab[r:r + W, :] == q_all[r:r + 1, :],
                        cst(match), cst(mismatch))
                    d_v = H + sub
                    M = jnp.maximum(d_v, u_v)
                    m_dir = jnp.where(d_v >= u_v, cst(DIAG), cst(UP))
                    m_dir = jnp.where(M > cst(0), m_dir, cst(STOP))
                    M = jnp.maximum(M, cst(0))
                    H = M
                    if not probe_no_ks:
                        for sh in ks_shifts:
                            shifted = jnp.concatenate(
                                [jnp.full((sh, TB), neg, dt), H[:-sh, :]],
                                axis=0)
                            H = jnp.maximum(H, shifted + cst(gap * sh))
                    code = jnp.where(H > M, cst(LEFT), m_dir)
                    upd = H > bcol
                    bcol = jnp.maximum(bcol, H)
                    brow = jnp.where(
                        upd, jax.lax.convert_element_type(i, dt), brow)
                acc = acc | (code.astype(jnp.int32) << (2 * s))
            words_ref[w, :, :] = acc
        H_scr[:] = H
        bcol_scr[:] = bcol
        brow_scr[:] = brow
        if x_drop > 0:
            # lane alive for the NEXT chunk: rows left before qlen, and
            # (not started scoring yet) or (frontier within x_drop of
            # best).  Reductions widen to int32 — Mosaic has no int16
            # reductions; this is once per chunk, not per row.
            frontier = jnp.max(H.astype(jnp.int32), axis=0,
                               keepdims=True)                  # (1, TB)
            best_sc = jnp.max(bcol.astype(jnp.int32), axis=0,
                              keepdims=True)                   # (1, TB)
            qlen = qlen_ref[:]                                 # (1, TB)
            next_i = (chunk + 1) * K + 1
            lane_alive = (next_i <= qlen) & (
                (best_sc[0:1, :] == 0)
                | (frontier >= best_sc[0:1, :] - x_drop))
            alive_scr[0, 0] = jnp.any(lane_alive).astype(jnp.int32)

    if x_drop > 0:
        @pl.when(alive_scr[0, 0] == 1)
        def _():
            compute()
    else:
        compute()

    @pl.when(chunk == pl.num_programs(1) - 1)
    def _finalize():
        # one cross-sublane reduction per lane tile for the whole query
        bcol = bcol_scr[:].astype(jnp.int32)
        brow = brow_scr[:].astype(jnp.int32)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
        S = jnp.max(bcol, axis=0, keepdims=True)               # (1, TB)
        mask = bcol == S
        istar = jnp.min(jnp.where(mask, brow, 1 << 30), axis=0,
                        keepdims=True)
        jstar = jnp.min(jnp.where(mask & (brow == istar), j_idx, W),
                        axis=0, keepdims=True)
        istar = jnp.where(S > 0, istar, 0)
        jstar = jnp.where(S > 0, jstar, 0)
        row_idx8 = jax.lax.broadcasted_iota(jnp.int32, best_ref.shape, 0)
        best_ref[:] = jnp.where(
            row_idx8 == 0, S, jnp.where(row_idx8 == 1, istar, jstar))


class PallasBandedResult(NamedTuple):
    score: jax.Array    # (B,) int32
    best_i: jax.Array   # (B,) int32
    best_j: jax.Array   # (B,) int32
    words: jax.Array    # (NQ//16, W, B) int32 — packed 2-bit direction
                        # codes; bits (2s, 2s+1) of word w = DP row
                        # 16*w + s + 1 (see pack semantics above)
    W: int


@functools.partial(jax.jit,
                   static_argnames=("W", "K", "TB", "match", "mismatch",
                                    "gap", "x_drop", "interpret", "dt16",
                                    "probe_no_ks"))
def banded_align_pallas(q, t, qlen=None, *, W=512, K=64, TB=128, match=2,
                        mismatch=-4, gap=-3, x_drop=0,
                        interpret=False, dt16=False,
                        probe_no_ks=False) -> PallasBandedResult:
    """q: (B, NQ) uint8 padded with Q_SENTINEL beyond each query's length;
    t: (B, NQ + W) uint8 windows in the standard frame (seed diagonal at
    W/2), padded with T_SENTINEL; qlen: (B,) query lengths (required when
    x_drop > 0; defaults to NQ).  B % TB == 0 and NQ % K == 0 required
    (callers bucket-pad)."""
    B, NQ = q.shape
    assert B % TB == 0 and NQ % K == 0 and K % 16 == 0, (B, TB, NQ, K)
    assert t.shape == (B, NQ + W)
    if qlen is None:
        qlen = jnp.full(B, NQ, jnp.int32)
    n_chunks = NQ // K
    qT = q.T                                      # (NQ, B)
    tT = t.T                                      # (NQ + W, B)
    # per-chunk overlapping slabs (n_chunks, K + W, B)
    row_ids = (np.arange(n_chunks)[:, None] * K
               + np.arange(K + W)[None, :])
    slabs = tT[jnp.asarray(row_ids)]
    ks_shifts = tuple(1 << s for s in range(int(np.log2(W))))
    # int16 DP state halves the vreg count of every H/bcol/brow op —
    # the kernel is vector-issue-bound (BASELINE.md roofline).  Mosaic
    # on v5e rejects i16 vector COMPARISONS, so the i16 row replaces
    # every compare with subtract + sign-broadcast + bitwise select
    # (exactly equal under the no-overflow bounds in _dp_kernel).
    # Opt-in via dt16 until it has a recorded hardware win; requires
    # match * NQ <= 2^14 so score differences stay in i16.
    if dt16:
        assert max(match, 1) * NQ <= (1 << 14), (match, NQ)
        dt = jnp.int16
    else:
        dt = jnp.int32
    kernel = functools.partial(_dp_kernel, K=K, W=W, match=match,
                               mismatch=mismatch, gap=gap,
                               ks_shifts=ks_shifts, x_drop=x_drop, dt=dt,
                               probe_no_ks=probe_no_ks)
    grid = (B // TB, n_chunks)
    best, words = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, TB), lambda b, i: (i, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K + W, TB), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, TB), lambda b, i: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // 16, W, TB), lambda b, i: (i, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, B), jnp.int32),
            jax.ShapeDtypeStruct((NQ // 16, W, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, TB), dt),          # H
            pltpu.VMEM((W, TB), dt),          # bcol
            pltpu.VMEM((W, TB), dt),          # brow
            pltpu.SMEM((1, 1), jnp.int32),    # alive
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(qT, slabs, qlen.astype(jnp.int32)[None, :])
    return PallasBandedResult(best[0], best[1], best[2], words, W)


def unpack_words(words):
    """(NQ//16, W, B) int32 packed words -> (NQ, W, B) uint8 direction
    codes (inverse of the kernel's in-register packing; test/debug aid)."""
    NW, W, B = words.shape
    shifts = (jnp.arange(16, dtype=jnp.int32) * 2)[None, :, None, None]
    d = (words[:, None, :, :] >> shifts) & 3
    return d.astype(jnp.uint8).reshape(NW * 16, W, B)


@functools.partial(jax.jit, static_argnames=("max_steps", "W"))
def traceback_t(words, best_i, best_j, *, max_steps, W):
    """Reference device traceback: one gather per move over the packed
    words, constant standard-frame band (diag pred keeps j, up pred j+1,
    left pred j-1).  The production path is traceback_fast (run-length
    walk); this one is the simple oracle it is tested against.

    Returns (moves (B, max_steps) uint8 END->START, n_moves, start_i,
    start_j); the alignment's target start is start_i + start_j."""
    NW, _, B = words.shape
    barange = jnp.arange(B, dtype=jnp.int32)

    def cond(carry):
        step_no, i, j, active, moves = carry
        return (step_no < max_steps) & jnp.any(active)

    def body(carry):
        step_no, i, j, active, moves = carry      # i/j/active: (B,)
        ii = jnp.maximum(i - 1, 0)
        word = words[jnp.clip(ii >> 4, 0, NW - 1),
                     jnp.clip(j, 0, W - 1), barange]
        cur = ((word >> (2 * (ii & 15))) & 3).astype(jnp.uint8)
        cur = jnp.where(active & (i > 0), cur, STOP)
        ni = jnp.where(cur == LEFT, i, i - 1)
        nj = jnp.where(cur == LEFT, j - 1,
                       jnp.where(cur == DIAG, j, j + 1))
        emit = jnp.where(cur == STOP, 0, cur).astype(jnp.uint8)
        moves = jax.lax.dynamic_update_slice(
            moves, emit[:, None], (0, step_no))
        live = active & (cur != STOP)
        i = jnp.where(live, ni, i)
        j = jnp.where(live, nj, j)
        return step_no + 1, i, j, live, moves

    moves0 = jnp.zeros((B, max_steps), jnp.uint8)
    _, si, sj, _, moves = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_i, best_j,
                     jnp.ones_like(best_i, dtype=bool), moves0))
    n = jnp.sum((moves != 0).astype(jnp.int32), axis=1)
    return moves, n, si, sj


@functools.partial(jax.jit, static_argnames=("max_steps", "W"))
def traceback_packed_device(words_arr, best_i, best_j, *, max_steps, W):
    """Device half of the fast traceback (see :func:`traceback_fast`).

    A per-move gather would be latency-bound (measured ~19 us per
    while_loop step on one chip — a (B,)-element gather from the
    multi-GB direction stream per DP move).  DIAG moves keep the band
    column j constant, and the DP kernel already emits 16 consecutive
    rows' direction codes packed into one int32 per (column, lane), so
    a single gather serves an entire DIAG run: each iteration consumes
    the run plus its terminating UP/LEFT with unrolled register-level
    bit ops, cutting iterations by ~the mean DIAG run length.  Emits
    per-iteration run-length codes (runs[b,it] DIAGs then moves[b,it]
    if nonzero); the host expander reconstructs the exact traceback_t
    output.
    """
    NW, _, B = words_arr.shape
    barange = jnp.arange(B, dtype=jnp.int32)
    MI = max_steps + 1

    def cond(c):
        it, i, j, n, active, runs, mvs = c
        return jnp.any(active) & (it < MI)

    def body(c):
        it, i, j, n, active, runs, mvs = c     # i/j/n: (B,) int32
        ii = i - 1
        live = active & (i > 0)
        word = words_arr[jnp.clip(ii >> 4, 0, NW - 1),
                         jnp.clip(j, 0, W - 1), barange]
        bit = ii & 15                          # slot of the current row
        run = jnp.zeros(B, jnp.int32)
        mv = jnp.zeros(B, jnp.int32)
        stopped = jnp.zeros(B, bool)
        consuming = live
        for s in range(16):                    # registers only: (B,) vregs
            avail = consuming & (bit >= s)
            cur = (word >> (2 * jnp.maximum(bit - s, 0))) & 3
            isdiag = avail & (cur == DIAG)
            hit_term = avail & (cur != DIAG)
            run = run + isdiag.astype(jnp.int32)
            stopped = stopped | (hit_term & (cur == STOP))
            mv = jnp.where(hit_term & (cur != STOP), cur, mv)
            consuming = isdiag
        is_up = (mv == UP).astype(jnp.int32)
        is_left = (mv == LEFT).astype(jnp.int32)
        i = jnp.where(live, i - run - is_up, i)
        j = jnp.where(live, j + is_up - is_left, j)
        n = n + jnp.where(live, run + (mv != 0).astype(jnp.int32), 0)
        runs = jax.lax.dynamic_update_index_in_dim(
            runs, jnp.where(live, run, 0).astype(jnp.uint8), it, 1)
        mvs = jax.lax.dynamic_update_index_in_dim(
            mvs, jnp.where(live, mv, 0).astype(jnp.uint8), it, 1)
        active = active & ~stopped & (i > 0) & (n < max_steps)
        return it + 1, i, j, n, active, runs, mvs

    runs0 = jnp.zeros((B, MI), jnp.uint8)
    mvs0 = jnp.zeros((B, MI), jnp.uint8)
    it, i, j, n, _, runs, mvs = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_i, best_j,
                     jnp.zeros(B, jnp.int32),
                     jnp.ones(B, bool), runs0, mvs0))
    return runs, mvs, it


def expand_packed_moves(runs, mvs, it_count, best_i, best_j, max_steps):
    """Host half: expand the per-iteration (diag-run, terminator) codes
    into the exact (moves, n, start_i, start_j) of :func:`traceback_t`,
    including its truncation-at-max_steps semantics."""
    B = runs.shape[0]
    C = int(it_count)
    runs = runs[:, :C].astype(np.int64)
    mvs = mvs[:, :C].astype(np.uint8)
    cnt = np.empty((B, 2 * C), np.int64)
    cnt[:, 0::2] = runs
    cnt[:, 1::2] = mvs != 0
    val = np.empty((B, 2 * C), np.uint8)
    val[:, 0::2] = DIAG
    val[:, 1::2] = mvs
    flat = np.repeat(val.ravel(), cnt.ravel())
    tot = cnt.sum(axis=1)
    ends = np.cumsum(tot)
    starts = ends - tot
    n = np.minimum(tot, max_steps)
    cn = np.cumsum(n)
    pos = np.arange(int(cn[-1])) - np.repeat(cn - n, n)
    lane = np.repeat(np.arange(B), n)
    moves = np.zeros((B, max_steps), np.uint8)
    moves[lane, pos] = flat[np.repeat(starts, n) + pos]
    ndiag = (moves == DIAG).sum(axis=1)
    nup = (moves == UP).sum(axis=1)
    nleft = (moves == LEFT).sum(axis=1)
    si = (best_i - ndiag - nup).astype(np.int32)
    sj = (best_j - nleft + nup).astype(np.int32)
    return moves, n.astype(np.int32), si, sj


@jax.jit
def _tb_meta(it, *rows):
    """One (1+len(rows), B) int32 device array: iteration count broadcast
    in row 0, then each extra per-lane row — a single host fetch replaces
    one ~25 ms relay round trip per array."""
    rows = [r.astype(jnp.int32) for r in rows]
    return jnp.stack([jnp.full_like(rows[0], it)] + rows)


@functools.partial(jax.jit, static_argnames=("Cp",))
def _tb_body(runs, mvs, Cp):
    return jnp.concatenate([runs[:, :Cp], mvs[:, :Cp]], axis=0)


def fetch_packed_traceback(runs, mvs, it, *rows, max_steps):
    """Bring a packed-traceback result to the host in TWO transfers.

    Only the USED prefix of the run-length buffers crosses the host
    boundary: the device walk typically terminates after ~max_steps /
    mean-DIAG-run iterations, and shipping the full (B, max_steps+1)
    buffers over a remote-device link costs more than the whole DP
    (measured 1.4 s vs 97 ms kernel at B=1024, NQ=8192).  The prefix
    length is bucketed to multiples of 256 so the device slice compiles
    a bounded number of shapes.  ``rows`` are extra per-lane int32 device
    arrays (scores, best cells, ...) that ride the first transfer.

    Returns (rows_host (len(rows), B) int32, runs_h, mvs_h, C)."""
    meta = np.asarray(_tb_meta(it, *rows))
    C = int(meta[0, 0])
    B = runs.shape[0]
    MI = max_steps + 1
    Cp = min(MI, ((max(C, 1) + 255) // 256) * 256)
    body = np.asarray(_tb_body(runs, mvs, Cp))
    return meta[1:], body[:B], body[B:], min(C, Cp)


def expand_moves(runs_h, mvs_h, it_count, best_i, best_j, max_steps):
    """Run-length -> dense move matrix: native core when available
    (ops/native.py agx_expand), numpy spec otherwise — identical output
    (tests/test_banded_pallas.py)."""
    from .native import expand_moves_native
    res = expand_moves_native(runs_h, mvs_h, it_count, best_i, best_j,
                              max_steps)
    if res is not None:
        return res
    return expand_packed_moves(runs_h, mvs_h, it_count,
                               np.asarray(best_i, np.int32),
                               np.asarray(best_j, np.int32), max_steps)


def traceback_fast(words, best_i, best_j, *, max_steps, W):
    """Drop-in traceback_t replacement (numpy outputs): packed-word
    device walk + two-transfer host fetch + run-length expansion.
    Exactly equal to traceback_t on all inputs
    (tests/test_banded_pallas.py)."""
    runs, mvs, it = traceback_packed_device(
        words, best_i, best_j, max_steps=max_steps, W=W)
    rows, runs_h, mvs_h, C = fetch_packed_traceback(
        runs, mvs, it, best_i, best_j, max_steps=max_steps)
    return expand_moves(runs_h, mvs_h, C, rows[0], rows[1], max_steps)


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
