"""Pallas DP kernel vs the lax.scan reference path.

On CPU the kernel runs in interpreter mode; shapes are tiny.  The
contract: identical scores to the adaptive-band scan path whenever the
alignment stays within the static band, and traceback that exactly
reconstructs a scoring-consistent alignment.
"""

import numpy as np
import pytest

from aligngraph2_tpu.io.seqdb import encode_seq, decode_seq
from aligngraph2_tpu.ops.banded_dp import banded_align, moves_to_strings
from aligngraph2_tpu.ops.banded_pallas import (banded_align_pallas,
                                               standard_frame_windows,
                                               traceback_t,
                                               Q_SENTINEL, T_SENTINEL)
from tests.synth import random_genome, mutate


def run_pallas(qs, ts, diags, NQ, W=128, K=32, TB=8):
    B = len(qs)
    Bp = ((B + TB - 1) // TB) * TB
    q = np.full((Bp, NQ), Q_SENTINEL, np.uint8)
    for i, qq in enumerate(qs):
        q[i, :len(qq)] = qq
    t, starts = standard_frame_windows(
        list(ts) + [np.zeros(0, np.uint8)] * (Bp - B),
        list(diags) + [0] * (Bp - B), NQ, W)
    res = banded_align_pallas(q, t, W=W, K=K, TB=TB, interpret=True)
    return res, starts, q, t


def test_perfect_match_score():
    g = encode_seq("ACGT" * 64)
    res, starts, _, _ = run_pallas([g], [g], [0], NQ=256, W=128)
    assert int(res.score[0]) == 2 * 256


def test_matches_scan_path_scores(rng):
    NQ, W = 256, 128
    qs, ts, diags = [], [], []
    for _ in range(8):
        g = encode_seq(random_genome(rng, 800))
        start = int(rng.integers(0, 400))
        ln = int(rng.integers(150, 256))
        read = mutate(rng, decode_seq(g[start:start + ln]),
                      sub=0.05, ins=0.02, dele=0.02)
        qs.append(encode_seq(read))
        ts.append(g)
        diags.append(start)
    res, starts, q, t = run_pallas(qs, ts, diags, NQ=NQ, W=W)
    for b in range(8):
        q1 = np.zeros((1, NQ), np.uint8)
        q1[0, :len(qs[b])] = qs[b]
        t1 = t[b:b + 1]
        scan = banded_align(
            q1, np.array([len(qs[b])], np.int32),
            t1, np.array([t1.shape[1]], np.int32),
            np.array([W // 2], np.int32), W=W)
        assert int(res.score[b]) == int(scan.score[0]), f"b={b}"


def test_pallas_traceback_reconstructs(rng):
    NQ, W = 256, 128
    g = encode_seq(random_genome(rng, 700))
    read = mutate(rng, decode_seq(g[100:340]), sub=0.04, ins=0.02,
                  dele=0.02)
    qc = encode_seq(read)
    res, starts, q, t = run_pallas([qc], [g], [100], NQ=NQ, W=W)
    moves, n, si, sj = traceback_t(res.words, res.best_i, res.best_j,
                                   max_steps=2 * NQ + W, W=W)
    b = 0
    si_, sj_ = int(si[b]), int(sj[b])
    start_t = si_ + sj_  # standard frame: p = i + j
    qstr, tstr, qe, te = moves_to_strings(
        np.asarray(moves[b]), qc, si_, start_t, t[b])
    assert qstr.replace("-", "") == decode_seq(qc[si_:qe])
    assert tstr.replace("-", "") == decode_seq(t[b][start_t:te])
    score = sum(2 if a == c else (-3 if "-" in (a, c) else -4)
                for a, c in zip(qstr, tstr))
    assert score == int(res.score[0])
    assert qe - si_ > 0.9 * len(qc)


def test_sentinels_never_align():
    NQ, W = 128, 128
    q = np.full((8, NQ), Q_SENTINEL, np.uint8)
    t = np.full((8, NQ + W), T_SENTINEL, np.uint8)
    res = banded_align_pallas(q, t, W=W, K=32, TB=8, interpret=True)
    assert int(np.asarray(res.score).max()) == 0


def test_batch_lanes_independent(rng):
    """Alignments in different lanes must not leak into each other."""
    NQ, W = 128, 128
    g1 = encode_seq(random_genome(rng, 300))
    g2 = encode_seq(random_genome(rng, 300))
    res2, _, _, _ = run_pallas([g1[:100], g2[:120]], [g1, g2], [0, 0],
                               NQ=NQ, W=W)
    res1a, _, _, _ = run_pallas([g1[:100]], [g1], [0], NQ=NQ, W=W)
    res1b, _, _, _ = run_pallas([g2[:120]], [g2], [0], NQ=NQ, W=W)
    assert int(res2.score[0]) == int(res1a.score[0]) == 200
    assert int(res2.score[1]) == int(res1b.score[0]) == 240


def test_traceback_fast_matches_traceback_t(rng):
    """traceback_fast (packed-word device walk + host run-length
    expansion) must equal traceback_t move-for-move, including the
    truncation-at-max_steps semantics."""
    from aligngraph2_tpu.ops.banded_pallas import traceback_fast
    NQ, W = 256, 64
    B = 8
    qs, ts, diags = [], [], []
    for b in range(B):
        g = encode_seq(random_genome(rng, NQ + 50))
        read = encode_seq(mutate(rng, decode_seq(g[:NQ]), 0.12))[:NQ]
        qs.append(read)
        ts.append(g)
        diags.append(0)
    res, starts, q, t = run_pallas(qs, ts, diags, NQ, W=W)
    for ms in (2 * NQ, 100, 32, 15):
        m1, n1, i1, j1 = traceback_t(res.words, res.best_i, res.best_j,
                                     max_steps=ms, W=W)
        m2, n2, i2, j2 = traceback_fast(res.words, res.best_i,
                                        res.best_j, max_steps=ms, W=W)
        assert np.array_equal(np.asarray(m1), m2), ms
        assert np.array_equal(np.asarray(n1), n2), ms
        # start coordinates: traceback_t's device cursor equals the
        # host-recomputed start exactly (truncated or not) because both
        # apply the same move deltas to the same emitted prefix
        assert np.array_equal(np.asarray(i1), i2), ms
        assert np.array_equal(np.asarray(j1), j2), ms


def test_native_expand_matches_numpy_spec(rng):
    """agx_expand (native run-length expansion) == expand_packed_moves
    on random run/terminator streams, incl. truncation mid-run and at a
    terminator."""
    from aligngraph2_tpu.ops.banded_pallas import expand_packed_moves
    from aligngraph2_tpu.ops.native import expand_moves_native
    B, C = 16, 40
    runs = rng.integers(0, 17, (B, C)).astype(np.uint8)
    mvs = rng.choice(np.array([0, 1, 2, 3], np.uint8), (B, C),
                     p=[0.2, 0.1, 0.35, 0.35])
    bi = rng.integers(0, 500, B).astype(np.int32)
    bj = rng.integers(0, 64, B).astype(np.int32)
    for ms in (1000, 64, 17, 3):
        ref = expand_packed_moves(runs, mvs, C, bi, bj, ms)
        got = expand_moves_native(runs, mvs, C, bi, bj, ms)
        assert got is not None, "native core unavailable"
        for a, b in zip(ref, got):
            assert np.array_equal(np.asarray(a), np.asarray(b)), ms


def test_xdrop_matches_full_kernel(rng):
    """With x_drop on, surviving lanes must be bit-identical to the
    x_drop=0 kernel (interpret mode; the on-hardware gate lives in
    bench.py)."""
    NQ, W = 256, 128
    qs, ts, diags = [], [], []
    for _ in range(8):
        g = encode_seq(random_genome(rng, 800))
        start = int(rng.integers(0, 400))
        ln = int(rng.integers(120, 256))
        read = mutate(rng, decode_seq(g[start:start + ln]),
                      sub=0.05, ins=0.02, dele=0.02)
        qs.append(encode_seq(read))
        ts.append(g)
        diags.append(start)
    B, TB, K = 8, 8, 32
    q = np.full((B, NQ), Q_SENTINEL, np.uint8)
    qlen = np.zeros(B, np.int32)
    for i, qq in enumerate(qs):
        q[i, :len(qq)] = qq
        qlen[i] = len(qq)
    t, starts = standard_frame_windows(list(ts), list(diags), NQ, W)
    full = banded_align_pallas(q, t, qlen, W=W, K=K, TB=TB,
                               interpret=True)
    xd = banded_align_pallas(q, t, qlen, W=W, K=K, TB=TB, x_drop=250,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(xd.score),
                                  np.asarray(full.score))
    np.testing.assert_array_equal(np.asarray(xd.best_i),
                                  np.asarray(full.best_i))
    np.testing.assert_array_equal(np.asarray(xd.best_j),
                                  np.asarray(full.best_j))
    # traceback over the x-drop dirs gives the same moves: rows at or
    # below each lane's best_i are always written before tile death
    mf, nf, sif, sjf = traceback_t(full.words, full.best_i, full.best_j,
                                   max_steps=2 * NQ, W=W)
    mx, nx, six, sjx = traceback_t(xd.words, xd.best_i, xd.best_j,
                                   max_steps=2 * NQ, W=W)
    np.testing.assert_array_equal(np.asarray(mx), np.asarray(mf))
    np.testing.assert_array_equal(np.asarray(six), np.asarray(sif))


def test_int16_row_matches_int32(rng):
    """The compare-free int16 row (subtract + sign-broadcast + bitwise
    select, for targets whose VPU has 16-bit ALUs — v5e does not,
    BENCH_KERNEL.json) must be bit-identical to the int32 kernel:
    scores, best cells, and the packed direction words.  Interpret-mode
    execution of the compare-free row is slow, so shapes are minimal —
    the select logic is shape-independent."""
    NQ, W = 32, 32
    qs, ts, diags = [], [], []
    for _ in range(8):
        g = encode_seq(random_genome(rng, 200))
        start = int(rng.integers(0, 100))
        ln = int(rng.integers(16, 32))
        read = mutate(rng, decode_seq(g[start:start + ln]),
                      sub=0.08, ins=0.03, dele=0.03)
        qs.append(encode_seq(read))
        ts.append(g)
        diags.append(start)
    B, TB, K = 8, 8, 16
    q = np.full((B, NQ), Q_SENTINEL, np.uint8)
    qlen = np.zeros(B, np.int32)
    for i, qq in enumerate(qs):
        q[i, :len(qq)] = qq
        qlen[i] = len(qq)
    t, starts = standard_frame_windows(list(ts), list(diags), NQ, W)
    # x_drop=0 only: the x_drop block is dtype-independent (widens to
    # i32 either way) and each interpret-mode i16 variant costs ~a
    # minute of trace+eval
    r32 = banded_align_pallas(q, t, qlen, W=W, K=K, TB=TB,
                              interpret=True)
    r16 = banded_align_pallas(q, t, qlen, W=W, K=K, TB=TB,
                              interpret=True, dt16=True)
    for name in ("score", "best_i", "best_j", "words"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r16, name)),
            np.asarray(getattr(r32, name)), err_msg=f"{name}")


def test_xdrop_short_reads_stop_early(rng):
    """All-short-reads tile: the kernel must still produce correct scores
    (the skipped chunks' dirs are never read)."""
    NQ, W, K, TB = 256, 128, 32, 8
    g = encode_seq(random_genome(rng, 600))
    B = 8
    q = np.full((B, NQ), Q_SENTINEL, np.uint8)
    qlen = np.zeros(B, np.int32)
    ts, diags = [], []
    for b in range(B):
        ln = 64  # a quarter of NQ: 3/4 of the chunks are dead weight
        start = 100 + 10 * b
        q[b, :ln] = g[start:start + ln]
        qlen[b] = ln
        ts.append(g)
        diags.append(start)
    t, _ = standard_frame_windows(ts, diags, NQ, W)
    xd = banded_align_pallas(q, t, qlen, W=W, K=K, TB=TB, x_drop=100,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(xd.score), np.full(B, 128))
    np.testing.assert_array_equal(np.asarray(xd.best_i), np.full(B, 64))
