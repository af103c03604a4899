"""Pallas DP kernel vs the lax.scan reference path.

On CPU the kernel runs in interpreter mode; shapes are tiny.  The
contract: identical scores to the adaptive-band scan path whenever the
alignment stays within the static band, and traceback-compatible dirs.
"""

import numpy as np
import pytest

from aligngraph2_tpu.io.seqdb import encode_seq, decode_seq
from aligngraph2_tpu.ops.banded_dp import (banded_align, traceback,
                                           moves_to_strings,
                                           numpy_local_align)
from aligngraph2_tpu.ops.banded_pallas import (banded_align_pallas,
                                               standard_frame_windows,
                                               Q_SENTINEL, T_SENTINEL)
from tests.synth import random_genome, mutate


def run_pallas(qs, ts, diags, NQ, W=128, K=64, TB=8):
    B = len(qs)
    Bp = ((B + TB - 1) // TB) * TB
    q = np.full((Bp, NQ), Q_SENTINEL, np.uint8)
    for i, qq in enumerate(qs):
        q[i, :len(qq)] = qq
    t, starts = standard_frame_windows(ts + [ts[-1]] * (Bp - B),
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
    # scan path on the same standard-frame windows
    qlen = np.array([len(x) for x in qs] + [0] * 0, np.int32)
    for b in range(8):
        q1 = np.zeros((1, NQ), np.uint8)
        q1[0, :len(qs[b])] = qs[b]
        t1 = t[b:b + 1, :NQ + W]
        scan = banded_align(
            q1, np.array([len(qs[b])], np.int32),
            t1, np.array([t1.shape[1]], np.int32),
            np.array([W // 2], np.int32), W=W)
        # sentinel cells differ from mask cells only outside the valid
        # region, so scores must agree exactly
        assert int(res.score[b]) == int(scan.score[0]), f"b={b}"


def test_pallas_traceback_reconstructs(rng):
    NQ, W = 256, 128
    g = encode_seq(random_genome(rng, 700))
    read = mutate(rng, decode_seq(g[100:340]), sub=0.04, ins=0.02,
                  dele=0.02)
    qc = encode_seq(read)
    res, starts, q, t = run_pallas([qc], [g], [100], NQ=NQ, W=W)
    moves, n, si, sj = traceback(res.dirs, res.centers, res.best_i,
                                 res.best_j, max_steps=2 * NQ + W)
    b = 0
    si_, sj_ = int(si[b]), int(sj[b])
    tb = si_ + W // 2 - W // 2 + sj_  # centers constant: p = i + j - 0
    # p = i - 1 + c - W/2 + j  with c = W/2 -> start_t = si + sj - ...
    start_t = si_ + int(res.centers[b][si_]) - W // 2 + sj_
    qstr, tstr, qe, te = moves_to_strings(
        np.asarray(moves[b]), qc, si_, start_t, t[b, :])
    assert qstr.replace("-", "") == decode_seq(qc[si_:qe])
    win = t[b]
    assert tstr.replace("-", "") == decode_seq(win[start_t:te])
    # score recomputation
    score = sum(2 if a == c else (-3 if "-" in (a, c) else -4)
                for a, c in zip(qstr, tstr))
    assert score == int(res.score[0])
    assert qe - si_ > 0.9 * len(qc)


def test_sentinels_never_align(rng):
    # a query made only of sentinel padding must score 0
    NQ, W = 128, 128
    q = np.full((8, NQ), Q_SENTINEL, np.uint8)
    t = np.full((8, NQ + W), T_SENTINEL, np.uint8)
    res = banded_align_pallas(q, t, W=W, K=64, TB=8, interpret=True)
    assert int(np.asarray(res.score).max()) == 0
