"""Device (XLA) consensus aggregation vs the numpy/python spec.

Two layers of parity:
  1. encode_windows_np + aggregate_device + assemble_window_tables must
     reproduce extract_window_tables' WindowTables exactly (backbone
     sums, edge dict incl. first-touch times, chain groups).
  2. the full device pipeline's consensus strings must equal the
     sequential AlnGraph oracle.
Runs on the CPU backend per conftest; the same jits run on TPU in
production.
"""

import numpy as np
import pytest

from aligngraph2_tpu.consensus.device import (aggregate_device,
                                              assemble_window_tables,
                                              encode_windows_np,
                                              window_consensus_via_device)
from aligngraph2_tpu.consensus.reduced import extract_window_tables
from tests.test_consensus_reduced import _oracle, _rand_read_aln

BASES = "ACGT"


def _tables_equal(a, b):
    assert a.skeleton_len == b.skeleton_len
    np.testing.assert_array_equal(a.bb_weight, b.bb_weight)
    np.testing.assert_array_equal(a.bb_cov, b.bb_cov)
    assert dict(a.edges) == dict(b.edges), (
        {k: v for k, v in a.edges.items() if b.edges.get(k) != v},
        {k: v for k, v in b.edges.items() if a.edges.get(k) != v})
    ka, kb = set(a.chains), set(b.chains)
    assert ka == kb, (ka - kb, kb - ka)
    for k in ka:
        assert list(a.chains[k]) == list(b.chains[k]), (k, a.chains[k],
                                                        b.chains[k])


@pytest.mark.parametrize("seed", range(6))
def test_device_tables_equal_spec(seed):
    rng = np.random.default_rng(seed)
    skeletons, window_alns = [], []
    for _ in range(int(rng.integers(1, 4))):
        L = int(rng.integers(4, 50))
        sk = "".join(BASES[i] for i in rng.integers(0, 4, L))
        alns = []
        for _ in range(int(rng.integers(0, 20))):
            alns.append(_rand_read_aln(
                rng, sk, float(rng.choice([0.1, 0.4, 0.7])), alns))
        skeletons.append(sk)
        window_alns.append(alns)
    lens = [len(s) for s in skeletons]
    enc = encode_windows_np(window_alns, lens)
    agg = aggregate_device(enc)
    tables = assemble_window_tables(enc, agg, lens)
    for t_dev, (alns, L) in zip(tables, zip(window_alns, lens)):
        t_spec = extract_window_tables(L, alns)
        _tables_equal(t_dev, t_spec)


@pytest.mark.parametrize("seed", range(4))
def test_device_consensus_equals_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    skeletons, window_alns = [], []
    for _ in range(2):
        L = int(rng.integers(10, 60))
        sk = "".join(BASES[i] for i in rng.integers(0, 4, L))
        alns = []
        for _ in range(int(rng.integers(3, 30))):
            alns.append(_rand_read_aln(
                rng, sk, float(rng.choice([0.1, 0.5])), alns))
        skeletons.append(sk)
        window_alns.append(alns)
    for mw in (0, 2):
        got = window_consensus_via_device(skeletons, window_alns, mw)
        exp = [_oracle(sk, alns, mw)
               for sk, alns in zip(skeletons, window_alns)]
        assert got == exp


def test_device_long_gap_and_overflow_chains():
    """Exercise the long-gap host patch (>= GAP_SLOTS consecutive
    deletions between matches) and the overflow chain path (> MAX_PACK
    inserted bases)."""
    rng = np.random.default_rng(5)
    L = 120
    sk = "".join(BASES[i] for i in rng.integers(0, 4, L))
    # match 1 base, delete 40, match the rest
    q1 = sk[0] + "-" * 40 + sk[41:80]
    t1 = sk[:80]
    # 70-base insert run between two matches (overflow chain), twice
    # (identical -> still must merge exactly via the ops read-back)
    ins = "".join(BASES[i] for i in rng.integers(0, 4, 70))
    q2 = sk[10] + ins + sk[11]
    t2 = sk[10] + "-" * 70 + sk[11]
    alns = [(1, q1, t1, 3), (11, q2, t2, 2), (11, q2, t2, 1)]
    lens = [L]
    enc = encode_windows_np([alns], lens)
    agg = aggregate_device(enc)
    assert len(agg["long_cols"]) >= 1
    tables = assemble_window_tables(enc, agg, lens)
    _tables_equal(tables[0], extract_window_tables(L, alns))
    got = window_consensus_via_device([sk], [alns])
    assert got == [_oracle(sk, alns)]


def test_device_empty_and_deletion_only():
    sk = "ACGTACGT"
    cases = [
        [],
        [(1, "--------", "ACGTACGT", 2)],
        [(1, "ACGTACGT", "ACGTACGT", 1),
         (1, "----", "ACGT", 4)],
    ]
    for alns in cases:
        got = window_consensus_via_device([sk], [alns])
        assert got == [_oracle(sk, alns)], alns
