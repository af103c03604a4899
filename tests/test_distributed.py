"""Host-sharding helpers (parallel/distributed.py).  jax.distributed
itself needs real multi-process clusters; the shard math and the
single-host degradations are what can be tested here."""

import numpy as np

from aligngraph2_tpu.parallel.distributed import (host_shard,
                                                  host_shard_ids,
                                                  merge_host_counts)


def test_host_shard_partitions_exactly():
    for n in (0, 1, 7, 100, 101):
        for p in (1, 2, 3, 8):
            slices = [host_shard(n, i, p) for i in range(p)]
            ids = np.concatenate([np.arange(s.start, s.stop)
                                  for s in slices])
            assert len(ids) == n
            np.testing.assert_array_equal(ids, np.arange(n))
            sizes = [s.stop - s.start for s in slices]
            assert max(sizes) - min(sizes) <= 1


def test_host_shard_single_host_identity():
    s = host_shard(42, 0, 1)
    assert (s.start, s.stop) == (0, 42)
    np.testing.assert_array_equal(host_shard_ids(5, 0, 1), np.arange(5))


def test_merge_host_counts_single_host_identity():
    codes = np.array([3, 9, 11], np.int64)
    counts = np.array([2, 1, 5], np.int64)
    c, n = merge_host_counts(codes, counts, k=6)
    np.testing.assert_array_equal(c, codes)
    np.testing.assert_array_equal(n, counts)


def test_gather_host_bytes_single_host_identity():
    from aligngraph2_tpu.parallel.distributed import gather_host_bytes
    assert gather_host_bytes(b"hello\x00world") == [b"hello\x00world"]
    assert gather_host_bytes(b"") == [b""]


def test_gather_alignments_single_host_identity():
    from aligngraph2_tpu.align.records import Alignment, AlignmentSet
    from aligngraph2_tpu.parallel.distributed import gather_alignments
    a = AlignmentSet([Alignment("q", "r", True, 10, 0, 5, 7, 3, 8, 20,
                                "ACGTA", "ACG-A")])
    assert gather_alignments(a) is a


def test_ref_text_roundtrip():
    """to_ref_text/from_ref_text (the multi-host alignment interchange)
    must round-trip every header field and the gapped strings."""
    from aligngraph2_tpu.align.records import Alignment, AlignmentSet
    src = AlignmentSet([
        Alignment("q1", "tgt", True, 42, 1, 6, 9, 100, 105, 5000,
                  "ACG-TA", "ACGCT-"),
        Alignment("q2", "tgt", False, 7, 0, 3, 3, 50, 53, 5000,
                  "TTT", "TAT"),
    ])
    back = AlignmentSet.from_ref_text(src.to_ref_text())
    assert len(back) == 2
    for a, b in zip(src, back):
        assert (a.query_name, a.ref_name, a.forward, a.score, a.qb, a.qe,
                a.qsize, a.rb, a.re, a.rsize, a.qstr, a.tstr) \
            == (b.query_name, b.ref_name, b.forward, b.score, b.qb, b.qe,
                b.qsize, b.rb, b.re, b.rsize, b.qstr, b.tstr)
