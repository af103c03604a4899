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
