"""Native seed-hit enumerator (native/seedhits.cpp) must produce the
exact candidate map of the numpy specification path in
seedextend.find_candidates_batch."""

import numpy as np
import pytest

from aligngraph2_tpu.config import AlignerConfig
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.ops.native import get_lib, seed_hits_native
from aligngraph2_tpu.ops.seedextend import SeedIndex, find_candidates_batch
from tests.synth import make_dataset

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _cand_map_fingerprint(cm):
    return {r: [(c.tid, c.forward, c.diag, c.hits, c.score) for c in v]
            for r, v in cm.items()}


@pytest.mark.parametrize("seed", [0, 5])
def test_native_seeding_matches_numpy(seed, monkeypatch):
    ds = make_dataset(seed=seed, genome_len=8000, coverage=10,
                      mean_read=900, read_err=0.03, n_contigs=2)
    reads = SeqDatabase(ds["reads"])
    refs = SeqDatabase(ds["similar"])
    cfg = AlignerConfig(seed_k=11, band_width=128, min_block_hits=3)
    idx = SeedIndex(refs, cfg.seed_k, stride=cfg.seed_stride)
    assert idx.dense_cnt is not None
    kw = dict(bin_w=64, max_candidates=cfg.max_candidates,
              min_hits=cfg.min_block_hits, alpha=cfg.alpha, beta=cfg.beta)
    ids = list(range(len(reads)))
    native = find_candidates_batch(idx, reads, ids, **kw)

    import aligngraph2_tpu.ops.seedextend as se
    monkeypatch.setattr("aligngraph2_tpu.ops.native.seed_hits_native",
                        lambda *a, **k: None)
    monkeypatch.setattr("aligngraph2_tpu.ops.native.seed_bin_native",
                        lambda *a, **k: None)
    numpy_path = find_candidates_batch(idx, reads, ids, **kw)
    assert _cand_map_fingerprint(native) == _cand_map_fingerprint(numpy_path)


@pytest.mark.parametrize("k,min_hits,bin_w", [(11, 3, 64), (14, 2, 64),
                                              (15, 2, 128), (16, 2, 96)])
def test_native_bin_matches_numpy(k, min_hits, bin_w, monkeypatch):
    """Per-read native binning (ags_bin) == numpy spec, including the
    k>13 prefix-table index path and negative diagonals."""
    ds = make_dataset(seed=7, genome_len=12000, coverage=12,
                      mean_read=1100, read_err=0.05, n_contigs=3)
    reads = SeqDatabase(ds["reads"])
    targets = SeqDatabase(ds["contigs"])
    idx = SeedIndex(targets, k)
    if k > 13:
        assert idx.prefix_off is not None and idx.dense_cnt is None
    kw = dict(bin_w=bin_w, max_candidates=8, min_hits=min_hits,
              alpha=0.5, beta=2.0, prune=0.81)
    ids = list(range(len(reads)))
    native = find_candidates_batch(idx, reads, ids, **kw)
    n_cands = sum(len(v) for v in native.values())
    assert n_cands > 0
    monkeypatch.setattr("aligngraph2_tpu.ops.native.seed_bin_native",
                        lambda *a, **kk: None)
    numpy_path = find_candidates_batch(idx, reads, ids, **kw)
    assert _cand_map_fingerprint(native) == _cand_map_fingerprint(numpy_path)


def test_native_index_sort_matches_argsort():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 1 << 30, size=50_000).astype(np.int64)
    pos = np.arange(50_000, dtype=np.int64)
    order = np.argsort(codes, kind="stable")
    want_c, want_p = codes[order], pos[order]
    from aligngraph2_tpu.ops.native import sort_codes_native
    c2, p2 = codes.copy(), pos.copy()
    assert sort_codes_native(c2, p2)
    np.testing.assert_array_equal(c2, want_c)
    np.testing.assert_array_equal(p2, want_p)


def test_effective_seed_k_scaling():
    from aligngraph2_tpu.ops.seedextend import effective_seed_k

    class _DB:
        def __init__(self, total):
            self.lengths = np.array([total], np.int64)

        def __len__(self):
            return 1

    cfg = AlignerConfig()          # seed_k=13, auto on, max 15
    assert effective_seed_k(cfg, _DB(5_000_000)) == 13   # bench scale
    assert effective_seed_k(cfg, _DB(50_000_000)) == 15
    assert effective_seed_k(cfg, _DB(120_000_000)) == 15  # capped
    cfg_off = AlignerConfig(seed_k_auto=False)
    assert effective_seed_k(cfg_off, _DB(120_000_000)) == 13


def test_native_hits_raw():
    ds = make_dataset(seed=3, genome_len=4000, coverage=6, mean_read=700)
    reads = SeqDatabase(ds["reads"])
    refs = SeqDatabase(ds["similar"])
    idx = SeedIndex(refs, 11)
    bases = np.concatenate([reads.get_codes(i) for i in range(3)])
    starts = np.zeros(4, np.int64)
    np.cumsum([len(reads.get_codes(i)) for i in range(3)], out=starts[1:])
    got = seed_hits_native(idx, bases, starts)
    assert got is not None
    sid, qpos, tpos = got
    assert len(sid) == len(qpos) == len(tpos) > 0
    # every reported hit must be a true k-mer match
    from aligngraph2_tpu.io.seqdb import revcomp_codes
    from aligngraph2_tpu.ops.kmer import kmer_codes_np
    k = idx.k
    for i in range(0, len(sid), max(len(sid) // 50, 1)):
        rid, strand = int(sid[i]) // 2, int(sid[i]) % 2
        codes = reads.get_codes(rid)
        if strand == 1:
            codes = revcomp_codes(codes)
        qk = kmer_codes_np(codes, k)[int(qpos[i])]
        ti = np.searchsorted(idx.db.offsets, int(tpos[i]),
                             side="right") - 1
        tl = int(tpos[i]) - int(idx.db.offsets[ti])
        tk = kmer_codes_np(idx.db.get_codes(int(ti)), k)[tl]
        assert qk == tk


def test_native_solid_set_matches_numpy():
    from aligngraph2_tpu.ops.kmer import count_reads_sorted, solid_set
    from aligngraph2_tpu.ops.native import solid_set_native
    for seed, k, thr in [(1, 8, 0.2), (2, 10, 0.05), (3, 6, 0.2)]:
        ds = make_dataset(seed=seed, genome_len=5000, coverage=12,
                          mean_read=800, read_err=0.04)
        reads = SeqDatabase(ds["reads"])
        spec = count_reads_sorted(reads, k).solid_codes(thr)
        got = solid_set(reads, k, thr)
        np.testing.assert_array_equal(got, spec), (seed, k)
        # the native call itself must have been available here
        starts = reads.offsets.astype(np.int64)
        assert solid_set_native(reads.codes, starts, k, thr) is not None


def test_native_solid_set_degenerate_cutoff():
    """Tiny dataset vs big table: cutoff 0 -> the full 4^k universe,
    matching the reference's regime (kmer_counter.cpp:58-77)."""
    from aligngraph2_tpu.ops.kmer import count_reads_sorted, solid_set
    ds = make_dataset(seed=4, genome_len=400, coverage=3, mean_read=200)
    reads = SeqDatabase(ds["reads"])
    k = 12
    spec = count_reads_sorted(reads, k).solid_codes(0.2)
    got = solid_set(reads, k, 0.2)
    np.testing.assert_array_equal(got, spec)
    assert len(got) == 4 ** 12
