import numpy as np

from aligngraph2_tpu.io import SeqDatabase, encode_seq
from aligngraph2_tpu.ops.kmer import (
    KmerCounter, code_to_str, count_reads, kmer_codes_batch, kmer_codes_np,
    read_solid_set, revcomp_code_np, solid_min_abundance, write_solid_set,
)


def ref_kmer_codes(seq: str, k: int):
    """Literal transcription of the reference semantics for the oracle:
    rolling big-endian 2-bit code (KmerHelper::kmer2Code)."""
    enc = {"A": 0, "C": 1, "G": 2, "T": 3}
    out = []
    code = 0
    mask = (1 << (2 * k)) - 1
    for i, ch in enumerate(seq):
        code = ((code << 2) | enc.get(ch.upper(), 0)) & mask
        if i >= k - 1:
            out.append(code)
    return out


def test_kmer_codes_np_matches_oracle():
    seq = "ACGTTGCAACGGT"
    for k in (3, 5, 8):
        got = list(kmer_codes_np(encode_seq(seq), k))
        assert got == ref_kmer_codes(seq, k)


def test_kmer_codes_short_seq():
    assert len(kmer_codes_np(encode_seq("ACG"), 5)) == 0


def test_code_to_str_roundtrip():
    seq = "ACGTACG"
    codes = kmer_codes_np(encode_seq(seq), 7)
    assert code_to_str(int(codes[0]), 7) == seq


def test_revcomp_code():
    k = 5
    codes = kmer_codes_np(encode_seq("AACGT"), k)
    rc = revcomp_code_np(codes, k)
    assert code_to_str(int(rc[0]), k) == "ACGTT"


def test_kmer_codes_batch_matches_np():
    db = SeqDatabase([("a", "ACGTTGCA"), ("b", "GGG")])
    batch, lens = db.padded_batch(np.array([0, 1]), 8)
    k = 3
    codes, valid = kmer_codes_batch(batch, lens, k)
    got_a = list(np.asarray(codes)[0][np.asarray(valid)[0]])
    got_b = list(np.asarray(codes)[1][np.asarray(valid)[1]])
    assert got_a == list(kmer_codes_np(encode_seq("ACGTTGCA"), k))
    assert got_b == list(kmer_codes_np(encode_seq("GGG"), k))


def test_counter_counts():
    k = 3
    db = SeqDatabase([("a", "AAAAA"), ("b", "ACGACG")])
    counter = count_reads(db, k, batch_reads=1)
    counts = counter.counts()
    # AAAAA has 3x AAA; ACGACG has 2x ACG, 1x CGA, 1x GAC
    aaa = 0
    acg = (0 << 4) | (1 << 2) | 2
    assert counts[aaa] == 3
    assert counts[acg] == 2
    assert counts.sum() == 3 + 4


def test_solid_min_abundance_rule():
    # table of 100 entries: 90 zeros, 8 ones, 2 tens. threshold 0.05:
    # after abundance 0: surviving = 10% > 5%; after 1: surviving 2% <= 5%
    counts = np.array([0] * 90 + [1] * 8 + [10] * 2)
    assert solid_min_abundance(counts, 0.05) == 1
    # threshold 0.2: after 0 surviving 10% <= 20% -> minAbundance 0
    assert solid_min_abundance(counts, 0.2) == 0


def test_solid_codes_and_file_roundtrip(tmp_path):
    k = 3
    db = SeqDatabase([("a", "AAAAAAAA"), ("b", "ACGACGACG")])
    counter = count_reads(db, k)
    solid = counter.solid_codes(threshold=0.05)
    # AAA (6 hits) and ACG/CGA/GAC (3,2,2) dominate; with threshold 0.05 the
    # cutoff keeps <= 3.2 table entries
    assert len(solid) <= 4 and len(solid) >= 1
    p = str(tmp_path / "solid.bin")
    write_solid_set(p, k, solid)
    k2, back = read_solid_set(p)
    assert k2 == k
    np.testing.assert_array_equal(back, solid)


def test_counter_matches_host_count(rng):
    from tests.synth import random_genome
    k = 4
    seqs = [(str(i), random_genome(rng, int(rng.integers(50, 200))))
            for i in range(20)]
    db = SeqDatabase(seqs)
    counter = count_reads(db, k, batch_reads=7)
    got = counter.counts()
    want = np.zeros(4 ** k, dtype=np.int64)
    for _, s in seqs:
        for c in kmer_codes_np(encode_seq(s), k):
            want[c] += 1
    np.testing.assert_array_equal(got, want)


def test_sorted_counter_matches_dense(rng):
    from tests.synth import random_genome
    from aligngraph2_tpu.ops.kmer import count_reads_sorted
    k = 5
    seqs = [(str(i), random_genome(rng, int(rng.integers(40, 300))))
            for i in range(25)]
    db = SeqDatabase(seqs)
    dense = count_reads(db, k)
    sparse = count_reads_sorted(db, k, chunk_bases=1000)  # force merges
    dc = dense.counts()
    want_codes = np.flatnonzero(dc)
    np.testing.assert_array_equal(sparse.codes, want_codes)
    np.testing.assert_array_equal(sparse.counts_arr, dc[want_codes])
    for thr in (0.01, 0.05, 0.2, 0.9):
        np.testing.assert_array_equal(sparse.solid_codes(thr),
                                      dense.solid_codes(thr))
