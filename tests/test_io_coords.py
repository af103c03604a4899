import numpy as np
import pytest

from aligngraph2_tpu.io import (SeqDatabase, encode_seq, decode_seq,
                                revcomp_codes, read_seqs, write_fasta)
from aligngraph2_tpu.io.fasta import write_fastq, detect_format
from aligngraph2_tpu.coords import PositionMapper


def test_encode_decode_roundtrip():
    s = "ACGTACGTNNXX"
    codes = encode_seq(s)
    assert decode_seq(codes) == "ACGTACGTAAAA"  # non-ACGT -> A
    assert list(codes[:4]) == [0, 1, 2, 3]


def test_revcomp():
    codes = encode_seq("AACGT")
    assert decode_seq(revcomp_codes(codes)) == "ACGTT"


def test_fasta_roundtrip(tmp_path):
    recs = [("a", "ACGT" * 50), ("b", "GGCC")]
    p = str(tmp_path / "x.fa")
    write_fasta(p, recs)
    assert detect_format(p) == "fasta"
    back = list(read_seqs(p))
    assert back == recs


def test_fasta_multiline_and_name_token(tmp_path):
    p = tmp_path / "y.fa"
    p.write_text(">name extra comment\nACGT\nACGT\n>z\nTTTT\n")
    back = list(read_seqs(str(p)))
    assert back == [("name", "ACGTACGT"), ("z", "TTTT")]


def test_fastq(tmp_path):
    p = str(tmp_path / "r.fq")
    write_fastq(p, [("1", "ACGT"), ("2", "GG")])
    assert detect_format(p) == "fastq"
    assert list(read_seqs(p)) == [("1", "ACGT"), ("2", "GG")]


def test_seqdb_basics():
    db = SeqDatabase([("a", "ACGT"), ("b", "TTAGG")])
    assert len(db) == 2
    assert db.seq_id("b") == 1
    assert db.seq_id("nope") == db.NOT_FOUND
    assert db.get_str(0) == "ACGT"
    assert db.get_str(0, forward=False) == "ACGT"  # palindrome
    assert db.get_str(1, forward=False) == "CCTAA"
    assert db.base_at(1, 0) == 3  # T
    assert db.base_at(1, 0, forward=False) == 1  # C
    batch, lens = db.padded_batch(np.array([0, 1]), 6)
    assert batch.shape == (2, 6)
    assert list(lens) == [4, 5]
    assert batch[0, 4] == 0 and batch[0, 5] == 0


def test_position_mapper_layout():
    # start[0] = len0; start[1] = start[0] + 3*len0 + max(len0, len1)
    m = PositionMapper(np.array([10, 20]))
    assert m.start[0] == 10
    assert m.start[1] == 10 + 30 + 20
    assert m.extra_start == m.start[1] + 4 * 20
    # sentinel
    assert m.dual_to_single(0, 123) == 0
    assert m.single_to_dual(0) == (0, 0)


def test_position_mapper_roundtrip():
    lens = np.array([10, 20, 7])
    m = PositionMapper(lens)
    for idx in [1, -1, 2, -2, 3, -3]:
        for pos in [0, 3, int(lens[abs(idx) - 1]) - 1]:
            flat = int(m.dual_to_single(idx, pos))
            assert flat != 0
            assert m.single_to_dual(flat) == (idx, pos)


def test_position_mapper_vectorized():
    m = PositionMapper(np.array([100, 50]))
    idx = np.array([1, -1, 2, -2, 0])
    pos = np.array([5, 5, 10, 10, 0])
    flat = m.dual_to_single(idx, pos)
    bidx, bpos = m.single_to_dual(flat)
    np.testing.assert_array_equal(bidx, idx)
    np.testing.assert_array_equal(bpos, pos)


def test_guard_gaps_separate_spans():
    # forward and reverse spans of the same sequence never collide, and
    # consecutive sequences are separated by at least the larger length
    m = PositionMapper(np.array([100, 50]))
    f_end = m.dual_to_single(1, 99)
    r_start = m.dual_to_single(-1, 0)
    assert r_start - f_end > 100  # guard gap
    assert m.dual_to_single(2, 0) - m.dual_to_single(-1, 49) > 0


def test_seqdb_subset_matches_reconstruction():
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    db = SeqDatabase([("a", "ACGTACG"), ("b", "GGGG"), ("c", "TTACGTAC"),
                      ("d", "C")])
    sub = db.subset([2, 0])
    assert sub.names == ["c", "a"]
    assert sub.get_str(0) == "TTACGTAC" and sub.get_str(1) == "ACGTACG"
    byname = db.subset_by_names({"b", "d"})
    assert byname.names == ["b", "d"]  # database id order preserved
    assert byname.get_str(0) == "GGGG" and byname.get_str(1) == "C"
    assert byname.seq_id("d") == 1
