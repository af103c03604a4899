import numpy as np
import pytest

from aligngraph2_tpu.align.records import Alignment, AlignmentSet
from aligngraph2_tpu.config import AlignerConfig, ConsensusConfig
from aligngraph2_tpu.consensus.poa import AlnGraph, normalize_gaps
from aligngraph2_tpu.consensus.window import (consensus_backbone,
                                              slice_into_windows,
                                              weight_alignments)
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.align.aligner import LongReadAligner
from tests.synth import random_genome, mutate, sample_reads


class TestNormalizeGaps:
    def test_mismatch_to_indel(self):
        q, t = normalize_gaps("CAC", "CGC")
        assert (q, t) == ("C-AC", "CG-C")

    def test_push_target_gaps(self):
        q, t = normalize_gaps("CAACAT", "C-A-AT")
        assert (q, t) == ("CAACAT", "CAA--T")

    def test_push_query_gaps(self):
        q, t = normalize_gaps("-C--CGT", "CCGAC-T")
        assert (q, t) == ("CCG--T", "CCGACT")


class TestAlnGraph:
    def test_identity_consensus(self):
        bb = "ACGTACGT"
        g = AlnGraph(bb)
        for _ in range(3):
            g.add_aln(1, bb, bb, 1)
        g.merge_nodes()
        assert g.consensus() == bb

    def test_substitution_majority(self):
        bb = "ACGTACGT"
        variant = "ACGAACGT"  # T->A at pos 3
        g = AlnGraph(bb)
        for _ in range(5):
            q, t = normalize_gaps(variant, bb)
            g.add_aln(1, q, t, 1)
        g.merge_nodes()
        assert g.consensus() == variant

    def test_insertion_majority(self):
        bb = "ACGTACGT"
        g = AlnGraph(bb)
        # reads agree on an inserted G after position 4
        q, t = "ACGTGACGT", "ACGT-ACGT"
        for _ in range(5):
            g.add_aln(1, q, t, 1)
        g.merge_nodes()
        assert g.consensus() == "ACGTGACGT"

    def test_deletion_majority(self):
        bb = "ACGTACGT"
        q, t = "ACG-ACGT", "ACGTACGT"
        g = AlnGraph(bb)
        for _ in range(5):
            g.add_aln(1, q, t, 1)
        g.merge_nodes()
        assert g.consensus() == "ACGACGT"

    def test_weighted_majority(self):
        bb = "ACGTACGT"
        var = "ACGAACGT"
        g = AlnGraph(bb)
        q1, t1 = normalize_gaps(var, bb)
        g.add_aln(1, q1, t1, 10)   # heavy support for variant
        g.add_aln(1, bb, bb, 2)
        g.merge_nodes()
        assert g.consensus() == var


class TestWindowing:
    def make_aln(self, rb, re, qstr, tstr, score=100):
        return Alignment(query_name="r", ref_name="b", forward=True,
                         score=score, qb=0, qe=len(qstr.replace("-", "")),
                         qsize=len(qstr.replace("-", "")), rb=rb, re=re,
                         rsize=1000, qstr=qstr, tstr=tstr)

    def test_slice_single_window(self):
        alns = AlignmentSet([self.make_aln(5, 13, "ACGTACGT", "ACGTACGT")])
        parts = slice_into_windows(alns, 100, 50)
        assert len(parts) == 2
        assert len(parts[0]) == 1 and len(parts[1]) == 0
        w = parts[0][0]
        assert w.start == 6  # 1-based
        assert w.qstr == "ACGTACGT"

    def test_slice_across_windows(self):
        # alignment spanning the boundary at 50
        tstr = "A" * 20
        alns = AlignmentSet([self.make_aln(40, 60, tstr, tstr)])
        parts = slice_into_windows(alns, 100, 50)
        assert len(parts[0]) == 1 and len(parts[1]) == 1
        assert parts[0][0].tstr == "A" * 10
        assert parts[1][0].tstr == "A" * 10
        assert parts[1][0].start == 1

    def test_slice_gap_aware(self):
        # target has gaps: columns don't advance backbone positions
        qstr = "AAAABBAAAA".replace("B", "C")
        tstr = "AAAA--AAAA"
        alns = AlignmentSet([self.make_aln(46, 54, qstr, tstr)])
        parts = slice_into_windows(alns, 100, 50)
        # backbone positions 46..54 split at 50: first window gets 46-50
        w0, w1 = parts[0][0], parts[1][0]
        assert w0.tstr.replace("-", "") == "AAAA"
        assert w1.tstr.replace("-", "") == "AAAA"

    def test_weights(self):
        part = [self.make_aln(0, 8, "ACGTACGT", "ACGTACGT", score=s)
                for s in (10, 60, 110)]
        ws = weight_alignments(
            [type("W", (), dict(score=a.score))() for a in part], 250)
        assert ws[0] == 1
        assert ws[2] == 250
        assert 100 <= ws[1] <= 150


def test_end_to_end_polish(rng):
    """Reads with errors polished against an error-laden backbone must
    recover the true sequence (the whole point of pa_cns)."""
    true_seq = random_genome(rng, 3000)
    backbone = mutate(rng, true_seq, sub=0.02, ins=0.01, dele=0.01)
    reads = sample_reads(rng, true_seq, coverage=20, mean_len=800,
                         err=0.02, both_strands=True)
    read_db = SeqDatabase(reads)
    bb_db = SeqDatabase([("bb", backbone)])
    acfg = AlignerConfig(band_width=128, min_aln_len=150, min_block_hits=3,
                         seed_k=11, delta=0.5)
    alns = LongReadAligner(bb_db, acfg).align_reads(read_db)
    assert len(alns) > 10
    cfg = ConsensusConfig(window=1000, top_k=100, alpha=50)
    cns = consensus_backbone(backbone, alns, cfg, threads=2)
    assert len(cns) > 0.9 * len(true_seq)
    # consensus should be closer to truth than the backbone was
    from aligngraph2_tpu.ops.banded_dp import numpy_local_align
    from aligngraph2_tpu.io.seqdb import encode_seq
    s_cns, _, _ = numpy_local_align(encode_seq(cns[:800]),
                                    encode_seq(true_seq[:1000]))
    s_bb, _, _ = numpy_local_align(encode_seq(backbone[:800]),
                                   encode_seq(true_seq[:1000]))
    assert s_cns > s_bb
