"""Traversal + assembly tests over a built synthetic graph.

The key scenario: two contigs covering a genome with a gap between them;
reads span the gap, so the travel from ctg0 should extend rightward and
leap into ctg1, and assembly should emit one connected sequence that
reconstructs (most of) the true genome region.
"""

import numpy as np
import pytest

from aligngraph2_tpu.config import AlignerConfig, GraphConfig
from aligngraph2_tpu.graph.pagraph import PAGraph
from aligngraph2_tpu.graph.processor import PositionProcessor, GroupSpec
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.align.aligner import LongReadAligner, align_chunked
from aligngraph2_tpu.traverse.walk import (TravelState, travel_sequence,
                                           seq_size, seq_to_string,
                                           append_seq, edit_distance)
from aligngraph2_tpu.traverse.assembly import assemble_group
from tests.synth import make_dataset


@pytest.fixture(scope="module")
def built():
    ds = make_dataset(seed=9, genome_len=6000, coverage=14, mean_read=1000,
                      read_err=0.02, n_contigs=2, contig_gap=350)
    reads = SeqDatabase(ds["reads"])
    ctgs = SeqDatabase(ds["contigs"])
    refs = SeqDatabase(ds["similar"])
    acfg = AlignerConfig(band_width=128, min_aln_len=150, min_block_hits=3,
                         seed_k=11, delta=0.5)
    r2c = LongReadAligner(ctgs, acfg).align_reads(reads)
    r2r = LongReadAligner(refs, acfg).align_reads(reads)
    c2r = align_chunked(refs, ctgs,
                        AlignerConfig(band_width=128, min_aln_len=150,
                                      min_block_hits=3, seed_k=11,
                                      delta=0.5, chunk_len=1500))
    gcfg = GraphConfig(k=12, epsilon=10, min_len=50)
    from aligngraph2_tpu.ops.kmer import count_reads
    counts = count_reads(reads, gcfg.k).counts()
    solid = np.flatnonzero(counts >= 2).astype(np.int64)
    graph = PAGraph(solid, gcfg.k)
    group = GroupSpec("ref0", [("ctg0", True), ("ctg1", True)])
    pp = PositionProcessor(graph, reads, ctgs, refs, r2c, r2r, c2r, group,
                           gcfg)
    pp.pre_process()
    pp.process(log=lambda *a: None)
    st = TravelState(graph=graph, ctgs=ctgs, refs=refs,
                     ctg_mapper=pp.ctg_mapper, ref_mapper=pp.ref_mapper,
                     deviation=gcfg.epsilon * 2,
                     error_rate=gcfg.error_rate,
                     start_split=gcfg.start_split, min_len=gcfg.min_len)
    return {"ds": ds, "st": st, "group": group, "ctgs": ctgs,
            "reads": reads, "refs": refs}


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("acgt", "acgt") == 0


def test_travel_covers_contig(built):
    st = built["st"]
    travel = travel_sequence(st, 0, True)
    assert len(travel) > 10
    ln = seq_size(travel)
    # travel must cover at least startSplit * 0.9 of the contig
    assert ln >= built["ctgs"].size(0) * st.start_split * 0.9
    # positions along the travel with ctg coords on ctg0 must be
    # non-decreasing in the main (monotone walk)
    ctg_pos = []
    for nd, pi, d in travel:
        c = int(st.graph.pos_ctg[pi])
        if c != 0:
            ci, cp = st.ctg_mapper.single_to_dual(c)
            if ci == 1:
                ctg_pos.append(cp)
    assert len(ctg_pos) > 5
    drops = sum(1 for a, b in zip(ctg_pos, ctg_pos[1:]) if b < a - 50)
    assert drops <= len(ctg_pos) * 0.05


def test_travel_string_matches_contig(built):
    """seq_to_string of a travel should closely match the true genome
    region the contig came from."""
    st = built["st"]
    ds = built["ds"]
    travel = travel_sequence(st, 0, True)
    s = seq_to_string(st, travel)
    assert len(s) >= seq_size(travel) * 0.9
    # identity vs the true genome: align the first 500 bases
    from aligngraph2_tpu.ops.banded_dp import numpy_local_align
    from aligngraph2_tpu.io.seqdb import encode_seq
    piece = ds["genome"][ds["pieces"][0][0]:ds["pieces"][0][1]]
    score, _, _ = numpy_local_align(encode_seq(s[:400].upper()),
                                    encode_seq(piece[:600]))
    assert score > 0.8 * 2 * 400  # >=80% of a perfect match score


def test_seq_to_string_matches_spec(built):
    """Vectorized seq_to_string == scalar spec, on the real travel AND
    on synthetic travels exercising long (> k) interpolation steps in
    both ctg and ref coordinate frames."""
    from aligngraph2_tpu.traverse.walk import seq_to_string_spec
    st = built["st"]
    travel = travel_sequence(st, 0, True)
    assert travel
    for cut in (0, 5, len(travel) // 2):
        assert seq_to_string(st, travel, cut) == \
            seq_to_string_spec(st, travel, cut)
    # synthetic: rewrite some dists beyond k to force interpolation
    g = st.graph
    rng = np.random.default_rng(3)
    synth = [list(s) for s in travel[:200]]
    for i in rng.integers(1, len(synth), 12):
        synth[int(i)][2] = int(rng.integers(g.k + 1, 3 * g.k))
    synth = [tuple(s) for s in synth]
    assert seq_to_string(st, synth) == seq_to_string_spec(st, synth)
    # degenerate: empty and single-step travels
    assert seq_to_string(st, []) == seq_to_string_spec(st, [])
    assert seq_to_string(st, travel[:1]) == seq_to_string_spec(
        st, travel[:1])


def test_assembly_emits_and_connects(built, tmp_path):
    st = built["st"]
    res = assemble_group(st, built["group"].contigs, str(tmp_path), "0_")
    # the travels must consume at least one contig (extension or
    # connection); with reads spanning the gap the usual outcome is a
    # 2-contig chain
    assert res.connections, "nothing emitted"
    total = max(c["length"] for c in res.connections)
    assert total > built["ctgs"].size(0) * 1.1
    assert len(res.success) >= 1
    # emitted FASTA exists and parses
    from aligngraph2_tpu.io import read_seqs
    recs = list(read_seqs(res.fastas[0]))
    assert len(recs) == 1 and len(recs[0][1]) == res.connections[0]["length"]


def test_append_seq_overlap_trim(built):
    st = built["st"]
    g = st.graph
    # fabricate: base travel ending at ctg flat position X; tail starting
    # at smaller position should pop overlapping part
    travel = travel_sequence(st, 0, True)
    if len(travel) < 8:
        pytest.skip("travel too short")
    base = list(travel[:6])
    tail = list(travel[3:8])
    base_copy = list(base)
    d = append_seq(st, base_copy, tail)
    # the head of tail has ctg pos <= base[5]'s, so overlap was popped:
    assert base_copy[-len(tail):] == [
        (t[0], t[1], t[2]) for t in tail[1:]] or len(base_copy) >= len(tail)
    assert isinstance(d, int)
