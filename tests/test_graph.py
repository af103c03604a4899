import numpy as np
import pytest

from aligngraph2_tpu.config import AlignerConfig, GraphConfig
from aligngraph2_tpu.graph.pagraph import (PAGraph, Grade, check_position,
                                           is_pos_similar, is_edge_similar)
from aligngraph2_tpu.graph.processor import (PositionProcessor, GroupSpec)
from aligngraph2_tpu.io.seqdb import SeqDatabase, encode_seq
from aligngraph2_tpu.ops.kmer import kmer_codes_np
from aligngraph2_tpu.align.aligner import LongReadAligner, align_chunked
from tests.synth import make_dataset


def U(*xs):
    return np.array(xs, dtype=np.uint64)


class TestGrading:
    def test_is_pos_similar(self):
        s1, s2 = is_pos_similar(U(100), U(200), U(105), U(260), 10)
        assert bool(s1[0]) and not bool(s2[0])
        # zero never similar to nonzero
        s1, s2 = is_pos_similar(U(0), U(200), U(5), U(205), 10)
        assert not bool(s1[0]) and bool(s2[0])

    def test_is_edge_similar_wraparound(self):
        # rhs < lhs: uint32 wrap must make the ratio test fail
        s1, _ = is_edge_similar(U(1000), U(0), U(900), U(0), 50, 10, 0.15)
        assert not bool(s1[0])
        # proper advance within errorRate
        s1, _ = is_edge_similar(U(1000), U(0), U(1052), U(0), 50, 10, 0.15)
        assert bool(s1[0])

    def test_check_position_amazing(self):
        g = check_position(U(100), U(500), U(150), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Amazing

    def test_check_position_excellent_ctg_only(self):
        # ctg advances consistently, ref does not
        g = check_position(U(100), U(500), U(150), U(900), 50, 20, 0.15)
        assert g[0] == Grade.Excellent

    def test_check_position_skip_ref_only(self):
        g = check_position(U(100), U(500), U(400), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Skip

    def test_check_position_zero_branches(self):
        # pos1.ctg == 0, pos2.ctg != 0, ref consistent -> Excellent
        g = check_position(U(0), U(500), U(80), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Excellent
        # both ctg == 0, ref consistent -> Good
        g = check_position(U(0), U(500), U(0), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Good
        # pos1.ctg != 0, pos2.ctg == 0, ref consistent -> Skip
        g = check_position(U(100), U(500), U(0), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Skip
        # ref branch: ctg consistent, pos2.ref == 0 -> Good
        g = check_position(U(100), U(500), U(150), U(0), 50, 20, 0.15)
        assert g[0] == Grade.Good
        # ctg consistent, pos1.ref == 0, pos2.ref != 0 -> Excellent
        g = check_position(U(100), U(0), U(150), U(550), 50, 20, 0.15)
        assert g[0] == Grade.Excellent

    def test_check_position_oops(self):
        g = check_position(U(100), U(500), U(5000), U(9000), 50, 20, 0.15)
        assert g[0] == Grade.Oops


class TestGraphCore:
    def make_graph(self):
        codes = np.array([5, 17, 3, 17, 99], dtype=np.int64)
        return PAGraph(codes, k=4)

    def test_node_table_sorted_unique(self):
        g = self.make_graph()
        assert list(g.node_codes) == [3, 5, 17, 99]
        nodes, found = g.node_of_codes(np.array([17, 4, 99]))
        assert list(found) == [True, False, True]
        assert nodes[0] == 2 and nodes[2] == 3

    def test_merge_positions_chain_cluster(self):
        g = self.make_graph()
        # node 0 gets positions (100,200), (105,205), (300,400) -> 2 clusters
        g.append_positions(*(np.array([0, 0, 0]),
                              np.array([105, 100, 300]),
                              np.array([205, 200, 400])))
        removed = g.merge_positions(epsilon=10)
        assert removed == 1
        g.finalize()
        sl = g.node_positions(0)
        assert sl.stop - sl.start == 2
        assert list(g.pos_ctg[sl]) == [100, 300]
        assert list(g.pos_count[sl]) == [2, 1]

    def test_zero_coord_clusters_with_zero_only(self):
        g = self.make_graph()
        g.append_positions(*(np.array([0, 0]), np.array([0, 0]),
                              np.array([200, 205])))
        removed = g.merge_positions(epsilon=10)
        assert removed == 1  # (0,200) and (0,205): ctg both zero, ref близко
        g2 = self.make_graph()
        g2.append_positions(*(np.array([0, 0]), np.array([0, 100]),
                               np.array([200, 205])))
        assert g2.merge_positions(epsilon=10) == 0  # ctg 0 vs 100: no merge

    def test_merge_edges_dedup(self):
        g = self.make_graph()
        g.append_edges(*(np.array([0, 0, 1]), np.array([1, 1, 2]),
                               np.array([3, 3, 5])))
        assert g.merge_edges() == 1
        g.finalize()
        sl = g.node_edges(0)
        assert sl.stop - sl.start == 1

    def test_successors_grading(self):
        g = self.make_graph()
        g.append_positions(*(np.array([0, 1, 1]),
                              np.array([100, 150, 5000]),
                              np.array([500, 550, 9000])))
        g.append_edges(*(np.array([0]), np.array([1]), np.array([50])))
        g.merge_edges()
        g.merge_positions(10)
        g.finalize()
        root = g.node_positions(0).start
        idx, step = g.successors(root, root, deviation=20, error_rate=0.15)
        assert len(idx) == 1  # only the consistent (150,550) position
        assert g.pos_ctg[idx[0]] == 150
        # used flag removes it
        g.used[idx[0]] = True
        idx2, _ = g.successors(root, root, deviation=20, error_rate=0.15)
        assert len(idx2) == 0


@pytest.fixture(scope="module")
def pipeline_state():
    """Aligned synthetic dataset + built graph, shared across tests."""
    ds = make_dataset(seed=5, genome_len=6000, coverage=14, mean_read=1000,
                      read_err=0.03, n_contigs=2, contig_gap=400)
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
    gcfg = GraphConfig(k=12)
    # solid set: every k-mer appearing in >= 2 reads
    from aligngraph2_tpu.ops.kmer import count_reads
    counter = count_reads(reads, gcfg.k)
    counts = counter.counts()
    solid = np.flatnonzero(counts >= 2).astype(np.int64)
    graph = PAGraph(solid, gcfg.k)
    group = GroupSpec(ref_name="ref0",
                      contigs=[("ctg0", True), ("ctg1", True)])
    pp = PositionProcessor(graph, reads, ctgs, refs, r2c, r2r, c2r, group,
                           gcfg)
    pp.pre_process()
    pp.process(log=lambda *a: None)
    return {"ds": ds, "reads": reads, "ctgs": ctgs, "refs": refs,
            "graph": graph, "pp": pp, "gcfg": gcfg,
            "r2c": r2c, "r2r": r2r, "c2r": c2r}


class TestProcessor:
    def test_graph_populated(self, pipeline_state):
        g = pipeline_state["graph"]
        assert g.total_positions() > 1000
        assert len(g.edge_from) > 500
        assert pipeline_state["pp"].stats["merge_pos_1"] > 0

    def test_positions_lie_in_mapper_spans(self, pipeline_state):
        g = pipeline_state["graph"]
        pp = pipeline_state["pp"]
        nz = g.pos_ctg[g.pos_ctg != 0].astype(np.int64)
        idx, pos = pp.ctg_mapper.single_to_dual(nz)
        # every nonzero ctg coordinate decodes to a real contig position
        lens = pipeline_state["ctgs"].lengths
        assert np.all(np.abs(idx) >= 1) and np.all(np.abs(idx) <= len(lens))
        assert np.all(pos >= 0)
        assert np.all(pos < lens[np.abs(idx) - 1] + 1)
        nzr = g.pos_ref[g.pos_ref != 0].astype(np.int64)
        ridx, rpos = pp.ref_mapper.single_to_dual(nzr)
        assert np.all(np.abs(ridx) == 1)

    def test_contig_anchored_nodes_found(self, pipeline_state):
        """findAll over a contig string lands on nodes whose ctg positions
        match the query position (the traversal's seed search)."""
        g = pipeline_state["graph"]
        pp = pipeline_state["pp"]
        ctgs = pipeline_state["ctgs"]
        kmers = kmer_codes_np(ctgs.get_codes(0), g.k)
        nodes, qpos = g.find_all(kmers)
        assert len(nodes) > len(kmers) * 0.5
        # check anchoring: some node position decodes to contig 1 near qpos
        hits = 0
        for nd, qp in zip(nodes[:200], qpos[:200]):
            sl = g.node_positions(nd)
            if sl.start == sl.stop:
                continue
            cidx, cpos = pp.ctg_mapper.single_to_dual(
                g.pos_ctg[sl].astype(np.int64))
            if np.any((cidx == 1) & (np.abs(cpos - qp) <= 10)):
                hits += 1
        assert hits > 50
