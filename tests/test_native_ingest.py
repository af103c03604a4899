"""Native ingest core (native/ingest.cpp) parity vs the Python pass.

The Python _run_pass/_emit_* path in graph/processor.py is the
specification; the threaded C++ core must produce the exact same final
graph (positions, counts, edges, CSR offsets) after the sort-based merge
phases, for any thread count.
"""

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner, align_chunked
from aligngraph2_tpu.config import AlignerConfig, GraphConfig
from aligngraph2_tpu.graph.ingest_native import get_lib
from aligngraph2_tpu.graph.pagraph import PAGraph
from aligngraph2_tpu.graph.processor import GroupSpec, PositionProcessor
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.ops.kmer import count_reads
from tests.synth import make_dataset, revcomp

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native ingest core unavailable")


@pytest.fixture(scope="module")
def state():
    ds = make_dataset(seed=11, genome_len=6000, coverage=14, mean_read=1000,
                      read_err=0.03, n_contigs=2, contig_gap=400)
    # flip contig 1 so the group carries a reverse-oriented member
    # (exercises the fwd_c=False replay: strand flip, reversed column walk,
    # t0 = clen - re)
    contigs = list(ds["contigs"])
    contigs[1] = (contigs[1][0], revcomp(contigs[1][1]))
    reads = SeqDatabase(ds["reads"])
    ctgs = SeqDatabase(contigs)
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
    counts = count_reads(reads, gcfg.k).counts()
    solid = np.flatnonzero(counts >= 2).astype(np.int64)
    group = GroupSpec(ref_name="ref0",
                      contigs=[("ctg0", True), ("ctg1", False)])
    return dict(reads=reads, ctgs=ctgs, refs=refs, r2c=r2c, r2r=r2r,
                c2r=c2r, gcfg=gcfg, solid=solid, group=group)


def _build(state, use_native: bool, threads: int = 1):
    graph = PAGraph(state["solid"], state["gcfg"].k)
    pp = PositionProcessor(graph, state["reads"], state["ctgs"],
                           state["refs"], state["r2c"], state["r2r"],
                           state["c2r"], state["group"], state["gcfg"])
    pp.pre_process()
    pp.process(log=lambda *a: None, threads=threads, use_native=use_native)
    return graph, pp


def _assert_graph_equal(g1, g2):
    np.testing.assert_array_equal(g1.pos_node, g2.pos_node)
    np.testing.assert_array_equal(g1.pos_ctg, g2.pos_ctg)
    np.testing.assert_array_equal(g1.pos_ref, g2.pos_ref)
    np.testing.assert_array_equal(g1.pos_count, g2.pos_count)
    np.testing.assert_array_equal(g1.pos_start, g2.pos_start)
    np.testing.assert_array_equal(g1.edge_from, g2.edge_from)
    np.testing.assert_array_equal(g1.edge_to, g2.edge_to)
    np.testing.assert_array_equal(g1.edge_step, g2.edge_step)
    np.testing.assert_array_equal(g1.edge_start, g2.edge_start)


def test_native_matches_python_single_thread(state):
    g_py, pp_py = _build(state, use_native=False)
    g_nat, pp_nat = _build(state, use_native=True, threads=1)
    assert len(g_nat.pos_node) > 0 and len(g_nat.edge_from) > 0
    _assert_graph_equal(g_py, g_nat)
    for key in ("merge_edge_1", "total_pos_1", "merge_pos_1",
                "merge_edge_2", "total_pos_2", "merge_pos_2"):
        assert pp_py.stats[key] == pp_nat.stats[key], key


def test_radix_lexsort_matches_numpy():
    from aligngraph2_tpu.graph.ingest_native import lexsort3_native
    rng = np.random.default_rng(3)
    for n, hi in ((0, 10), (1, 1), (1000, 4), (200000, 1 << 40)):
        k1 = rng.integers(0, max(hi, 1), n).astype(np.int64)
        k2 = rng.integers(0, max(hi // 2, 1), n).astype(np.int64)
        k3 = rng.integers(0, 7, n).astype(np.int64)
        got = lexsort3_native(k1, k2, k3)
        assert got is not None
        want = np.lexsort((k3, k2, k1))
        np.testing.assert_array_equal(got, want)


def test_native_merge_positions_matches_numpy(monkeypatch):
    """Fuzz the single-pass native epsilon merge against the numpy spec
    path (zeros, duplicates, epsilon-boundary values, count saturation)."""
    from aligngraph2_tpu.graph import ingest_native
    rng = np.random.default_rng(9)
    for trial in range(6):
        n_nodes = int(rng.integers(1, 40))
        n = int(rng.integers(0, 4000))
        eps = int(rng.integers(0, 12))
        node = rng.integers(0, n_nodes, n).astype(np.int64)
        ctg = rng.choice([0, 1, 5, 9, 10, 11, 100, 2**33], n).astype(
            np.int64)
        ref = rng.choice([0, 2, 7, 8, 9, 50, 2**34], n).astype(np.int64)
        cnt = rng.integers(1, 0xFFFF, n).astype(np.int64)

        def build(use_native):
            g = PAGraph(np.arange(n_nodes), 5)
            g.append_positions(node, ctg, ref)
            g._flush()
            g.pos_count = cnt.copy()
            if not use_native:
                monkeypatch.setattr(ingest_native,
                                    "merge_positions_native",
                                    lambda *a, **k: None)
            removed = g.merge_positions(eps)
            monkeypatch.undo()
            return g, removed

        g_nat, rem_nat = build(True)
        g_py, rem_py = build(False)
        assert rem_nat == rem_py, trial
        np.testing.assert_array_equal(g_nat.pos_node, g_py.pos_node)
        np.testing.assert_array_equal(g_nat.pos_ctg, g_py.pos_ctg)
        np.testing.assert_array_equal(g_nat.pos_ref, g_py.pos_ref)
        np.testing.assert_array_equal(g_nat.pos_count, g_py.pos_count)


def test_radix_lexsort_rejects_negative():
    from aligngraph2_tpu.graph.ingest_native import lexsort3_native
    k = np.array([3, -1, 2], np.int64)
    z = np.zeros(3, np.int64)
    assert lexsort3_native(k, z, z) is None


def test_native_thread_count_invariant(state):
    g1, _ = _build(state, use_native=True, threads=1)
    g4, _ = _build(state, use_native=True, threads=4)
    _assert_graph_equal(g1, g4)
