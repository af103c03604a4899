"""Native traversal core (native/traverse.cpp) must produce step-for-step
identical travels to the pure-Python path (traverse/walk.py), which is the
specification and is golden-tested against the reference pagraph binary
(tests/test_golden_pagraph.py)."""

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner, align_chunked
from aligngraph2_tpu.config import AlignerConfig, GraphConfig
from aligngraph2_tpu.graph.pagraph import PAGraph
from aligngraph2_tpu.graph.processor import GroupSpec, PositionProcessor
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.ops.kmer import count_reads
from aligngraph2_tpu.traverse.native import get_lib
from aligngraph2_tpu.traverse.walk import (TravelState, travel_sequence,
                                           travel_sequence_py)
from tests.synth import make_dataset

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _build_state(seed, genome_len=6000, n_contigs=2, gap=350):
    ds = make_dataset(seed=seed, genome_len=genome_len, coverage=14,
                      mean_read=1000, read_err=0.02, n_contigs=n_contigs,
                      contig_gap=gap)
    reads = SeqDatabase(ds["reads"])
    ctgs = SeqDatabase(ds["contigs"])
    refs = SeqDatabase(ds["similar"])
    acfg = AlignerConfig(band_width=128, min_aln_len=150, min_block_hits=3,
                         seed_k=11, delta=0.5, chunk_len=1500)
    r2c = LongReadAligner(ctgs, acfg).align_reads(reads)
    r2r = LongReadAligner(refs, acfg).align_reads(reads)
    c2r = align_chunked(refs, ctgs, acfg)
    gcfg = GraphConfig(k=12, epsilon=10, min_len=50)
    counts = count_reads(reads, gcfg.k).counts()
    solid = np.flatnonzero(counts >= 2).astype(np.int64)
    graph = PAGraph(solid, gcfg.k)
    group = GroupSpec("ref0", [(f"ctg{i}", True) for i in range(n_contigs)])
    pp = PositionProcessor(graph, reads, ctgs, refs, r2c, r2r, c2r, group,
                           gcfg)
    pp.pre_process()
    pp.process(log=lambda *a: None)
    return TravelState(graph=graph, ctgs=ctgs, refs=refs,
                       ctg_mapper=pp.ctg_mapper, ref_mapper=pp.ref_mapper,
                       deviation=gcfg.epsilon * 2,
                       error_rate=gcfg.error_rate,
                       start_split=gcfg.start_split, min_len=gcfg.min_len)


@pytest.mark.parametrize("seed", [9, 33])
def test_native_travel_matches_python(seed):
    st = _build_state(seed)
    for cid in range(len(st.ctgs)):
        for fwd in (True, False):
            py = travel_sequence_py(st, cid, fwd)
            nat = travel_sequence(st, cid, fwd, use_native=True)
            assert nat == py, (
                f"travel mismatch ctg={cid} fwd={fwd}: "
                f"py {len(py)} steps vs native {len(nat)}")


def test_native_travel_repeatable():
    st = _build_state(9)
    t1 = travel_sequence(st, 0, True)
    t2 = travel_sequence(st, 0, True)
    assert t1 == t2 and len(t1) > 10
