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


def test_threaded_travel_bit_identical_to_serial():
    """The <= top_k parallel seed walks (per-thread levels) and the
    threaded per-contig travel loop must be bit-identical to serial
    (walks are independent; selection consumes results in index order)."""
    import dataclasses
    from aligngraph2_tpu.traverse.assembly import assemble_group
    st1 = _build_state(9)            # threads=0 -> hardware auto
    st1 = dataclasses.replace(st1, threads=8)
    st2 = _build_state(9)
    st2 = dataclasses.replace(st2, threads=1)
    for cid in range(len(st1.ctgs)):
        for fwd in (True, False):
            t_par = travel_sequence(st1, cid, fwd)
            t_ser = travel_sequence(st2, cid, fwd)
            assert t_par == t_ser, f"ctg={cid} fwd={fwd}"
    # whole-group assembly equal too (threaded travel loop)
    group = [(f"ctg{i}", True) for i in range(len(st1.ctgs))]
    r_par = assemble_group(st1, group, None, "p_")
    r_ser = assemble_group(st2, group, None, "p_")
    assert r_par.success == r_ser.success
    assert [c["sequence"] for c in r_par.connections] \
        == [c["sequence"] for c in r_ser.connections]


def test_concurrent_agt_travel_reentrant():
    """agt_travel must be safe to call from many Python threads at once
    (workspace pool): same results as serial, no crashes."""
    from concurrent.futures import ThreadPoolExecutor
    st = _build_state(33)
    jobs = [(cid, fwd) for cid in range(len(st.ctgs))
            for fwd in (True, False)] * 3
    serial = {j: travel_sequence(st, *j) for j in set(jobs)}
    with ThreadPoolExecutor(8) as ex:
        results = list(ex.map(lambda j: (j, travel_sequence(st, *j)), jobs))
    for j, tr in results:
        assert tr == serial[j], j
