"""Structural golden test: reference ``pagraph`` vs our graph+traversal
on identical inputs.

The reference's graph ingest is thread-racy (position insertion order
varies run to run), so bit-exact travel parity is not well-defined even
for the reference against itself.  Compared instead:
  * the set of consumed contigs (contig.txt),
  * whether an assembled chain was emitted,
  * assembled length within 1% of the reference's (measured: exactly
    equal across seeds 44-48; the tolerance only covers the reference's
    own thread-raciness), over three seeds.
"""

import os
import subprocess

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner, align_chunked
from aligngraph2_tpu.config import AlignerConfig, GraphConfig
from aligngraph2_tpu.graph.pagraph import PAGraph
from aligngraph2_tpu.graph.processor import GroupSpec, PositionProcessor
from aligngraph2_tpu.io import read_seqs
from aligngraph2_tpu.io.fasta import write_fasta, write_fastq
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.ops.kmer import count_reads, write_solid_set
from aligngraph2_tpu.traverse.assembly import assemble_group
from aligngraph2_tpu.traverse.walk import TravelState
from tests.synth import make_dataset

REF_BUILD = "/tmp/refbuild"
PAGRAPH = os.path.join(REF_BUILD, "pagraph")

pytestmark = pytest.mark.skipif(not os.path.exists(PAGRAPH),
                                reason="reference pagraph not built")


@pytest.mark.parametrize("seed", [44, 45, 46])
def test_pagraph_structural_parity(tmp_path, seed):
    ds = make_dataset(seed=seed, genome_len=6000, coverage=14, mean_read=1000,
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
    k = 12
    counts = count_reads(reads, k).counts()
    solid = np.flatnonzero(counts >= 2).astype(np.int64)

    # --- reference input directory (split_helper layout, one group) ---
    in_dir = str(tmp_path / "group0")
    out_ref = str(tmp_path / "ref_out")
    os.makedirs(in_dir)
    os.makedirs(out_ref)
    write_fastq(os.path.join(in_dir, "0.new.fastq"), ds["reads"])
    write_fasta(os.path.join(in_dir, "ctg.fasta"), ds["contigs"])
    write_fasta(os.path.join(in_dir, "ref.fasta"), ds["similar"])
    r2c.write_ref(os.path.join(in_dir, "0.ctg.ref"))
    r2r.write_ref(os.path.join(in_dir, "0.ref.ref"))
    c2r.write_ref(os.path.join(in_dir, "aln"))
    solid_path = os.path.join(in_dir, "solid.bin")
    write_solid_set(solid_path, k, solid)
    with open(os.path.join(in_dir, "config.txt"), "w") as f:
        f.write("ref0\n0.new.fastq\n0.ctg.ref\n0.ref.ref\n")
        f.write("ctg0\n1\nctg1\n1\n\n")

    subprocess.run(
        [PAGRAPH, "-t", "2", "-k", solid_path,
         "-c", os.path.join(in_dir, "ctg.fasta"),
         "-R", os.path.join(in_dir, "ref.fasta"),
         "-p", in_dir, "-a", os.path.join(in_dir, "aln"),
         "-o", out_ref, "-l", "50", "--epsilon", "10", "-v", "2"],
        check=True, capture_output=True, timeout=600)

    ref_consumed = set()
    ctg_txt = os.path.join(out_ref, "contig.txt")
    if os.path.exists(ctg_txt):
        ref_consumed = {l.strip() for l in open(ctg_txt) if l.strip()}
    ref_fastas = [f for f in os.listdir(out_ref) if f.endswith(".fasta")]
    ref_len = 0
    for f in ref_fastas:
        for _, seq in read_seqs(os.path.join(out_ref, f)):
            ref_len = max(ref_len, len(seq))

    # --- our stage on the same alignments ---
    gcfg = GraphConfig(k=k, epsilon=10, min_len=50)
    graph = PAGraph(solid, k)
    group = GroupSpec("ref0", [("ctg0", True), ("ctg1", True)])
    pp = PositionProcessor(graph, reads, ctgs, refs, r2c, r2r, c2r, group,
                           gcfg)
    pp.pre_process()
    pp.process(log=lambda *a: None)
    st = TravelState(graph=graph, ctgs=ctgs, refs=refs,
                     ctg_mapper=pp.ctg_mapper, ref_mapper=pp.ref_mapper,
                     deviation=gcfg.epsilon * 2, error_rate=gcfg.error_rate,
                     start_split=gcfg.start_split, min_len=gcfg.min_len)
    res = assemble_group(st, group.contigs, str(tmp_path / "our_out"),
                         "0_")
    our_consumed = {n for n, _ in res.success}
    our_len = max((c["length"] for c in res.connections), default=0)

    assert our_consumed == ref_consumed, (
        f"consumed sets differ: ref={ref_consumed} ours={our_consumed}")
    assert (ref_len > 0) == (our_len > 0)
    if ref_len > 0:
        assert abs(our_len - ref_len) <= 0.01 * ref_len, (
            f"lengths differ: ref={ref_len} ours={our_len}")
