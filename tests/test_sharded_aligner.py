"""Production sharded aligner (parallel/sharded.py via
LongReadAligner(mesh=...)): mesh-shape invariance and alignment quality
on the 8-virtual-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner
from aligngraph2_tpu.config import AlignerConfig
from aligngraph2_tpu.io.seqdb import SeqDatabase
from aligngraph2_tpu.parallel.mesh import make_mesh
from tests.synth import make_dataset


def small_cfg(**kw):
    d = dict(band_width=128, min_aln_len=100, min_block_hits=3,
             max_candidates=4, seed_k=11, delta=0.5,
             block_size=2048)
    d.update(kw)
    return AlignerConfig(**d)


@pytest.fixture(scope="module")
def dataset():
    return make_dataset(seed=5, genome_len=6000, coverage=8,
                        mean_read=900, read_err=0.03)


def _headers(alns):
    return [(a.query_name, a.ref_name, a.forward, a.score, a.qb, a.qe,
             a.rb, a.re, a.qstr, a.tstr) for a in alns]


def test_sharded_equals_single_device(dataset):
    """The sharded step must be bit-identical across mesh shapes: the
    per-block tables, their gather order, host compaction and the
    extension lanes are all shard-invariant (parallel/sharded.py)."""
    reads = SeqDatabase(dataset["reads"])
    genome = SeqDatabase([("g", dataset["genome"])])
    results = {}
    for ndev, bp in ((1, 1), (8, 2), (8, 4)):
        mesh = make_mesh(ndev, block_parallel=bp)
        alns = LongReadAligner(genome, small_cfg(),
                               mesh=mesh).align_reads(reads)
        results[(ndev, bp)] = _headers(alns)
    base = results[(1, 1)]
    assert len(base) > 0
    assert results[(8, 2)] == base
    assert results[(8, 4)] == base


def test_sharded_alignment_quality(dataset):
    """Same quality bar as the host path (test_aligner.py): nearly every
    read aligns, and the emitted records spell their claimed intervals."""
    reads = SeqDatabase(dataset["reads"])
    genome = SeqDatabase([("g", dataset["genome"])])
    mesh = make_mesh(8, block_parallel=2)
    alns = LongReadAligner(genome, small_cfg(),
                           mesh=mesh).align_reads(reads)
    aligned = {a.query_name for a in alns}
    assert len(aligned) >= 0.9 * len(reads)
    rseq = genome.get_str(0)
    for a in alns:
        assert a.qsize == reads.size(reads.seq_id(a.query_name))
        assert 0 <= a.rb < a.re <= genome.size(0)
        assert 0 <= a.qb < a.qe <= a.qsize
        assert a.tstr.replace("-", "") == rseq[a.rb:a.re]
        qdb_seq = reads.get_str(reads.seq_id(a.query_name), a.forward)
        assert a.qstr.replace("-", "") == qdb_seq[
            a.qb if a.forward else a.qsize - a.qe:
            a.qe if a.forward else a.qsize - a.qb]


def test_sharded_multi_target_and_revcomp(dataset):
    """Reads from the reverse strand and a multi-sequence target database
    must land on the right target with the right orientation."""
    from tests.synth import revcomp
    genome = dataset["genome"]
    reads = SeqDatabase([
        ("fwd", genome[1000:1900]),
        ("rev", revcomp(genome[3000:3900])),
    ])
    db = SeqDatabase([("decoy", dataset["similar"][0][1][:2000]),
                      ("g", genome)])
    mesh = make_mesh(8, block_parallel=2)
    alns = LongReadAligner(db, small_cfg(),
                           mesh=mesh).align_reads(reads)
    by_read = {}
    for a in alns:
        by_read.setdefault(a.query_name, []).append(a)
    best_f = max(by_read["fwd"], key=lambda a: a.score)
    assert best_f.ref_name == "g" and best_f.forward
    assert abs(best_f.rb - 1000) < 100
    best_r = max(by_read["rev"], key=lambda a: a.score)
    assert best_r.ref_name == "g" and not best_r.forward
    assert abs(best_r.rb - 3000) < 100
