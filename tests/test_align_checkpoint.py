"""Intra-stage alignment checkpoint/resume (align/checkpoint.py).

A run killed mid-alignment must resume from the last flushed chunk and
produce output identical to an uninterrupted run — including the
duplicate filter and per-read-best delta filter, which see the preloaded
history.  (SURVEY.md §5: the reference only checkpoints whole stages.)
"""

import numpy as np
import pytest

from aligngraph2_tpu.align.aligner import LongReadAligner
from aligngraph2_tpu.config import AlignerConfig
from aligngraph2_tpu.io.seqdb import SeqDatabase
from tests.synth import make_dataset


def _tuples(alns):
    return [(a.query_name, a.ref_name, a.forward, a.score, a.qb, a.qe,
             a.rb, a.re, a.qstr, a.tstr) for a in alns]


@pytest.fixture(scope="module")
def data():
    ds = make_dataset(seed=21, genome_len=8000, coverage=10, mean_read=900,
                      read_err=0.03, n_contigs=2, contig_gap=400)
    reads = SeqDatabase(ds["reads"])
    refs = SeqDatabase(ds["similar"])
    cfg = AlignerConfig(band_width=128, min_aln_len=150, min_block_hits=3,
                        seed_k=11, delta=0.5)
    fresh = LongReadAligner(refs, cfg).align_reads(reads)
    assert len(fresh) > 10
    return dict(reads=reads, refs=refs, cfg=cfg, fresh=_tuples(fresh))


def _truncate_to_first_chunk(path, drop_tail_lines=0):
    """Keep the header + first complete chunk (simulates a crash)."""
    with open(path) as f:
        lines = f.readlines()
    assert lines[0].startswith("#TOKEN")
    assert lines[1].startswith("#CHUNK")
    n = int(lines[1].split()[1])
    keep = lines[:2 + 3 * n]
    if drop_tail_lines:
        keep = keep[:-drop_tail_lines]
    with open(path, "w") as f:
        f.writelines(keep)
    return int(lines[1].split()[2])


def test_checkpoint_written_and_resume_identical(tmp_path, data):
    part = str(tmp_path / "stage.part")
    a1 = LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                         checkpoint_flush_s=0.0)
    got = a1.align_reads(data["reads"])
    assert _tuples(got) == data["fresh"]

    # crash after the first chunk, resume: identical output
    cursor = _truncate_to_first_chunk(part)
    assert cursor > 0
    a2 = LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                         checkpoint_flush_s=0.0)
    resumed = a2.align_reads(data["reads"])
    assert _tuples(resumed) == data["fresh"]


def test_truncated_mid_chunk_falls_back_to_last_complete(tmp_path, data):
    part = str(tmp_path / "stage.part")
    LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                    checkpoint_flush_s=0.0).align_reads(data["reads"])
    # cut into the middle of the first chunk's records: resume must treat
    # the file as empty-progress (no complete chunk) yet still be correct
    _truncate_to_first_chunk(part, drop_tail_lines=2)
    resumed = LongReadAligner(data["refs"], data["cfg"],
                              checkpoint_path=part,
                              checkpoint_flush_s=0.0
                              ).align_reads(data["reads"])
    assert _tuples(resumed) == data["fresh"]


def test_stale_token_restarts_cleanly(tmp_path, data):
    part = str(tmp_path / "stage.part")
    LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                    checkpoint_flush_s=0.0).align_reads(data["reads"])
    # different aligner parameters -> different job stream -> stale part
    cfg2 = AlignerConfig(band_width=128, min_aln_len=150, min_block_hits=3,
                         seed_k=11, delta=0.9)
    fresh2 = LongReadAligner(data["refs"], cfg2).align_reads(data["reads"])
    got = LongReadAligner(data["refs"], cfg2, checkpoint_path=part,
                          checkpoint_flush_s=0.0
                          ).align_reads(data["reads"])
    assert _tuples(got) == _tuples(fresh2)


def test_sharded_path_resume(tmp_path, data):
    from aligngraph2_tpu.parallel.mesh import make_mesh
    part = str(tmp_path / "stage.part")
    mesh = make_mesh(4, block_parallel=2)
    fresh = LongReadAligner(data["refs"], data["cfg"],
                            mesh=mesh).align_reads(data["reads"])
    LongReadAligner(data["refs"], data["cfg"], mesh=mesh,
                    checkpoint_path=part, checkpoint_flush_s=0.0
                    ).align_reads(data["reads"])
    cursor = _truncate_to_first_chunk(part)
    assert cursor > 0
    resumed = LongReadAligner(data["refs"], data["cfg"], mesh=mesh,
                              checkpoint_path=part, checkpoint_flush_s=0.0
                              ).align_reads(data["reads"])
    assert _tuples(resumed) == _tuples(fresh)
