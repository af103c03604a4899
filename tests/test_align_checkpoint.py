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


def test_flush_truncates_crash_torn_tail(tmp_path, data):
    """A crash-truncated partial chunk must be cut off before new chunks
    are appended — otherwise every later resume stops at the torn chunk
    (or worse, frame-shifts into the appended ones)."""
    from aligngraph2_tpu.align.checkpoint import AlignCheckpoint
    from aligngraph2_tpu.align.records import AlignmentSet

    part = str(tmp_path / "stage.part")
    LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                    checkpoint_flush_s=0.0).align_reads(data["reads"])
    with open(part) as f:
        token = f.readline().split()[1]
    # tear the tail mid-record (crash simulation), keeping >=1 intact chunk
    cursor = _truncate_to_first_chunk(part)
    with open(part, "a") as f:
        f.write("#CHUNK 2 999\nr7 ref F 5")  # torn: header + partial rec

    ck = AlignCheckpoint(part, token, flush_s=0.0)
    cur1, alns1 = ck.resume()
    assert cur1 == cursor and len(alns1) > 0
    # append a fresh chunk after the torn tail; it must land right after
    # the last INTACT chunk, not after the garbage
    extra = AlignmentSet(list(alns1)[:2])
    ck.flush(list(extra), cursor + 5)
    ck.close()
    cur2, alns2 = AlignCheckpoint(part, token).resume()
    assert cur2 == cursor + 5
    assert len(alns2) == len(alns1) + 2


def test_corrupt_chunk_mark_degrades_to_intact_prefix(tmp_path, data):
    """A mark line like '#CHUNK 12 4x' must not crash resume() — it
    degrades to the chunks before it (ADVICE r2, ValueError path)."""
    from aligngraph2_tpu.align.checkpoint import AlignCheckpoint
    part = str(tmp_path / "stage.part")
    LongReadAligner(data["refs"], data["cfg"], checkpoint_path=part,
                    checkpoint_flush_s=0.0).align_reads(data["reads"])
    with open(part) as f:
        token = f.readline().split()[1]
    cursor = _truncate_to_first_chunk(part)
    with open(part, "a") as f:
        f.write("#CHUNK 12 4x\n")
    cur, alns = AlignCheckpoint(part, token).resume()
    assert cur == cursor and len(alns) > 0


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
