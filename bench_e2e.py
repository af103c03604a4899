"""End-to-end pipeline benchmark at genome scale.

Generates an E. coli-scale synthetic dataset (default 5 Mb genome, 20x
PacBio-like coverage, 1% diverged similar genome, fragmented draft
contigs), runs the FULL pipeline (driver, all 8 stages) on the local
devices, and prints ONE JSON line with end-to-end and per-stage numbers:

    {"metric": "pipeline_reads_per_s", "value": N, "unit": "reads/s",
     "wall_s": ..., "stage_s": {...}, "n_reads": ..., ...}

The reference-anchored CPU baseline for the two heaviest stages comes
from running the reference's own pagraph/pa_cns binaries on the same
intermediates — see bench_reference.py (results recorded in
BASELINE.md).

Usage: python bench_e2e.py [--genome-mb 5] [--coverage 20] [--out DIR]
       [--keep]  (dataset is cached in /tmp by scale+seed)
"""

import argparse
import json
import os
import shutil
import sys
import time


def make_inputs(genome_mb: float, coverage: int, seed: int, d: str,
                profile: str = "legacy"):
    """Generate (and cache) the dataset; returns paths."""
    os.makedirs(d, exist_ok=True)
    paths = {n: os.path.join(d, f) for n, f in
             (("reads", "reads.fq"), ("ctg", "ctg.fa"),
              ("genome", "genome.fa"), ("truth", "truth.fa"))}
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.synth import make_dataset
    from aligngraph2_tpu.io.fasta import write_fasta, write_fastq
    n_contigs = max(2, int(genome_mb * 4))      # ~250 kb draft contigs
    # pacbio profile: repeat-laden genome, indel-dominant 13% error,
    # log-normal lengths, 2% chimeras (tests/synth.py; VERDICT r4 #3)
    err = 0.13 if profile == "pacbio" else 0.1
    ds = make_dataset(seed=seed, genome_len=int(genome_mb * 1e6),
                      coverage=coverage, mean_read=9000, read_err=err,
                      similar_div=0.01, n_contigs=n_contigs,
                      contig_gap=2000, profile=profile)
    write_fastq(paths["reads"], ds["reads"])
    write_fasta(paths["ctg"], ds["contigs"])
    write_fasta(paths["genome"], ds["similar"])
    write_fasta(paths["truth"], [("truth", ds["genome"])])
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=5.0)
    ap.add_argument("--coverage", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default=None)
    ap.add_argument("--profile", default="legacy",
                    choices=["legacy", "pacbio"])
    ap.add_argument("--keep", action="store_true",
                    help="keep the output dir (stage cache reuse)")
    args = ap.parse_args()

    tag = f"{args.genome_mb:g}mb_c{args.coverage}_s{args.seed}"
    if args.profile != "legacy":
        tag += f"_{args.profile}"
    data_dir = f"/tmp/agv_bench_{tag}"
    out_dir = args.out or f"/tmp/agv_bench_out_{tag}"
    if not args.keep and os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    t0 = time.time()
    paths = make_inputs(args.genome_mb, args.coverage, args.seed, data_dir,
                        profile=args.profile)
    gen_s = time.time() - t0

    from aligngraph2_tpu.config import PipelineConfig
    from aligngraph2_tpu.pipeline.driver import run_pipeline
    cfg = PipelineConfig()
    cfg.runtime.progress = False

    t1 = time.time()
    res = run_pipeline(paths["reads"], paths["ctg"], paths["genome"],
                       out_dir, cfg,
                       log=lambda *a: print(*a, file=sys.stderr,
                                            flush=True))
    wall = time.time() - t1

    s = res.stats
    n_reads = s["n_reads"]
    out = {
        "metric": "pipeline_reads_per_s",
        "value": round(n_reads / wall, 3),
        "unit": "reads/s",
        "wall_s": round(wall, 2),
        "gen_s": round(gen_s, 2),
        "stage_s": s["stage_s"],
        "n_reads": n_reads,
        "n_read_to_ctg": s["n_read_to_ctg"],
        "n_read_to_ref": s["n_read_to_ref"],
        "n_groups": s["n_groups"],
        "n_chains": s["n_chains"],
        "rss_mb": s.get("rss_mb"),
        "sharded": s.get("sharded_align"),
        "dataset": tag,
        "profile": args.profile,
        "out_dir": out_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
