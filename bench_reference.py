"""Stage-level CPU baseline: the reference's own pagraph / pa_cns
binaries (built from /root/reference into /tmp/refbuild) vs our stages,
on the SAME intermediates produced by a bench_e2e.py run.

This anchors BASELINE.md's numbers to the real reference implementation
instead of a synthetic proxy (the aligner stages have no runnable
reference counterpart — mecat2ref is an absent submodule — so the
comparison covers the two heaviest runnable stages).

Usage:
    python bench_e2e.py --genome-mb 5 --keep   # produces intermediates
    python bench_reference.py --out-dir /tmp/agv_bench_out_5mb_c20_s42 \
        --data-dir /tmp/agv_bench_5mb_c20_s42 [--threads 2]

Prints ONE JSON line with wall-clock seconds for reference pagraph,
reference pa_cns, and our equivalents (from the e2e run's metrics.json).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REF_BUILD = "/tmp/refbuild"


def build_reference() -> bool:
    if os.path.exists(os.path.join(REF_BUILD, "pagraph")):
        return True
    os.makedirs(REF_BUILD, exist_ok=True)
    try:
        subprocess.run(["cmake", "-GNinja", "-DCMAKE_BUILD_TYPE=Release",
                        "/root/reference/PAGraph"], cwd=REF_BUILD,
                       capture_output=True, timeout=600, check=True)
        subprocess.run(["ninja"], cwd=REF_BUILD, capture_output=True,
                       timeout=1200, check=True)
        return True
    except (OSError, subprocess.CalledProcessError,
            subprocess.TimeoutExpired):
        return False


def prepare_group_dir(out_dir: str, data_dir: str, group_idx: int,
                      tmp: str = "/tmp/agv_refstage"):
    """Assemble the reference pagraph's input group dir from a
    bench_e2e.py run's intermediates, subset exactly like the driver's
    per-group loop.  Returns (in_dir, ref_out_dir, group, info)."""
    wrk = os.path.join(out_dir, "working_dir")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from aligngraph2_tpu.pipeline.preprocess import read_config
    groups = read_config(os.path.join(wrk, "input", "p", "config.txt"))
    g = groups[group_idx]

    shutil.rmtree(tmp, ignore_errors=True)
    in_dir = os.path.join(tmp, "group")
    out_ref = os.path.join(tmp, "out")
    os.makedirs(in_dir)
    os.makedirs(out_ref)

    # subset alignments/reads for the group exactly like the driver does
    from aligngraph2_tpu.align.records import AlignmentSet
    from aligngraph2_tpu.io.fasta import write_fasta, write_fastq
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    from aligngraph2_tpu.pipeline.preprocess import (group_read_names,
                                                     subset_alignments)
    reads = SeqDatabase.from_file(os.path.join(data_dir, "reads.fq"))
    ctgs = SeqDatabase.from_file(os.path.join(data_dir, "ctg.fa"))
    refs = SeqDatabase.from_file(os.path.join(data_dir, "genome.fa"))
    r2c = AlignmentSet.read_ref(
        os.path.join(wrk, "mecat", "ctg", "read_to_contig.ref"))
    r2r = AlignmentSet.read_ref(
        os.path.join(wrk, "mecat", "ref", "read_to_ref.ref"))
    c2r = AlignmentSet.read_ref(
        os.path.join(wrk, "mummer", "ctg_to_ref.ref"))
    member = {n for n, _ in g.contigs}
    names = group_read_names(g, subset_alignments(r2c, None, member),
                             subset_alignments(r2r, None, {g.ref_name}))
    write_fastq(os.path.join(in_dir, "0.new.fastq"),
                ((n, s) for n, s in reads.records() if n in names))
    write_fasta(os.path.join(in_dir, "ctg.fasta"),
                ((n, s) for n, s in ctgs.records() if n in member))
    write_fasta(os.path.join(in_dir, "ref.fasta"),
                ((n, s) for n, s in refs.records()
                 if n == g.ref_name))
    subset_alignments(r2c, names, member).write_ref(
        os.path.join(in_dir, "0.ctg.ref"))
    subset_alignments(r2r, names, {g.ref_name}).write_ref(
        os.path.join(in_dir, "0.ref.ref"))
    subset_alignments(c2r, member, {g.ref_name}).write_ref(
        os.path.join(in_dir, "aln"))
    with open(os.path.join(in_dir, "config.txt"), "w") as f:
        f.write(f"{g.ref_name}\n0.new.fastq\n0.ctg.ref\n0.ref.ref\n")
        for n, fwd in g.contigs:
            f.write(f"{n}\n{1 if fwd else 0}\n")
        f.write("\n")
    return in_dir, out_ref, g, {"n_group_reads": len(names),
                                "n_group_ctgs": len(member)}


def run_reference_pagraph(wrk: str, in_dir: str, out_ref: str,
                          threads: int):
    """Run the reference pagraph binary on a prepared group dir."""
    return subprocess.run(
        [os.path.join(REF_BUILD, "pagraph"), "-t", str(threads),
         "-k", os.path.join(wrk, "solid_kmer_set.bin"),
         "-c", os.path.join(in_dir, "ctg.fasta"),
         "-R", os.path.join(in_dir, "ref.fasta"),
         "-p", in_dir, "-a", os.path.join(in_dir, "aln"),
         "-o", out_ref, "-l", "50", "--epsilon", "10", "-v", "2"],
        capture_output=True, timeout=14400)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True,
                    help="bench_e2e.py output dir (working_dir inside)")
    ap.add_argument("--data-dir", required=True,
                    help="bench_e2e.py dataset dir")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 2)
    ap.add_argument("--group", type=int, default=0)
    args = ap.parse_args()
    if not build_reference():
        print(json.dumps({"error": "reference build failed"}))
        return

    wrk = os.path.join(args.out_dir, "working_dir")
    metrics = json.load(open(os.path.join(args.out_dir, "metrics.json")))

    in_dir, out_ref, g, stage = prepare_group_dir(
        args.out_dir, args.data_dir, args.group)

    # ---- reference pagraph on the group ----
    t0 = time.time()
    res = run_reference_pagraph(wrk, in_dir, out_ref, args.threads)
    stage["ref_pagraph_s"] = round(time.time() - t0, 2)
    stage["ref_pagraph_rc"] = res.returncode
    stage["our_pagraph_s"] = metrics["stage_s"].get("pagraph")

    # ---- reference pa_cns on the first corrected backbone ----
    add_path = os.path.join(wrk, "cns", "input", "add.fasta")
    merge_ref = os.path.join(wrk, "cns", "wrk", "merge.ref")
    if os.path.exists(add_path) and os.path.exists(merge_ref) \
            and os.path.getsize(add_path) > 0:
        from aligngraph2_tpu.io.fasta import read_seqs
        name, seq = next(iter(read_seqs(add_path)))
        bdir = os.path.join("/tmp/agv_refstage", "cns")
        os.makedirs(bdir)
        bfa = os.path.join(bdir, "b.fasta")
        write_fasta(bfa, [(name, seq)])
        alns = AlignmentSet.read_ref(merge_ref)
        sub = AlignmentSet([a for a in alns if a.ref_name == name])
        bref = os.path.join(bdir, "b.ref")
        sub.write_ref(bref)
        t0 = time.time()
        res = subprocess.run(
            [os.path.join(REF_BUILD, "pa_cns"), "-t", str(args.threads),
             "-i", bfa, "-a", bref,
             "-o", os.path.join(bdir, "cns.fasta"),
             "-l", "10000", "-k", "3000"],
            capture_output=True, timeout=14400)
        stage["ref_pa_cns_s"] = round(time.time() - t0, 2)
        stage["ref_pa_cns_rc"] = res.returncode
        stage["ref_pa_cns_alns"] = len(sub)
        stage["our_correct_s"] = metrics["stage_s"].get("correct")

    stage["threads"] = args.threads
    stage["metric"] = "reference_stage_baseline"
    print(json.dumps(stage))


if __name__ == "__main__":
    main()
