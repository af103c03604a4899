"""Assembly-QUALITY parity: our pagraph stage vs the reference binary on
the SAME intermediates, diffing OUTPUTS rather than wall clocks
(bench_reference.py covers time; this covers VERDICT r3 missing #1).

Both sides consume identical group inputs (reads, contigs, ref,
alignments, solid set — prepared exactly like the driver's per-group
subsetting by bench_reference.prepare_group_dir) and emit extended/
connected contigs (reference: PAssembly::testTravel5 outputs,
/root/reference/PAGraph/src/tools/graph/PAssembly.cpp:265-333 + the
consumed-contig list, main/pagraph.cpp:265-269; ours:
aligngraph2_tpu/traverse/assembly.py via the recorded pipeline run).
Compared per side:

  * consumed-contig set (contig.txt vs result.json "success")
  * chain count and chain lengths
  * per-chain identity to the TRUTH genome and aligned fraction
  * NGA50-style stat: N50 over truth-aligned blocks, denominator =
    truth genome size (assembled bases only count where they align)

Alignment of assembled chains to truth uses OUR chunked aligner for
both sides symmetrically (the reference's own aligners are absent
submodules, SURVEY.md §2.5).

Usage:
    python bench_e2e.py --genome-mb 5 --keep        # intermediates
    python bench_quality.py \
        --out-dir /tmp/agv_bench_out_5mb_c20_s42 \
        --data-dir /tmp/agv_bench_5mb_c20_s42 [--threads 2]

Prints ONE JSON line; recorded as BENCH_QUALITY.json with the summary
table in BASELINE.md.
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_reference import (REF_BUILD, build_reference, prepare_group_dir,
                             run_reference_pagraph)


def _truth_metrics(chains, truth_db):
    """Align each assembled chain to the truth genome; return per-side
    aggregates: identity (match-weighted), aligned fraction of the
    assembly, truth-aligned blocks, NGA50."""
    from aligngraph2_tpu.align.aligner import align_chunked
    from aligngraph2_tpu.config import AlignerConfig
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    if not chains:
        return {"n_chains": 0, "chain_lengths": [], "identity": None,
                "aligned_frac": None, "nga50": 0, "genome_covered": 0.0}
    asm_db = SeqDatabase([(n, s.upper()) for n, s in chains])
    # 4 kb chunks: a 10 kb chunk of a ~4%-residual-error consensus
    # accumulates enough indel drift to overflow the +-W/2 DP band and
    # silently drops out, misreporting coverage (measured: 80% at 10 kb
    # vs 99.95% at 4 kb on the same assembly)
    acfg = AlignerConfig(chunk_len=4000)
    alns = align_chunked(truth_db, asm_db, acfg, progress=False)
    total_len = sum(len(s) for _, s in chains)
    matches = 0
    cols = 0
    q_covered = {n: [] for n, _ in chains}
    t_blocks = {}   # per truth sequence — multi-chromosome truths must
    for a in alns:  # not merge blocks across chromosomes
        m = sum(1 for x, y in zip(a.qstr, a.tstr) if x == y)
        matches += m
        cols += len(a.qstr)
        q_covered[a.query_name].append((a.qb, a.qe))
        t_blocks.setdefault(a.ref_name, []).append((a.rb, a.re))
    identity = matches / cols if cols else 0.0

    def merged_span(ivals, gap=2000):
        ivals = sorted(ivals)
        out = []
        for b, e in ivals:
            if out and b <= out[-1][1] + gap:
                out[-1][1] = max(out[-1][1], e)
            else:
                out.append([b, e])
        return out

    aligned = sum(e - b for iv in q_covered.values()
                  for b, e in merged_span(iv))
    truth_len = sum(truth_db.lengths)
    blocks = [iv for ivs in t_blocks.values() for iv in merged_span(ivs)]
    covered = sum(e - b for b, e in blocks)
    # NGA50: smallest aligned-block length such that blocks >= it cover
    # half the TRUTH genome (unaligned assembly bases never count)
    lens = sorted((e - b for b, e in blocks), reverse=True)
    nga50 = 0
    acc = 0
    for ln in lens:
        acc += ln
        nga50 = ln
        if acc >= truth_len / 2:
            break
    else:
        nga50 = 0  # <50% of the genome covered: NGA50 undefined -> 0
    return {
        "n_chains": len(chains),
        "chain_lengths": sorted((len(s) for _, s in chains), reverse=True),
        "identity": round(identity, 5),
        "aligned_frac": round(aligned / total_len, 5) if total_len else 0,
        "nga50": nga50,
        "genome_covered": round(covered / truth_len, 5),
    }


def collect_reference(out_ref: str):
    """Reference pagraph outputs: consumed set (contig.txt,
    pagraph.cpp:265-269) + emitted chain FASTAs."""
    from aligngraph2_tpu.io.fasta import read_seqs
    consumed = set()
    ctg_txt = os.path.join(out_ref, "contig.txt")
    if os.path.exists(ctg_txt):
        with open(ctg_txt) as f:
            consumed = {ln.strip() for ln in f if ln.strip()}
    chains = []
    for fa in sorted(glob.glob(os.path.join(out_ref, "*.fasta"))):
        for name, seq in read_seqs(fa):
            chains.append((f"{os.path.basename(fa)}:{name}", seq))
    return consumed, chains


def reference_final(ref_chains, in_dir: str, threads: int, tmp: str):
    """Polish the REFERENCE's chains with the REFERENCE's pa_cns binary
    (already built; /root/reference/PAGraph/src/main/pa_cns.cpp:12-168),
    mirroring our stages 7-8: align the group's reads to the reference's
    chains with OUR aligner (both sides' read->backbone alignments come
    from the same aligner — the reference's own are absent submodules),
    then pa_cns each backbone with the driver's -l/-k defaults.  Returns
    the polished chains for final-vs-final comparison (VERDICT r4
    missing #1)."""
    import shutil
    import subprocess
    from aligngraph2_tpu.align.aligner import LongReadAligner
    from aligngraph2_tpu.align.records import AlignmentSet
    from aligngraph2_tpu.config import AlignerConfig
    from aligngraph2_tpu.io.fasta import read_seqs, write_fasta
    from aligngraph2_tpu.io.seqdb import SeqDatabase
    if not ref_chains:
        return []
    reads_db = SeqDatabase.from_file(os.path.join(in_dir, "0.new.fastq"))
    backbone_db = SeqDatabase([(n.replace(":", "_").replace(" ", "_"), s)
                               for n, s in ref_chains])
    alns = LongReadAligner(backbone_db, AlignerConfig(),
                           progress=False).align_reads(reads_db)
    bdir = os.path.join(tmp, "ref_final_cns")
    shutil.rmtree(bdir, ignore_errors=True)
    os.makedirs(bdir)
    out = []
    for i in range(len(backbone_db)):
        nm = backbone_db.names[i]
        bfa = os.path.join(bdir, f"{i}.fasta")
        from aligngraph2_tpu.io.seqdb import decode_seq
        write_fasta(bfa, [(nm, decode_seq(backbone_db.get_codes(i)))])
        sub = AlignmentSet([a for a in alns if a.ref_name == nm])
        bref = os.path.join(bdir, f"{i}.ref")
        sub.write_ref(bref)
        cns = os.path.join(bdir, f"{i}.cns.fasta")
        res = subprocess.run(
            [os.path.join(REF_BUILD, "pa_cns"), "-t", str(threads),
             "-i", bfa, "-a", bref, "-o", cns,
             "-l", "10000", "-k", "3000"],
            capture_output=True, timeout=14400)
        if res.returncode == 0 and os.path.exists(cns):
            for n2, s2 in read_seqs(cns):
                out.append((f"{nm}:{n2}", s2))
        else:
            out.append((nm, decode_seq(backbone_db.get_codes(i))))
    return out


def collect_ours(out_dir: str, group_idx: int):
    """Our pagraph outputs for the group: result.json success set +
    emitted chain sequences (stored in the connections payload)."""
    gdir = os.path.join(out_dir, "working_dir", "pagraph", str(group_idx))
    with open(os.path.join(gdir, "result.json")) as f:
        payload = json.load(f)
    consumed = {n for n, _ in payload["success"]}
    chains = [(c["name"], c["sequence"]) for c in payload["connections"]]
    return consumed, chains


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 2)
    ap.add_argument("--group", type=int, default=0)
    ap.add_argument("--skip-final", action="store_true",
                    help="skip final.fasta metrics")
    ap.add_argument("--skip-ref-final", action="store_true",
                    help="skip the reference pa_cns final-vs-final pass")
    ap.add_argument("--append", action="store_true",
                    help="append a JSON line to BENCH_QUALITY.json "
                         "instead of overwriting (per-group rows)")
    args = ap.parse_args()
    if not build_reference():
        print(json.dumps({"error": "reference build failed"}))
        return

    from aligngraph2_tpu.io.seqdb import SeqDatabase
    truth_db = SeqDatabase.from_file(
        os.path.join(args.data_dir, "truth.fa"))

    wrk = os.path.join(args.out_dir, "working_dir")
    in_dir, out_ref, g, info = prepare_group_dir(
        args.out_dir, args.data_dir, args.group)
    t0 = time.time()
    res = run_reference_pagraph(wrk, in_dir, out_ref, args.threads)
    ref_s = round(time.time() - t0, 2)

    ref_consumed, ref_chains = collect_reference(out_ref)
    our_consumed, our_chains = collect_ours(args.out_dir, args.group)

    out = {
        "metric": "assembly_quality_parity",
        "dataset": os.path.basename(args.data_dir),
        "group": args.group,
        "ref_pagraph_rc": res.returncode,
        "ref_pagraph_s": ref_s,
        "reference": {
            "consumed": sorted(ref_consumed),
            **_truth_metrics(ref_chains, truth_db)},
        "ours": {
            "consumed": sorted(our_consumed),
            **_truth_metrics(our_chains, truth_db)},
        "consumed_only_ref": sorted(ref_consumed - our_consumed),
        "consumed_only_ours": sorted(our_consumed - ref_consumed),
        **info,
    }
    # final (post-consensus) assembly vs truth — ours end-to-end
    final = os.path.join(args.out_dir, "final.fasta")
    if not args.skip_final and os.path.exists(final):
        from aligngraph2_tpu.io.fasta import read_seqs
        out["ours_final"] = _truth_metrics(
            [(n, s) for n, s in read_seqs(final)], truth_db)
    # final-vs-final: the reference's own pa_cns on the reference's own
    # chains (same read->backbone aligner both sides) — the deliverable
    # is the polished FASTA, so this is the comparison that matters
    if not args.skip_ref_final and ref_chains:
        t0 = time.time()
        rf_chains = reference_final(ref_chains, in_dir, args.threads,
                                    "/tmp/agv_refstage")
        out["ref_final"] = _truth_metrics(rf_chains, truth_db)
        out["ref_final_s"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    # BENCH_QUALITY.json is JSON-lines: one compact record per line
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_QUALITY.json")
    with open(path, "a" if args.append else "w") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
