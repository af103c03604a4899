"""Synthetic dataset generation for tests: a genome, a mutated 'similar
genome', error-laden long reads, and draft contigs.

The reference ships no test data (SURVEY.md §4: no automated test suite
exists upstream), so these generators define our oracle inputs.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def random_genome(rng: np.random.Generator, length: int) -> str:
    table = np.frombuffer(BASES.encode(), np.uint8)
    return table[rng.integers(0, 4, size=length)].tobytes().decode()


def mutate(rng: np.random.Generator, seq: str, sub: float = 0.01,
           ins: float = 0.002, dele: float = 0.002) -> str:
    """Introduce substitutions/indels — used both to derive the 'similar
    genome' from the true genome and to corrupt reads.  Vectorized (the
    per-character loop it replaces took ~1 min/Mb, unusable for
    genome-scale datasets); same distribution, different stream use."""
    codes = np.frombuffer(seq.encode(), np.uint8)
    lut = np.zeros(256, np.int8)
    for i, b in enumerate(BASES):
        lut[ord(b)] = i
    c = lut[codes].astype(np.int64)
    n = len(c)
    r = rng.random(n)
    keep = r >= dele
    is_ins = (r >= dele) & (r < dele + ins)
    is_sub = (r >= dele + ins) & (r < dele + ins + sub)
    c = np.where(is_sub, (c + 1 + rng.integers(0, 3, n)) % 4, c)
    # build output: optional inserted random base BEFORE each kept base
    ins_base = rng.integers(0, 4, n)
    out_len = keep.sum() + is_ins.sum()
    out = np.empty(out_len, np.int64)
    # positions: each kept base occupies 1 slot, +1 if an insertion precedes
    slot = np.cumsum(keep.astype(np.int64) + is_ins.astype(np.int64))
    base_slot = slot - 1                      # slot of the base itself
    out[base_slot[keep]] = c[keep]
    out[(base_slot - 1)[is_ins & keep]] = ins_base[is_ins & keep]
    table = np.frombuffer("".join(BASES).encode(), np.uint8)
    return table[out].tobytes().decode()


def revcomp(seq: str) -> str:
    lut = np.zeros(256, np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        lut[a] = b
    return lut[np.frombuffer(seq.encode(), np.uint8)][::-1] \
        .tobytes().decode()


def sample_reads(rng: np.random.Generator, genome: str, coverage: float,
                 mean_len: int, err: float = 0.02,
                 both_strands: bool = True):
    """Sample error-laden reads; returns list of (name, seq).  Read names are
    1-based indices, matching the mecat convention the reference relies on
    (pre_process.cpp parses query names as integer ids)."""
    n_bases = int(len(genome) * coverage)
    reads = []
    total = 0
    i = 1
    while total < n_bases:
        ln = max(200, int(rng.normal(mean_len, mean_len / 4)))
        ln = min(ln, len(genome))
        start = int(rng.integers(0, len(genome) - ln + 1))
        seq = genome[start:start + ln]
        if both_strands and rng.random() < 0.5:
            seq = revcomp(seq)
        seq = mutate(rng, seq, sub=err, ins=err / 2, dele=err / 2)
        reads.append((str(i), seq))
        total += ln
        i += 1
    return reads


def sample_reads_pacbio(rng: np.random.Generator, genome: str,
                        coverage: float, mean_len: int = 9000,
                        err: float = 0.13, chimera: float = 0.02,
                        sigma: float = 0.55):
    """PacBio-CLR-realistic read sampler (the reference's product regime,
    /root/reference/README.md:5): indel-dominant error (ins : del : sub
    = 6 : 4 : 2 of ``err`` — ins+del = 5x sub, insertion-biased like
    CLR), log-normal length distribution (heavy tail; mean ``mean_len``,
    shape ``sigma``), and a ``chimera`` fraction of reads formed by
    joining two unrelated genome segments (library-prep artifacts)."""
    sub, ins, dele = err / 6, err / 2, err / 3
    mu = float(np.log(mean_len)) - sigma * sigma / 2
    n_bases = int(len(genome) * coverage)

    def segment(ln):
        ln = min(ln, len(genome))
        start = int(rng.integers(0, len(genome) - ln + 1))
        seq = genome[start:start + ln]
        return revcomp(seq) if rng.random() < 0.5 else seq

    reads = []
    total = 0
    i = 1
    while total < n_bases:
        ln = int(np.clip(rng.lognormal(mu, sigma), 500, len(genome)))
        if rng.random() < chimera:
            l1 = max(250, ln // 2)
            raw = segment(l1) + segment(max(250, ln - l1))
        else:
            raw = segment(ln)
        seq = mutate(rng, raw, sub=sub, ins=ins, dele=dele)
        reads.append((str(i), seq))
        total += len(raw)
        i += 1
    return reads


def random_genome_with_repeats(rng: np.random.Generator, length: int,
                               repeat_frac: float = 0.15,
                               n_families: int = 5,
                               unit_len=(500, 5000),
                               copy_div: float = 0.02) -> str:
    """Random genome with planted repeat families: ``n_families`` unit
    sequences pasted (mutated by ``copy_div``, either strand) at random
    positions until ``repeat_frac`` of the genome is repeat-derived.
    Real genomes are repetitive; i.i.d. genomes are the easy regime for
    seeding/traversal (no ambiguous loci), so benchmark genomes should
    carry repeats (VERDICT r4 missing #3)."""
    base = np.frombuffer(random_genome(rng, length).encode(),
                         np.uint8).copy()
    units = [random_genome(rng, int(rng.integers(unit_len[0],
                                                 unit_len[1] + 1)))
             for _ in range(n_families)]
    placed = 0
    target = int(length * repeat_frac)
    while placed < target:
        u = units[int(rng.integers(0, n_families))]
        c = mutate(rng, u, sub=copy_div, ins=copy_div / 4,
                   dele=copy_div / 4)
        if rng.random() < 0.5:
            c = revcomp(c)
        cb = np.frombuffer(c.encode(), np.uint8)
        if len(cb) >= length:
            continue
        pos = int(rng.integers(0, length - len(cb)))
        base[pos:pos + len(cb)] = cb
        placed += len(cb)
    return base.tobytes().decode()


def make_contigs(rng: np.random.Generator, genome: str, pieces: list,
                 err: float = 0.005):
    """Draft contigs = genome slices with light errors; pieces is a list of
    (start, end) tuples."""
    out = []
    for j, (s, e) in enumerate(pieces):
        out.append((f"ctg{j}", mutate(rng, genome[s:e], sub=err,
                                      ins=err / 2, dele=err / 2)))
    return out


def make_dataset(seed: int = 0, genome_len: int = 8000, coverage: float = 12.0,
                 mean_read: int = 1200, read_err: float = 0.02,
                 similar_div: float = 0.01, n_contigs: int = 2,
                 contig_gap: int = 300, profile: str = "legacy",
                 repeat_frac: float = 0.15, chimera: float = 0.02):
    """Full synthetic pipeline input: true genome (hidden), similar genome,
    reads, draft contigs covering the genome with gaps between them.

    ``profile="pacbio"``: repeat-laden genome + indel-dominant
    log-normal-length chimera-bearing reads (``read_err`` becomes the
    TOTAL error, default-raise it to ~0.13) — the realistic regime the
    reference targets.  ``"legacy"`` keeps the original generators
    (substitution-dominant, normal lengths, i.i.d. genome)."""
    rng = np.random.default_rng(seed)
    if profile == "pacbio":
        genome = random_genome_with_repeats(rng, genome_len,
                                            repeat_frac=repeat_frac)
    else:
        genome = random_genome(rng, genome_len)
    similar = mutate(rng, genome, sub=similar_div, ins=similar_div / 4,
                     dele=similar_div / 4)
    if profile == "pacbio":
        reads = sample_reads_pacbio(rng, genome, coverage, mean_read,
                                    err=read_err, chimera=chimera)
    else:
        reads = sample_reads(rng, genome, coverage, mean_read,
                             err=read_err)
    piece_len = (genome_len - (n_contigs + 1) * contig_gap) // n_contigs
    pieces = []
    pos = contig_gap
    for _ in range(n_contigs):
        pieces.append((pos, pos + piece_len))
        pos += piece_len + contig_gap
    contigs = make_contigs(rng, genome, pieces)
    return {
        "genome": genome,
        "similar": [("ref0", similar)],
        "reads": reads,
        "contigs": contigs,
        "pieces": pieces,
    }
