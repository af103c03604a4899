"""Synthetic dataset generation for tests: a genome, a mutated 'similar
genome', error-laden long reads, and draft contigs.

The reference ships no test data (SURVEY.md §4: no automated test suite
exists upstream), so these generators define our oracle inputs.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGT"


def random_genome(rng: np.random.Generator, length: int) -> str:
    return "".join(BASES[i] for i in rng.integers(0, 4, size=length))


def mutate(rng: np.random.Generator, seq: str, sub: float = 0.01,
           ins: float = 0.002, dele: float = 0.002) -> str:
    """Introduce substitutions/indels — used both to derive the 'similar
    genome' from the true genome and to corrupt reads."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(BASES[rng.integers(0, 4)])
            out.append(ch)
        elif r < dele + ins + sub:
            out.append(BASES[(BASES.index(ch) + 1 + rng.integers(0, 3)) % 4])
        else:
            out.append(ch)
    return "".join(out)


def revcomp(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(seq))


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
                 contig_gap: int = 300):
    """Full synthetic pipeline input: true genome (hidden), similar genome,
    reads, draft contigs covering the genome with gaps between them."""
    rng = np.random.default_rng(seed)
    genome = random_genome(rng, genome_len)
    similar = mutate(rng, genome, sub=similar_div, ins=similar_div / 4,
                     dele=similar_div / 4)
    reads = sample_reads(rng, genome, coverage, mean_read, err=read_err)
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
