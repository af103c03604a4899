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
