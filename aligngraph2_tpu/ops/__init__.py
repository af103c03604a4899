from .kmer import (
    kmer_codes_np,
    kmer_codes_batch,
    KmerCounter,
    solid_min_abundance,
)

__all__ = [
    "kmer_codes_np",
    "kmer_codes_batch",
    "KmerCounter",
    "solid_min_abundance",
]
