"""K-mer encoding and the solid-k-mer counter.

Replaces the reference ``kmer_counter`` stage and KmerHelper
(/root/reference/PAGraph/src/main/kmer_counter.cpp,
/root/reference/PAGraph/src/tools/kmer/KmerHelper.cpp):

  * big-endian rolling 2-bit codes: code(s[i..i+k)) with A=0 C=1 G=2 T=3,
    non-ACGT treated as A (KmerHelper.hpp acgt()),
  * a dense 4^k abundance table (k <= 15),
  * the cutoff rule: the smallest abundance value ``a`` such that the
    fraction of table entries with abundance > a is <= threshold
    (kmer_counter.cpp:58-77); all codes with abundance >= a are "solid".

The device path batches reads into padded (B, L) uint8 tensors, computes
codes with k fused shift-or steps, and scatter-adds into the table; invalid
(padding) positions are routed to a spill slot past the table end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def kmer_codes_np(codes: np.ndarray, k: int) -> np.ndarray:
    """Host: uint8 base codes -> int64 k-mer codes (length n-k+1; empty if
    n < k)."""
    n = len(codes)
    if n < k:
        return np.zeros(0, dtype=np.int64)
    c = codes.astype(np.int64)
    out = np.zeros(n - k + 1, dtype=np.int64)
    for j in range(k):
        out = (out << 2) | c[j:n - k + 1 + j]
    return out


def revcomp_code_np(code: np.ndarray, k: int) -> np.ndarray:
    """Reverse-complement of 2-bit codes (host utility)."""
    code = np.asarray(code, dtype=np.int64)
    out = np.zeros_like(code)
    c = code.copy()
    for _ in range(k):
        out = (out << 2) | (3 - (c & 3))
        c >>= 2
    return out


def code_to_str(code: int, k: int) -> str:
    """Code -> k-mer string (KmerHelper::code2Kmer)."""
    table = "ACGT"
    out = []
    for _ in range(k):
        out.append(table[code & 3])
        code >>= 2
    return "".join(reversed(out))


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_codes_batch(batch: jax.Array, lengths: jax.Array, k: int):
    """Device: (B, L) uint8 codes + (B,) lengths -> ((B, L-k+1) int32 codes,
    (B, L-k+1) bool valid mask).

    Requires 4^k < 2^31 (k <= 15, enforced by config validation — same
    bound as the reference's dense table).
    """
    B, L = batch.shape
    n_pos = L - k + 1
    c = batch.astype(jnp.int32)
    out = jnp.zeros((B, n_pos), dtype=jnp.int32)
    for j in range(k):
        out = (out << 2) | jax.lax.dynamic_slice_in_dim(c, j, n_pos, axis=1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, n_pos), 1)
    valid = pos < (lengths.astype(jnp.int32)[:, None] - (k - 1))
    return out, valid


@functools.partial(jax.jit, static_argnames=("k",), donate_argnums=(0,))
def _accumulate(table: jax.Array, batch: jax.Array, lengths: jax.Array,
                k: int) -> jax.Array:
    codes, valid = kmer_codes_batch(batch, lengths, k)
    # Route padding to the spill slot (index 4^k) so one scatter-add does
    # the whole batch with no host-side masking.
    spill = table.shape[0] - 1
    idx = jnp.where(valid, codes, spill).reshape(-1)
    return table.at[idx].add(1, mode="drop")


class KmerCounter:
    """Dense 4^k abundance counter with device scatter-add accumulation."""

    def __init__(self, k: int, device=None):
        if not 1 <= k <= 15:
            raise ValueError("k must be in [1, 15] for the dense table")
        self.k = k
        self.table_size = 1 << (2 * k)
        self._device = device
        with jax.default_device(device) if device is not None else _nullctx():
            self.table = jnp.zeros(self.table_size + 1, dtype=jnp.int32)

    def add_batch(self, batch: np.ndarray, lengths: np.ndarray) -> None:
        self.table = _accumulate(self.table, jnp.asarray(batch),
                                 jnp.asarray(lengths), self.k)

    def counts(self) -> np.ndarray:
        """Host copy of the 4^k table (spill slot dropped)."""
        return np.asarray(self.table[:self.table_size])

    def solid_codes(self, threshold: float = 0.2) -> np.ndarray:
        counts = self.counts()
        min_ab = solid_min_abundance(counts, threshold)
        return np.flatnonzero(counts >= min_ab).astype(np.int64)


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def solid_min_abundance(counts: np.ndarray, threshold: float) -> int:
    """Exact reference cutoff rule (kmer_counter.cpp:58-77).

    Walk distinct abundance values ascending, accumulating how many table
    entries have each; stop at the first abundance where the surviving
    fraction (entries with strictly greater abundance) drops to <=
    threshold.
    """
    table_size = counts.size
    values, freq = np.unique(counts, return_counts=True)
    cum = np.cumsum(freq)
    ok = (1.0 - cum / table_size) <= threshold
    first = int(np.argmax(ok))  # ok is monotone and always true at the end
    return int(values[first])


def count_reads(db, k: int, batch_reads: int = 256,
                max_len: int | None = None) -> KmerCounter:
    """Count all k-mers of every sequence in a SeqDatabase (forward strand
    only, like the reference which counts read strings as stored)."""
    counter = KmerCounter(k)
    n = len(db)
    if n == 0:
        return counter
    order = np.argsort(db.lengths, kind="stable")  # bucket similar lengths
    for s in range(0, n, batch_reads):
        ids = order[s:s + batch_reads]
        cap = int(db.lengths[ids].max()) if max_len is None else max_len
        cap = max(cap, k)
        # round the pad length up to a power of two and the batch up to
        # batch_reads so jit compiles once per bucket, not per batch
        cap = 1 << (cap - 1).bit_length()
        if len(ids) < batch_reads:
            ids = np.pad(ids, (0, batch_reads - len(ids)), mode="edge")
            batch, lens = db.padded_batch(ids, cap)
            lens[len(order) - s:] = 0  # padded rows contribute nothing
        else:
            batch, lens = db.padded_batch(ids, cap)
        counter.add_batch(batch, lens)
    return counter


# --- solid-kmer set file (binary interchange, format-compatible with the
# reference: [size_t k][uint64 codes...], kmer_counter.cpp:87-95) ----------

def write_solid_set(path: str, k: int, codes: np.ndarray) -> None:
    with open(path, "wb") as f:
        np.array([k], dtype=np.uint64).tofile(f)
        codes.astype(np.uint64).tofile(f)


def read_solid_set(path: str) -> tuple[int, np.ndarray]:
    with open(path, "rb") as f:
        k = int(np.fromfile(f, dtype=np.uint64, count=1)[0])
        codes = np.fromfile(f, dtype=np.uint64).astype(np.int64)
    return k, codes
