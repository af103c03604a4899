"""Sharded end-to-end alignment step: block-sharded genome index,
data-parallel reads, collective merges.

One jitted step runs, per device:

  1. device-side seeding: each block shard scores its local genome blocks
     against the local read shard (sorted-array k-mer membership), then
     ``all_gather`` over the block axis merges candidate scores and
     diagonals so every shard sees the full candidate table;
  2. window gather + adaptive banded DP extension (data-parallel);
  3. graph accumulation: alignment-anchored k-mer positions scatter-add
     into a node histogram, ``psum``-reduced over the data axis.

This is the multi-chip scaling path the driver dry-runs; the single-chip
pipeline uses the same kernels without the mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..io.seqdb import SeqDatabase
from ..ops.banded_dp import banded_align
from ..ops.kmer import kmer_codes_batch, kmer_codes_np


class BlockIndex(NamedTuple):
    """Genome split into fixed blocks with per-block sorted k-mer codes."""
    blocks: np.ndarray        # (n_blocks, block_len) uint8 codes
    block_lens: np.ndarray    # (n_blocks,) int32
    sorted_codes: np.ndarray  # (n_blocks, idx_len) int32, pad = INT32_MAX
    sorted_pos: np.ndarray    # (n_blocks, idx_len) int32 in-block positions
    k: int
    block_len: int
    overlap: int


def build_block_index(db: SeqDatabase, k: int, block_len: int,
                      overlap: int | None = None) -> BlockIndex:
    """Chop every target sequence into overlapping blocks and index each
    block's k-mers.  Overlap (default one band) keeps alignments near
    block boundaries findable in at least one block."""
    if overlap is None:
        overlap = block_len // 8
    stride = block_len - overlap
    blocks, lens = [], []
    for i in range(len(db)):
        codes = db.get_codes(i)
        for s in range(0, max(len(codes) - overlap, 1), stride):
            piece = codes[s:s + block_len]
            if len(piece) < k:
                continue
            blocks.append((i, s, piece))
            lens.append(len(piece))
    n_blocks = max(len(blocks), 1)
    idx_len = 1
    for _, _, piece in blocks:
        idx_len = max(idx_len, len(piece) - k + 1)
    out_blocks = np.zeros((n_blocks, block_len), np.uint8)
    out_lens = np.zeros(n_blocks, np.int32)
    s_codes = np.full((n_blocks, idx_len), np.iinfo(np.int32).max, np.int32)
    s_pos = np.zeros((n_blocks, idx_len), np.int32)
    for bi, (_, _, piece) in enumerate(blocks):
        out_blocks[bi, :len(piece)] = piece
        out_lens[bi] = len(piece)
        kc = kmer_codes_np(piece, k)
        order = np.argsort(kc, kind="stable")
        s_codes[bi, :len(kc)] = kc[order]
        s_pos[bi, :len(kc)] = order
    return BlockIndex(out_blocks, out_lens, s_codes, s_pos, k, block_len,
                      overlap)


def _seed_score_kernel(q_codes, q_valid, sorted_codes, sorted_pos):
    """Per (read, block): hit count and mean diagonal of k-mer matches.

    q_codes: (B, NK) int32; sorted_codes/pos: (NB, L) — returns
    (B, NB) hits, (B, NB) diag."""

    def per_block(sc, sp):
        def per_read(qc, qv):
            idx = jnp.searchsorted(sc, qc)
            idx_c = jnp.minimum(idx, sc.shape[0] - 1)
            hit = (sc[idx_c] == qc) & qv
            tpos = sp[idx_c]
            qpos = jax.lax.broadcasted_iota(jnp.int32,
                                            (qc.shape[0], 1), 0).squeeze(-1)
            diag = jnp.where(hit, tpos - qpos, 0)
            n = jnp.sum(hit.astype(jnp.int32))
            mean_diag = jnp.where(n > 0, jnp.sum(diag) // jnp.maximum(n, 1),
                                  0)
            return n, mean_diag
        return jax.vmap(per_read)(q_codes, q_valid)

    hits, diag = jax.vmap(per_block)(sorted_codes, sorted_pos)
    return hits.T, diag.T  # (B, NB)


def sharded_align_step(reads, read_lens, blocks, block_lens, sorted_codes,
                       sorted_pos, *, k, W, n_nodes, data_axis="data",
                       block_axis="block"):
    """The per-shard body (wrapped in shard_map by make_sharded_step).

    reads: (B_local, NQ) uint8; blocks/…: local block shard.
    Returns (scores (B_local,), best_block (B_local,),
    node_hist (n_nodes,) psum-reduced over data).
    """
    B, NQ = reads.shape
    q_codes, q_valid = kmer_codes_batch(reads, read_lens, k)

    # 1. local seeding + all-gather over the block axis
    hits, diag = _seed_score_kernel(q_codes, q_valid, sorted_codes,
                                    sorted_pos)
    all_hits = jax.lax.all_gather(hits, block_axis, axis=1, tiled=True)
    all_diag = jax.lax.all_gather(diag, block_axis, axis=1, tiled=True)
    all_blocks = jax.lax.all_gather(blocks, block_axis, axis=0, tiled=True)
    all_block_lens = jax.lax.all_gather(block_lens, block_axis, axis=0,
                                        tiled=True)

    # 2. best candidate per read -> window + banded extension
    best_block = jnp.argmax(all_hits, axis=1).astype(jnp.int32)
    c0 = jnp.take_along_axis(all_diag, best_block[:, None],
                             axis=1).squeeze(1)
    t = all_blocks[best_block]
    tlen = all_block_lens[best_block]
    res = banded_align(reads, read_lens, t, tlen, c0, W=W)

    # 3. graph accumulation: solid-node histogram of aligned reads,
    # reduced over the data axis
    aligned = res.score > 0
    node_ids = jnp.where(q_valid & aligned[:, None],
                         q_codes % n_nodes, n_nodes)
    hist = jnp.zeros(n_nodes + 1, jnp.int32).at[node_ids.reshape(-1)].add(
        1, mode="drop")[:n_nodes]
    hist = jax.lax.psum(hist, data_axis)
    return res.score, best_block, hist


def make_sharded_step(mesh, *, k, W, n_nodes, data_axis="data",
                      block_axis="block"):
    """jit(shard_map(...)) over the mesh with the production shardings:
    reads data-parallel, index block-sharded, node histogram replicated."""
    body = functools.partial(sharded_align_step, k=k, W=W, n_nodes=n_nodes,
                             data_axis=data_axis, block_axis=block_axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(data_axis, None), P(data_axis),
                  P(block_axis, None), P(block_axis),
                  P(block_axis, None), P(block_axis, None)),
        out_specs=(P(data_axis), P(data_axis), P()),
        check_vma=False)
    return jax.jit(fn)
