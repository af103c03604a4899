"""Multi-host orchestration: jax.distributed init + host-level data
sharding.

The reference is single-node (SURVEY.md §2.6 — std::thread only); the
TPU-native scaling model adds a host dimension (SURVEY.md §5
"Distributed communication backend"):

  * every host calls :func:`init_distributed` once (coordinator
    address/rank from args or the standard cluster env vars JAX already
    auto-detects);
  * input reads are sharded BY HOST with :func:`host_shard` — each host
    reads only its slice of the FASTQ (the multi-host replacement for
    the reference's per-group directory splitting);
  * per-host alignment/graph partials are merged with the collective
    helpers in parallel/sharded.py (all_gather/psum over the global
    mesh, ICI within a host, DCN across hosts).

Single-host runs skip all of this: every helper degrades to a no-op
when jax.process_count() == 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed (idempotent; no-op if single-host).

    With no arguments JAX auto-detects cluster environments (GKE/GCE TPU
    pods, SLURM, Open MPI).  Returns the process id."""
    import jax
    if num_processes is not None and num_processes <= 1:
        return 0
    try:
        if coordinator_address is not None or num_processes is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # already initialized, or no cluster environment detected
        pass
    return jax.process_index()


def host_shard(n_items: int, process_id: Optional[int] = None,
               num_processes: Optional[int] = None) -> slice:
    """The contiguous slice of a length-n work list owned by this host.

    Hosts get near-equal contiguous slices (first ``n % p`` hosts get one
    extra), so a FASTQ can be streamed once per host with skip/stop
    bounds instead of a full parse."""
    import jax
    p = num_processes if num_processes is not None else jax.process_count()
    i = process_id if process_id is not None else jax.process_index()
    if p <= 1:
        return slice(0, n_items)
    base, extra = divmod(n_items, p)
    start = i * base + min(i, extra)
    stop = start + base + (1 if i < extra else 0)
    return slice(start, stop)


def host_shard_ids(n_items: int, process_id: Optional[int] = None,
                   num_processes: Optional[int] = None) -> np.ndarray:
    """host_shard as an index array (for fancy-indexed databases)."""
    s = host_shard(n_items, process_id, num_processes)
    return np.arange(s.start, s.stop, dtype=np.int64)


def gather_host_bytes(data: bytes) -> list:
    """All-gather one bytes blob per host -> list of every host's blob
    (process order).  Single-host: [data].  Pads to the max length and
    rides jax.experimental.multihost_utils.process_allgather."""
    import jax
    if jax.process_count() <= 1:
        return [data]
    from jax.experimental import multihost_utils
    n = np.array([len(data)], np.int64)
    sizes = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    m = max(int(sizes.max()), 1)
    arr = np.zeros(m, np.uint8)
    arr[:len(data)] = np.frombuffer(data, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    gathered = gathered.reshape(len(sizes), m)
    return [gathered[p, :int(sizes[p])].tobytes()
            for p in range(len(sizes))]


def gather_alignments(alns) -> "AlignmentSet":
    """Merge per-host AlignmentSets across hosts (process order, so the
    result is deterministic).  Single-host: identity.

    The interchange is the 3-line .ref text itself — the same format the
    stages already persist, so serialization is one code path
    (align/records.py)."""
    import jax
    if jax.process_count() <= 1:
        return alns
    from ..align.records import AlignmentSet
    blobs = gather_host_bytes(alns.to_ref_text().encode())
    out = AlignmentSet()
    for blob in blobs:
        for a in AlignmentSet.from_ref_text(blob.decode()):
            out.append(a)
    return out


def is_coordinator() -> bool:
    import jax
    return jax.process_index() == 0


def barrier(name: str) -> None:
    """Cross-host sync point (no-op single-host): coordinator-written
    stage files are visible before other hosts read them."""
    import jax
    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def merge_host_counts(local_codes: np.ndarray, local_counts: np.ndarray,
                      k: int):
    """Merge per-host sparse k-mer counts into the global solid-set input
    using a psum over a dense device table when it fits, else a host
    gather.  Single-host: identity."""
    import jax
    if jax.process_count() <= 1:
        return local_codes, local_counts
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    size = 1 << (2 * k)
    if size <= (1 << 26):
        # dense path: scatter local counts, psum across the global mesh
        mesh = jax.sharding.Mesh(np.array(jax.devices()), ("d",))
        dense = jnp.zeros(size, jnp.int32).at[local_codes].add(
            local_counts.astype(jnp.int32))

        def reduce_fn(x):
            return jax.lax.psum(x, "d")

        out = jax.jit(jax.shard_map(reduce_fn, mesh=mesh, in_specs=P(),
                                    out_specs=P(), check_vma=False))(dense)
        arr = np.asarray(out)
        codes = np.flatnonzero(arr)
        return codes.astype(np.int64), arr[codes].astype(np.int64)
    # sparse fallback: all-gather via process_allgather
    from jax.experimental import multihost_utils
    all_codes = multihost_utils.process_allgather(local_codes)
    all_counts = multihost_utils.process_allgather(local_counts)
    from ..ops.kmer import _merge_counts
    codes = np.zeros(0, np.int64)
    counts = np.zeros(0, np.int64)
    for c, n in zip(all_codes, all_counts):
        codes, counts = _merge_counts(codes, counts, np.asarray(c),
                                      np.asarray(n))
    return codes, counts
