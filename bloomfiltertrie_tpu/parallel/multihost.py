"""Multi-host (pod-scale) entry points.

The reference is strictly single-process (SURVEY §2 comm-backend row); this
module is the TPU-pod ingest skeleton it lacks: ``jax.distributed`` process
bootstrap plus deterministic host-side work partitioning, so a v5e-16 pod
builds one prefix-sharded index with every host streaming its own subset of
genome k-mer files (DP over files, TP/EP over the shared sharded index).

Usage (one command per host; degenerate single-process works unchanged):

    from bloomfiltertrie_tpu.parallel import multihost, sharded
    multihost.initialize()                 # no-op when single-process
    mesh = sharded.make_mesh()             # global devices, all hosts
    dbg = sharded.ShardedCDBG(cfg, mesh=mesh)
    for path in multihost.files_for_process(all_files):
        ...parse + dbg.insert_genome(...)

Multi-controller SPMD contract (matters once num_processes > 1):

  * Genome ids must be globally consistent, so every process calls
    ``start_genome`` for every genome (names come from the shared file
    list), and every process must issue the SAME sequence of insert/flush
    dispatches — collectives pair up by program order across processes.
  * A batch argument under a sharded in_spec is read REGION-WISE: each
    process's devices see only the rows of that process's device slice, so
    "owner passes the data, non-owner passes zeros" silently drops the
    rows landing on remote regions.  Instead each process embeds its own
    contribution into its own region with :func:`place_local_batch` (a
    non-contributing process embeds an empty contribution — same shape,
    same dispatch); the effective global batch is the concatenation.

For the common flows use :func:`files_for_process` to split the file list
(owner embeds the whole file, others embed nothing) and
:func:`scatter_batch_slices` to split ONE huge genome across hosts (every
host embeds its slice).  tests/multihost_worker.py is the executable
reference for the full two-process protocol.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> int:
    """Bootstrap multi-process JAX; returns this host's process index.

    With no arguments and no cluster environment this is a safe no-op
    returning 0, so single-host runs need no changes.  On a pod, either pass
    the coordinator explicitly or rely on the TPU environment autodetection
    built into ``jax.distributed.initialize``.
    """
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    # Opt-in cluster detection: BFT_MULTIHOST=1 or an explicit coordinator.
    # (TPU_WORKER_HOSTNAMES alone is NOT used — single-host TPU containers
    # set it too, and jax.distributed.initialize must not run after the
    # backend has initialized.)
    in_cluster = (os.environ.get("BFT_MULTIHOST", "") not in ("", "0")
                  or "COORDINATOR_ADDRESS" in os.environ
                  or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if explicit or in_cluster:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index()


def files_for_process(files: list, process_index: int | None = None,
                      num_processes: int | None = None) -> list:
    """Deterministic round-robin partition of a file list across hosts.

    Round-robin (not block) keeps per-host genome counts within 1 of each
    other when file sizes are comparable — the DP analogue of the
    reference's per-genome loop (src/file_io.c:89).
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if num_processes is None else num_processes
    return files[p::n]


def scatter_batch_slices(n_rows: int, process_index: int | None = None,
                         num_processes: int | None = None) -> slice:
    """Contiguous row range of a global batch owned by this host.

    For feeding ONE huge genome from all hosts at once: each host parses or
    mmaps its slice and inserts it; prefix routing (all_to_all) makes the
    union identical to a single-host insert.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if num_processes is None else num_processes
    per = (n_rows + n - 1) // n
    return slice(p * per, min((p + 1) * per, n_rows))


def host_local_batch(global_batch: np.ndarray,
                     valid: np.ndarray | None = None):
    """Slice a host's rows out of a replicated global batch (DP ingest)."""
    sl = scatter_batch_slices(global_batch.shape[0])
    if valid is None:
        valid = np.ones(global_batch.shape[0], dtype=bool)
    return global_batch[sl], valid[sl]


def place_local_batch(packed: np.ndarray, valid: np.ndarray | None,
                      global_rows: int, process_index: int | None = None,
                      num_processes: int | None = None):
    """Embed this process's contribution into ITS region of a global batch.

    Under a sharded in_spec, each process's devices read only the rows of
    that process's device slice of the [global_rows] batch; rows placed
    anywhere else are invisible to it.  This helper builds the per-process
    view: ``packed`` lands at the start of the caller's region, everything
    else is invalid padding.  Every process calls this (possibly with zero
    rows) so dispatch sequences stay aligned; the effective global batch is
    the concatenation of all processes' contributions.

    Raises if ``packed`` exceeds the region capacity
    (global_rows / num_processes) — raise ``global_rows`` in that case.
    """
    sl = scatter_batch_slices(global_rows, process_index, num_processes)
    cap = sl.stop - sl.start
    m = packed.shape[0]
    if m > cap:
        raise ValueError(
            f"{m} contribution rows exceed this process's region capacity "
            f"{cap}; raise global_rows (>= {m} * num_processes)")
    if valid is None:
        valid = np.ones((m,), dtype=bool)
    out = np.zeros((global_rows,) + packed.shape[1:], dtype=packed.dtype)
    ov = np.zeros((global_rows,), dtype=bool)
    out[sl.start: sl.start + m] = packed
    ov[sl.start: sl.start + m] = valid
    return out, ov
