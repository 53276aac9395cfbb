"""Multi-host (multi-process) SPMD helpers.

The reference is strictly single-process (SURVEY.md §2.3: no NCCL/MPI/
Gloo anywhere); scaling there meant nothing.  Here the story is the
standard JAX one — ``jax.distributed.initialize`` connects the hosts, the
(data, model) mesh from :mod:`audio_training_tpu.parallel.mesh` spans ALL
hosts' devices, and XLA's collectives ride ICI within a slice / DCN across
slices.  No custom transport layer exists or is needed.

Per-host data loading: each host streams its own shard files (the shard
lists from ``corpus.writer`` are deterministic, so ``shard_files[i::P]``
partitions cleanly) and contributes its local slice of the global batch via
:func:`global_batch_from_local`.
"""

from __future__ import annotations

import logging
import os

import jax
from jax.sharding import Mesh

from audio_training_tpu.parallel.mesh import batch_sharding

log = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Connect this process to the JAX distributed runtime.

    On TPU pods the arguments auto-detect from the environment; elsewhere
    pass them explicitly (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID).  Returns True when a multi-process runtime is up,
    False for the single-process case (a no-op, so all code paths can call
    this unconditionally).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return False  # single process
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        log.debug("jax.distributed.initialize: %s", e)
    return jax.process_count() > 1


def process_shard(items: list, process_index: int | None = None,
                  process_count: int | None = None) -> list:
    """This host's slice of a deterministic work list (e.g. record shard
    files): ``items[i::P]``."""
    i = process_index if process_index is not None else jax.process_index()
    p = process_count if process_count is not None else jax.process_count()
    return list(items)[i::p]


def global_batch_from_local(mesh: Mesh, *arrays):
    """Assemble global batch-sharded arrays from each host's LOCAL slice.

    Every host passes its own ``global_batch / process_count`` rows; the
    result behaves exactly like :func:`parallel.mesh.shard_batch` output
    but works when no single host holds the full batch.  Uses
    ``jax.make_array_from_process_local_data`` so XLA knows the pieces
    already sit on the right hosts (no cross-host gather).
    """
    s = batch_sharding(mesh)
    out = tuple(
        jax.make_array_from_process_local_data(s, a) for a in arrays
    )
    return out if len(out) > 1 else out[0]
