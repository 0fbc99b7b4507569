"""Multi-host initialization + fleet sharding.

The reference initializes torch.distributed from env vars
(train_utils.py:39-51, backend nccl/gloo).  The TPU-native counterpart:

- ``initialize()``: jax.distributed.initialize from the standard JAX env
  (coordinator address / process id / process count) — collectives then
  ride ICI within a slice and DCN across slices, no backend zoo.
- ``host_shard``: deterministic per-host slicing of a work list (the
  reference's RANK-sharded eval, benchmark_moss_decoder.py:175-189).
- ``global_mesh``: a data mesh over all processes' devices for multi-host
  DP training (per-host batches stacked into a global array with
  ``make_array_from_process_local_data``).

Uneven data across hosts: SPMD programs cannot diverge, so instead of the
reference's monitored-barrier escape (train_utils.py:224-242) we size
epochs to ``min(steps_per_host)`` — fixed-steps-per-epoch by construction
(SURVEY.md §2.11).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize (no-op when single-process / already up).

    Must NOT touch ``jax.process_count()``/``jax.devices()`` before the
    distributed client is up — querying them initializes the local backend
    first, after which distributed init is ineffective.  Idempotency is
    checked against the distributed client state instead.
    """
    if jax._src.distributed.global_state.client is not None:
        return                                          # already initialized
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        pass                                            # single-process run


def host_shard(items: Sequence, process_id: Optional[int] = None,
               process_count: Optional[int] = None) -> list:
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return list(items)[pid::n]


def global_mesh(axis: str = "data") -> Mesh:
    return Mesh(np.array(jax.devices()), (axis,))


def global_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Per-host numpy batch -> globally sharded jax.Array (the multi-host
    dataloader hand-off)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)
