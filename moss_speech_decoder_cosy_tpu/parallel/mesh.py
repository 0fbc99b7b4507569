"""Mesh / sharding helpers.

The reference's distributed surface is data parallelism (torch DDP /
DeepSpeed ZeRO-2, SURVEY.md §2.11) plus embarrassingly-parallel eval
sharding.  The TPU-native mapping:

- 1-D ``data`` mesh; batches sharded on axis 0, params replicated; XLA
  inserts the gradient psum (the DDP all-reduce) automatically under jit.
- ZeRO-2-style optimizer-state sharding: Adam moments are sharded across
  the data axis on their largest divisible dimension (``zero_sharding``),
  cutting optimizer memory by ~1/n like DeepSpeed stage 2
  (reference train_utils.py:111-114).
- Multi-stream serving: one decode stream per device is batch-sharding of
  the session batch over the same mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def zero_sharding(tree, mesh: Mesh, axis: str = "data"):
    """ZeRO-style sharding spec for an optimizer-state pytree: shard each
    array along its largest dim divisible by the mesh size, else replicate."""
    n = mesh.shape[axis]

    def spec(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = [(d, s) for d, s in enumerate(x.shape) if s % n == 0 and s >= n]
        if not dims:
            return NamedSharding(mesh, P())
        d = max(dims, key=lambda t: t[1])[0]
        parts = [None] * x.ndim
        parts[d] = axis
        return NamedSharding(mesh, P(*parts))

    return jax.tree.map(spec, tree)
