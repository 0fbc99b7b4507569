"""Export / AOT tooling — the reference's export_jit/export_onnx/TRT build
(cosyvoice/bin/export_jit.py, export_onnx.py, utils/file_utils.py:53-131)
mapped to XLA:

- ``aot_compile``: ahead-of-time compile a jitted function for fixed shapes
  (the TPU-native replacement for a TensorRT engine; compile once at server
  start, dispatch forever).
- ``export_serialized`` / ``load_serialized``: portable StableHLO bytes via
  jax.export — deployable without Python model code.
- ``average_checkpoints``: checkpoint averaging (bin/average_model.py).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax


def aot_compile(fn: Callable, *example_args, static_argnames=()):
    """Returns a compiled executable for the example shapes."""
    jitted = jax.jit(fn, static_argnames=static_argnames)
    return jitted.lower(*example_args).compile()


def export_serialized(fn: Callable, *example_args) -> bytes:
    """Serialize fn for the example shapes to portable bytes."""
    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(*example_args)
    return bytes(exported.serialize())


def load_serialized(data: bytes):
    """Rehydrate an exported function; returns a callable."""
    from jax import export as jexport
    exported = jexport.deserialize(data)
    return exported.call


def average_checkpoints(param_trees: Sequence) -> object:
    """Uniform parameter averaging over checkpoints
    (bin/average_model.py semantics)."""
    n = len(param_trees)
    assert n > 0
    out = param_trees[0]
    for tree in param_trees[1:]:
        out = jax.tree.map(lambda a, b: a + b, out, tree)
    return jax.tree.map(lambda a: a / n, out)
