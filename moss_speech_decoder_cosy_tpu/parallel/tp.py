"""Tensor parallelism for the speech LM: megatron-style parameter
PartitionSpecs over a 2-D ``(data, model)`` mesh, collectives inserted by
GSPMD.

The reference scales its LM with vLLM's tensor parallelism
(cosyvoice/cli/model.py `vllm` role; NCCL all-reduces inside fused
megatron layers).  The TPU-native equivalent is *declarative*: annotate
each weight with a `PartitionSpec` and let GSPMD partition every matmul
and insert the ICI all-reduces — no hand-written collectives, the same
jitted train/serve programs run unchanged.

Layout (the standard megatron split, one all-reduce per block):

- attention: q/k/v projections column-parallel (heads split across
  ``model``), o_proj row-parallel (contraction sharded -> psum);
- MLP: gate/up column-parallel, down row-parallel (-> psum);
- embeddings / norms / small heads: replicated (cheap, and vocab dims
  here are not generally divisible);
- any dim not divisible by the model-axis size falls back to replicated
  (e.g. GQA k/v heads when ``num_kv_heads < tp``) — correctness never
  depends on the mesh shape.

Use: ``mesh = make_tp_mesh(8, tp=2)`` then
``params = tp_shard_params(params, mesh)`` and jit as usual with batches
sharded on ``data``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel Dense modules: kernel (in, out) -> split out dim.
# Covers the Qwen2 backbone (q/k/v/gate/up), the wenet conformer stack of
# TransformerLM / the flow encoder (linear_q/k/v/pos, FF w_1), and the
# diffusers attention (to_q/k/v).
_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj",
        "linear_q", "linear_k", "linear_v", "linear_pos", "w_1",
        "to_q", "to_k", "to_v")
# row-parallel Dense modules: kernel (in, out) -> split in dim (psum after)
_ROW = ("o_proj", "down_proj", "linear_out", "w_2", "to_out")


def make_tp_mesh(n_devices: Optional[int] = None, tp: int = 2,
                 data_axis: str = "data",
                 model_axis: str = "model") -> Mesh:
    """2-D ``(data, model)`` mesh: DP outer (DCN-friendly), TP inner
    (adjacent devices -> ICI)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % tp == 0, (n, tp)
    return Mesh(np.array(devs).reshape(n // tp, tp),
                (data_axis, model_axis))


def _spec_for(path, x, tp: int, model_axis: str) -> P:
    names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
    # Match only the module that OWNS the leaf (second-to-last component,
    # the Dense scope holding kernel/bias) — scanning the whole path would
    # mis-spec every descendant of a container whose name collides with a
    # rule (e.g. a block named "linear_out").
    mod = names[-2] if len(names) >= 2 and names[-2] in _COL + _ROW else None
    leaf = names[-1] if names else ""
    if mod is None or x.ndim == 0:
        return P()
    if mod in _COL:
        if leaf == "kernel" and x.shape[-1] % tp == 0:
            return P(*([None] * (x.ndim - 1) + [model_axis]))
        if leaf == "bias" and x.shape[0] % tp == 0:
            return P(model_axis)
        return P()
    # row-parallel: split the contraction (first) dim; bias replicated
    # (added once after the psum)
    if leaf == "kernel" and x.shape[0] % tp == 0:
        return P(*([model_axis] + [None] * (x.ndim - 1)))
    return P()


def tp_specs(params, mesh: Mesh, model_axis: str = "model"):
    """PartitionSpec pytree for an LM parameter tree (Qwen2SpeechLM,
    Qwen2Model, or TransformerLM-style trees — matching is by module
    name, unknown modules replicate)."""
    tp = mesh.shape[model_axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(
            mesh, _spec_for(path, x, tp, model_axis)), params)


def tp_shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place an LM parameter tree onto the mesh with megatron TP specs."""
    return jax.device_put(params, tp_specs(params, mesh, model_axis))
