"""FLOPs accounting + MFU (model FLOPs utilization).

The reference reports RTF only (cal_RTF.py:349-421).  RTF alone cannot
say whether an engine is fast or merely under an easy target, so the
bench here also reports MFU = delivered FLOPs/s over the chip's peak.

FLOPs come from XLA's own cost analysis of the COMPILED programs the
engines execute (``Compiled.cost_analysis()['flops']``) — exact for the
program as optimized, with fusion and algebraic simplification applied,
rather than a hand-derived formula that drifts from the code.  Lowering
an already-warm jitted function is cheap (the executable comes from the
in-memory/persistent compile cache).
"""

from __future__ import annotations

from typing import Optional

import jax


def compiled_flops(jit_fn, *args, **kwargs) -> float:
    """FLOPs of the XLA program ``jit_fn(*args, **kwargs)`` runs.

    ``args`` may be concrete arrays or ShapeDtypeStructs; static kwargs
    select the program variant.  Returns 0.0 when the backend publishes
    no cost model (never on TPU/CPU)."""
    compiled = jit_fn.lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


class DispatchMeter:
    """Records every jitted dispatch (program key + one exemplar of its
    concrete arguments) so a bench can replay XLA cost analysis over the
    EXACT executed sequence — the aggregate-MFU counterpart of the
    single-stream ``program_flops`` replays (the role of the reference's
    cal_RTF.py:349-421 protocol, upgraded with FLOPs accounting).

    Usage: wrap each jitted callable once (``fn = meter.wrap(name, fn)``);
    the wrapper is a no-op passthrough until ``enabled`` is set.  After a
    metered run, ``total_flops()`` sums count x compiled FLOPs per unique
    program signature (signature = static kwarg values + every array
    leaf's shape/dtype, so shape-polymorphic call sites split correctly).
    Lowering warm programs hits the compile cache."""

    def __init__(self):
        self.enabled = False
        self._records = {}          # key -> [count, fn, args, kwargs]

    def reset(self):
        self._records.clear()

    def wrap(self, name: str, fn):
        def wrapped(*args, **kwargs):
            if self.enabled:
                self._note(name, fn, args, kwargs)
            return fn(*args, **kwargs)
        # keep the jit introspection surface (serving/boot's
        # no-new-compiles check reads _cache_size; AOT users read lower)
        wrapped._wrapped_jit = fn
        for attr in ("_cache_size", "lower", "clear_cache"):
            if hasattr(fn, attr):
                setattr(wrapped, attr, getattr(fn, attr))
        return wrapped

    def _note(self, name, fn, args, kwargs):
        leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
        sig = tuple((a.shape, str(a.dtype)) if hasattr(a, "shape")
                    else repr(a) for a in leaves)
        key = (name, str(treedef), sig)
        rec = self._records.get(key)
        if rec is None:
            # store ShapeDtypeStructs, not the arrays — an exemplar of
            # the live pool pytrees would pin hundreds of MB of HBM
            structs = [jax.ShapeDtypeStruct(a.shape, a.dtype)
                       if hasattr(a, "shape") else a for a in leaves]
            s_args, s_kwargs = jax.tree_util.tree_unflatten(treedef,
                                                            structs)
            self._records[key] = [1, fn, s_args, s_kwargs]
        else:
            rec[0] += 1

    def total_flops(self) -> float:
        return sum(count * compiled_flops(fn, *args, **kwargs)
                   for count, fn, args, kwargs in self._records.values())

    def dispatches(self) -> int:
        return sum(rec[0] for rec in self._records.values())


# Peak dense matmul throughput per chip, FLOP/s.  bf16 numbers from the
# public TPU spec sheets; f32 runs through the same MXU passes at ~1/2.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,          # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,               # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,          # v6e / Trillium
    "TPU v6e": 918e12,
}


def chip_peak_flops(device=None, dtype: str = "bfloat16"
                    ) -> Optional[float]:
    """Peak FLOP/s of one chip, or None when unknown (e.g. CPU)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "")
    matches = [(len(name), val) for name, val in _PEAK_BF16.items()
               if kind.startswith(name)]
    if not matches:
        return None
    peak = max(matches)[1]                  # longest prefix wins
    if dtype in ("float32", "f32"):
        return peak / 2
    return peak


def mfu(total_flops: float, seconds: float, device=None,
        dtype: str = "bfloat16") -> Optional[float]:
    """Delivered FLOPs/s over chip peak; None when the peak is unknown."""
    peak = chip_peak_flops(device, dtype)
    if peak is None or seconds <= 0:
        return None
    return total_flops / seconds / peak
