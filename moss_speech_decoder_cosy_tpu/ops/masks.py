"""Mask algebra for chunked / streaming attention.

Semantics follow the wenet-style mask utilities used by the reference
(``GLM_modules/cosyvoice/utils/mask.py``) but are written for XLA: every
function is shape-static and jit-friendly (no data-dependent python control
flow), and masks are boolean with ``True == attend / valid``.

Reference behaviors reproduced:
- ``make_pad_mask`` / ``~make_pad_mask``  (mask.py:85ff) -> ``valid_mask``.
- ``subsequent_chunk_mask``               (mask.py:127-158).
- ``add_optional_chunk_mask`` with static chunk size and the streaming
  full-left-context variant used by the flow estimator
  (cosyvoice/flow/decoder.py:440-441 passes num_left_chunks=-1).
- ``mask_to_bias``                        (cosyvoice/utils/common.py:160-168).
"""

from __future__ import annotations

import jax.numpy as jnp


def valid_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> bool (B, max_len), True where position < length.

    Equivalent to the reference's ``~make_pad_mask(lengths, max_len)``.
    """
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def subsequent_mask(size: int) -> jnp.ndarray:
    """Causal lower-triangular bool mask (size, size)."""
    a = jnp.arange(size)
    return a[None, :] <= a[:, None]


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jnp.ndarray:
    """Chunk-causal bool mask (size, size) for streaming encoders.

    Row i may attend to columns [start, (i//chunk + 1) * chunk) where start is
    0 for full left context (num_left_chunks < 0) else
    ``max(0, (i//chunk - num_left_chunks) * chunk)``.
    Mirrors mask.py:127-158 of the reference.
    """
    idx = jnp.arange(size)
    chunk_idx = idx // chunk_size
    ending = (chunk_idx + 1) * chunk_size
    allow = idx[None, :] < ending[:, None]
    if num_left_chunks >= 0:
        start = jnp.maximum((chunk_idx - num_left_chunks) * chunk_size, 0)
        allow = allow & (idx[None, :] >= start[:, None])
    return allow


def chunk_attention_mask(valid: jnp.ndarray, static_chunk_size: int,
                         num_left_chunks: int = -1) -> jnp.ndarray:
    """Combine a padding valid-mask with an optional chunk mask.

    Args:
      valid: bool (B, T), True = real token.
      static_chunk_size: 0 -> full (non-streaming) attention; >0 -> chunked.
      num_left_chunks: -1 = all left context (reference flow estimator /
        encoder always use -1 here; see upsample_encoder.py:286,299).

    Returns:
      bool (B, T, T) attention mask, True = attend.  Matches the reference's
      ``add_optional_chunk_mask(..., use_dynamic=False, static_chunk_size,
      -1)`` composed with the key padding mask.
    """
    b, t = valid.shape
    key_ok = valid[:, None, :]                       # (B, 1, T)
    if static_chunk_size > 0:
        chunk = subsequent_chunk_mask(t, static_chunk_size, num_left_chunks)
        return key_ok & chunk[None, :, :]
    return jnp.broadcast_to(key_ok, (b, t, t))


def banded_chunk_mask(bounds, size: int, ring: int) -> jnp.ndarray:
    """Banded chunk-causal mask for the KV-cached streaming flow path.

    ``bounds`` are the (static python) chunk end positions, e.g.
    ``[prompt, prompt+hop, ...]``; the final bound may be < ``size`` (the
    tail belongs to the last chunk).  Query i in chunk c attends to keys in
    ``[cstart(c) - ring, cend(c))`` — its own chunk plus the ``ring`` frames
    immediately before it.  An incremental decode with a ``ring``-slot KV
    cache is exactly equivalent to one forward with this mask (the KV-mode
    deviation from the reference's windowed re-decode, see
    models/flow/kv_stream.py).
    """
    import numpy as np
    bounds = list(bounds)
    if not bounds or bounds[-1] < size:
        bounds = bounds + [size]
    cstart = np.zeros(size, np.int64)
    cend = np.zeros(size, np.int64)
    lo = 0
    for hi in bounds:
        hi = min(hi, size)
        cstart[lo:hi] = lo
        cend[lo:hi] = hi
        lo = hi
        if lo >= size:
            break
    idx = np.arange(size)
    allow = (idx[None, :] < cend[:, None]) & (
        idx[None, :] >= cstart[:, None] - ring)
    return jnp.asarray(allow)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool attend-mask -> additive attention bias (0 where attend, -1e10 else).

    Same constant as the reference (common.py:167) so logits saturate
    identically in fp32/bf16.
    """
    return (1.0 - mask.astype(dtype)) * jnp.asarray(-1.0e10, dtype)
