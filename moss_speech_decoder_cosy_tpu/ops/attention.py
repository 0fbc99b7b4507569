"""Attention primitives.

- ``RelPositionMultiHeadedAttention``: Transformer-XL style relative position
  attention with the ESPnet rel-shift, matching the reference
  (cosyvoice/transformer/attention.py:300-470) for the full-window case used
  by the flow encoder (the streaming pipeline re-runs a bounded window each
  hop, so no KV-cache ring is needed on this path).
- ``UNetAttention``: diffusers-style self attention for the flow estimator's
  BasicTransformerBlock (to_q/k/v bias-free, additive bias mask).

Padded/blocked rows are handled safely: masked logits get a large negative
bias and fully-masked rows produce zeros (the reference reaches the same
result via masked_fill after softmax).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

_NEG = -1.0e10


def masked_softmax(scores: jnp.ndarray, mask: Optional[jnp.ndarray]
                   ) -> jnp.ndarray:
    """softmax over the last axis with bool attend-mask; masked rows -> 0."""
    if mask is None:
        return jax.nn.softmax(scores, axis=-1)
    scores = jnp.where(mask, scores, _NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.where(mask, attn, 0.0)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T), ESPnet rel-shift
    (attention.py:330-352 in the reference)."""
    b, h, t, p = x.shape
    zero = jnp.zeros((b, h, t, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1)        # (B,H,T,P+1)
    xp = xp.reshape(b, h, p + 1, t)
    xp = xp[:, :, 1:, :].reshape(b, h, t, p)
    return xp[..., : p // 2 + 1]


class RelPositionMultiHeadedAttention(nn.Module):
    heads: int
    dim: int
    key_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, t, _ = x.shape
        h, dk = self.heads, self.dim // self.heads
        q = nn.Dense(self.dim, name="linear_q")(x).reshape(b, t, h, dk)
        k = nn.Dense(self.dim, use_bias=self.key_bias,
                     name="linear_k")(x).reshape(b, t, h, dk)
        v = nn.Dense(self.dim, name="linear_v")(x).reshape(b, t, h, dk)
        p = nn.Dense(self.dim, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, h, dk).transpose(0, 2, 1, 3)   # (1,H,2T-1,dk)

        init = nn.initializers.xavier_uniform()
        pos_bias_u = self.param("pos_bias_u", init, (h, dk))
        pos_bias_v = self.param("pos_bias_v", init, (h, dk))

        q_u = (q + pos_bias_u[None, None]).transpose(0, 2, 1, 3)
        q_v = (q + pos_bias_v[None, None]).transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 3, 1)                        # (B,H,dk,T)
        matrix_ac = q_u @ kt                                # (B,H,T,T)
        matrix_bd = q_v @ p.transpose(0, 1, 3, 2)           # (B,H,T,P)
        # the reference applies the rel-shift only when the pos table is the
        # espnet 2T-1 flavor (attention.py:323-325 shape check); the wenet
        # 'rel_pos' flavor feeds a length-T table and no shift.
        if matrix_bd.shape[-1] != matrix_ac.shape[-1]:
            matrix_bd = _rel_shift(matrix_bd)
        scores = (matrix_ac + matrix_bd) / jnp.sqrt(jnp.asarray(dk, x.dtype))

        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]                            # (B,1,T,T)
        attn = masked_softmax(scores, mask)
        out = attn @ v.transpose(0, 2, 1, 3)                # (B,H,T,dk)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out)


class UNetAttention(nn.Module):
    """diffusers CrossAttention (self-attention form) used by Matcha's
    BasicTransformerBlock: bias-free q/k/v, additive float bias mask.

    With ``flash_chunk >= 0`` the pallas flash kernel computes attention
    with the analytic chunk-causal mask instead of an explicit bias — use
    only when every position is valid (offline decode)."""

    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_bias: Optional[jnp.ndarray] = None,
                 flash_chunk: int = -1,
                 flash_valid_len: int = -1) -> jnp.ndarray:
        b, t, dim = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)
        q = q.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        if flash_chunk >= 0:
            # (B,H,T,dk) kernel entry; the feature-last variant
            # (flash_chunk_attention_fl) avoids these transposes but its
            # in-kernel per-head loop (dk=64 slices) measured SLOWER
            # end-to-end (38.6 vs 24 ms at T=1500) — see BENCH_NOTES
            from .pallas_attention import flash_chunk_attention
            out = flash_chunk_attention(
                q, k, v, chunk_size=flash_chunk,
                interpret=jax.default_backend() == "cpu",
                valid_len=flash_valid_len if flash_valid_len > 0 else None)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
            return nn.Dense(dim, name="to_out")(out)
        scale = self.head_dim ** -0.5
        scores = (q @ k.transpose(0, 1, 3, 2)) * scale
        if attn_bias is not None:
            if attn_bias.ndim == 3:
                attn_bias = attn_bias[:, None]
            scores = scores + attn_bias
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(dim, name="to_out")(out)
