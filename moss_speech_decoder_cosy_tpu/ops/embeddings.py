"""Positional / timestep embeddings.

- ``espnet_rel_pos``: the ESPnet relative positional encoding used by the
  flow conformer encoder (reference transformer/embedding.py:201-292).
- ``SinusoidalPosEmb`` + ``TimestepEmbedding``: the Matcha/diffusers time
  embedding of the flow estimator U-Net (matcha components/decoder.py; used
  at cosyvoice/flow/decoder.py:318-324).
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


@functools.lru_cache(maxsize=None)
def _rel_pe_table(d_model: int, max_len: int) -> np.ndarray:
    """Full (2*max_len-1, d_model) table: positive positions flipped, then
    negative positions, exactly as EspnetRelPositionalEncoding.extend_pe."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((max_len, d_model))
    pe_neg = np.zeros((max_len, d_model))
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return pe.astype(np.float32)


def espnet_rel_pos(size: int, d_model: int) -> jnp.ndarray:
    """Relative positional embedding (1, 2*size-1, d_model) for query len
    ``size`` (relative offsets size-1 .. -(size-1)).

    This is the ``rel_pos_espnet`` flavor (embedding.py:201-292); the
    attention applies the rel-shift because the table is 2T-1 long."""
    table = _rel_pe_table(d_model, max(size, 16))
    center = table.shape[0] // 2
    return jnp.asarray(table[center - size + 1: center + size])[None]


@functools.lru_cache(maxsize=None)
def _abs_pe_table(d_model: int, max_len: int) -> np.ndarray:
    """Standard sinusoid table pe[pos] (wenet PositionalEncoding,
    reference transformer/embedding.py:49-57)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe.astype(np.float32)


def wenet_rel_pos(size: int, d_model: int, offset: int = 0) -> jnp.ndarray:
    """The ``rel_pos`` flavor used by the CosyVoice2/MOSS encoders
    (class_utils.py:64 -> wenet RelPositionalEncoding): pe[offset:offset+T],
    length T — the attention then skips the rel-shift because
    matrix_bd already matches matrix_ac's shape (attention.py:324-325)."""
    table = _abs_pe_table(d_model, max(size + offset, 16))
    return jnp.asarray(table[offset: offset + size])[None]


class SinusoidalPosEmb(nn.Module):
    """Matcha SinusoidalPosEmb: t (B,) -> (B, dim), with scale 1000."""

    dim: int
    scale: float = 1000.0

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        emb = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))
        emb = self.scale * t[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """diffusers TimestepEmbedding: Linear -> silu -> Linear."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, name="linear_1")(t_emb)
        h = jax.nn.silu(h)
        return nn.Dense(self.time_embed_dim, name="linear_2")(h)
