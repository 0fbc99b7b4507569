"""Whisper ASR head for tokenizer training supervision.

The reference keeps the full Whisper seq2seq around the VQ so the codebook
is trained with ASR cross-entropy (modeling_whisper.py:1614-2777; layers
after quantize_position continue on the quantized hidden states + the
second positional table, :1466).  This module provides the training-time
pieces:

- ``PostVQEncoder``: encoder layers after the VQ over
  ``codebook[ids] + embed_positions2`` (modeling_whisper.py:1466).
- ``WhisperVQDecoder``: standard whisper decoder (learned positions,
  causal self-attn + cross-attn, tied output embedding).
- ``asr_ce_loss``: label cross-entropy with padding mask.

The shipped tokenizer checkpoint is ``quantize_encoder_only``
(config.json:55) — inference never needs this file.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .config import WhisperVQConfig
from .model import WhisperVQEncoderLayer, WhisperAttention
from ..ops.masks import mask_to_bias


class PostVQEncoder(nn.Module):
    """Encoder layers quantize_position..encoder_layers over quantized
    hidden states."""

    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, quantized: jnp.ndarray,
                 token_valid: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        t = quantized.shape[1]
        pos2 = self.param("embed_positions2", nn.initializers.normal(0.02),
                          (c.max_source_positions // c.pooling_kernel_size,
                           c.d_model))
        x = quantized + pos2[None, :t]
        pos = jnp.arange(t)
        if c.causal_attention:
            allow = pos[None, :] <= pos[:, None]
        else:
            blk = max(1, c.quantize_causal_block_size
                      // c.pooling_kernel_size)
            allow = (pos[None, :] // blk) <= (pos[:, None] // blk)
        mask = allow[None] & token_valid[:, None, :]
        bias = mask_to_bias(mask, x.dtype)[:, None]
        for i in range(c.encoder_layers - c.quantize_position):
            x = WhisperVQEncoderLayer(c, name=f"layers_{i}")(x, bias)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


class WhisperDecoderLayer(nn.Module):
    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, x, enc, self_bias, cross_bias):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(c.decoder_attention_heads, c.d_model,
                                 name="self_attn")(h, self_bias)
        h = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")(x)
        attn = WhisperAttention(c.decoder_attention_heads, c.d_model,
                                name="encoder_attn")
        # cross attention: q from decoder, k/v from encoder states
        b, t, _ = h.shape
        dk = c.d_model // c.decoder_attention_heads
        q = attn.q_proj(h) * (dk ** -0.5)
        q = attn._heads(q)
        k = attn._heads(attn.k_proj(enc))
        v = attn._heads(attn.v_proj(enc))
        s = q @ k.transpose(0, 1, 3, 2) + cross_bias
        a = jax.nn.softmax(s, axis=-1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, c.d_model)
        x = x + attn.out_proj(o)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = jax.nn.gelu(nn.Dense(c.decoder_ffn_dim, name="fc1")(h),
                        approximate=False)
        return x + nn.Dense(c.d_model, name="fc2")(h)


class WhisperVQDecoder(nn.Module):
    """Token decoder with tied input/output embedding
    (modeling_whisper.py WhisperVQDecoder)."""

    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, token_valid: jnp.ndarray,
                 enc: jnp.ndarray, enc_valid: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t = tokens.shape
        embed = nn.Embed(c.vocab_size, c.d_model, name="embed_tokens")
        pos = self.param("embed_positions", nn.initializers.normal(0.02),
                         (c.max_target_positions, c.d_model))
        x = embed(tokens) + pos[None, :t]

        ar = jnp.arange(t)
        causal = (ar[None, :] <= ar[:, None])[None] & token_valid[:, None, :]
        self_bias = mask_to_bias(causal, x.dtype)[:, None]
        cross_bias = mask_to_bias(enc_valid[:, None, :], x.dtype)[:, None]
        for i in range(c.decoder_layers):
            x = WhisperDecoderLayer(c, name=f"layers_{i}")(
                x, enc, self_bias, cross_bias)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        return x @ embed.embedding.T                     # tied projection


def asr_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[..., None],
                               axis=-1)[..., 0]
    m = valid.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def greedy_decode(decoder: WhisperVQDecoder, params, enc: jnp.ndarray,
                  enc_valid: jnp.ndarray, bos_id: int, eos_id: int,
                  max_len: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy ASR decoding over the post-VQ encoder states — the inference
    side of the whisper head (generation_whisper.py's core loop, greedy
    path).  Full-prefix recompute per step inside one lax.scan (whisper
    target lengths are short, max_target_positions=448).

    Returns (tokens (B, max_len) i32 padded with eos, lengths (B,))."""
    b = enc.shape[0]

    def apply_step(tokens, n):
        token_valid = jnp.arange(max_len)[None, :] < jnp.maximum(n, 1)[:, None]
        logits = decoder.apply(params, tokens, token_valid, enc, enc_valid)
        idx = jnp.maximum(n - 1, 0)
        last = jnp.take_along_axis(
            logits, idx[:, None, None].repeat(1, axis=1), axis=1)[:, 0]
        return jnp.argmax(last, axis=-1).astype(jnp.int32)

    def body(carry, _):
        tokens, n, done = carry
        nxt = apply_step(tokens, n)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.vmap(lambda t, i, v: t.at[i].set(v))(
            tokens, jnp.minimum(n, max_len - 1), nxt)
        done = done | (nxt == eos_id)
        n = jnp.where(done, n, n + 1)
        return (tokens, n, done), ()

    tokens0 = jnp.full((b, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)
    carry = (tokens0, jnp.ones((b,), jnp.int32),
             jnp.zeros((b,), bool))
    (tokens, n, _), _ = jax.lax.scan(body, carry, None, length=max_len - 1)
    return tokens, n
