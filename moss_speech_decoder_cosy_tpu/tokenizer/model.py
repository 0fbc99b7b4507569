"""WhisperVQ speech tokenizer: 16 kHz log-mel -> discrete tokens @ 12.5 Hz.

TPU-native rebuild of the reference WhisperVQEncoder inference paths
(speech_tokenizer/modeling_whisper.py):

- batch ``__call__``   <- forward (modeling_whisper.py:1271-1486): causal
  convs (k3 s1, k3 s2) + learned positions + N pre-LN causal attention
  layers; avg-pool k4 then nearest-codebook VQ after layer
  ``quantize_position`` (:1378-1464).
- streaming ``step``   <- forward_causal (:1488-1610): explicit conv caches
  and per-layer KV caches.  Here the KV cache is a STATIC ring buffer of
  ``max_source_positions`` with a position counter, so every chunk is the
  same compiled shape (the reference grows torch tensors instead).

Only the pre-VQ stack is implemented — it is the entire tokens hot path;
the post-VQ half of the whisper encoder (ASR/seq2seq head) is out of the
decode loop (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import flax.linen as nn

from .config import WhisperVQConfig
from ..ops.convs import Conv1d
from ..ops.masks import mask_to_bias

_NEG = -1.0e10


@flax.struct.dataclass
class TokenizerStreamState:
    conv1_cache: jnp.ndarray     # (B, 2, n_mels)
    conv2_cache: jnp.ndarray     # (B, 2, d_model)
    k_cache: jnp.ndarray         # (L, B, H, max_pos, dk)
    v_cache: jnp.ndarray         # (L, B, H, max_pos, dk)
    pos: jnp.ndarray             # () int32: cached positions so far


class WhisperAttention(nn.Module):
    """Whisper self-attention: q/v/out with bias, k without; q pre-scaled."""

    heads: int
    dim: int

    def setup(self):
        self.q_proj = nn.Dense(self.dim, name="q_proj")
        self.k_proj = nn.Dense(self.dim, use_bias=False, name="k_proj")
        self.v_proj = nn.Dense(self.dim, name="v_proj")
        self.out_proj = nn.Dense(self.dim, name="out_proj")

    def _heads(self, y):
        b, t, _ = y.shape
        h, dk = self.heads, self.dim // self.heads
        return y.reshape(b, t, h, dk).transpose(0, 2, 1, 3)

    def qkv(self, x):
        dk = self.dim // self.heads
        q = self.q_proj(x) * (dk ** -0.5)
        return self._heads(q), self._heads(self.k_proj(x)), \
            self._heads(self.v_proj(x))

    def __call__(self, x: jnp.ndarray, bias: Optional[jnp.ndarray],
                 kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> jnp.ndarray:
        """bias: additive (B, 1, Tq, Tk) or None.  kv overrides keys/values
        (already in head layout) for streaming."""
        b, t, _ = x.shape
        if kv is not None:
            dk = self.dim // self.heads
            q = self._heads(self.q_proj(x) * (dk ** -0.5))
            k, v = kv
        else:
            q, k, v = self.qkv(x)
        scores = q @ k.transpose(0, 1, 3, 2)
        if bias is not None:
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        return self.out_proj(out)


class WhisperVQEncoderLayer(nn.Module):
    """Pre-LN attention + FFN (modeling_whisper.py:733-793)."""

    cfg: WhisperVQConfig

    def setup(self):
        c = self.cfg
        self.self_attn_layer_norm = nn.LayerNorm(
            epsilon=1e-5, name="self_attn_layer_norm")
        self.self_attn = WhisperAttention(c.attention_heads, c.d_model,
                                          name="self_attn")
        self.final_layer_norm = nn.LayerNorm(
            epsilon=1e-5, name="final_layer_norm")
        self.fc1 = nn.Dense(c.ffn_dim, name="fc1")
        self.fc2 = nn.Dense(c.d_model, name="fc2")

    def __call__(self, x, bias, kv=None):
        h = self.self_attn_layer_norm(x)
        x = x + self.self_attn(h, bias, kv)
        h = self.final_layer_norm(x)
        h = jax.nn.gelu(self.fc1(h), approximate=False)
        x = x + self.fc2(h)
        return x

    def streaming_kv(self, x):
        """Project the chunk's k/v (head layout) for cache insertion."""
        _, k, v = self.self_attn.qkv(self.self_attn_layer_norm(x))
        return k, v


class WhisperVQEncoder(nn.Module):
    cfg: WhisperVQConfig

    def setup(self):
        c = self.cfg
        self.conv1 = Conv1d(c.d_model, 3, name="conv1")
        self.conv2 = Conv1d(c.d_model, 3, stride=2, name="conv2")
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (c.max_source_positions, c.d_model))
        self.layers = [WhisperVQEncoderLayer(c, name=f"layers_{i}")
                       for i in range(c.quantize_position)]
        self.codebook = self.param(
            "codebook", nn.initializers.normal(0.02),
            (c.quantize_vocab_size, c.d_model))

    # ------------------------------------------------------------- shared
    def _convs(self, mel: jnp.ndarray,
               conv1_cache: Optional[jnp.ndarray] = None,
               conv2_cache: Optional[jnp.ndarray] = None):
        """mel (B, T, n_mels) -> (B, T//2, d); optional streaming caches of
        the last 2 input frames per conv (modeling_whisper.py:131-156)."""
        if conv1_cache is None:
            x = jnp.pad(mel, ((0, 0), (2, 0), (0, 0)))
        else:
            x = jnp.concatenate([conv1_cache, mel], axis=1)
        new_c1 = x[:, -2:]
        x = jax.nn.gelu(self.conv1(x), approximate=False)
        if conv2_cache is None:
            x2 = jnp.pad(x, ((0, 0), (2, 0), (0, 0)))
        else:
            x2 = jnp.concatenate([conv2_cache, x], axis=1)
        new_c2 = x2[:, -2:]
        x = jax.nn.gelu(self.conv2(x2), approximate=False)
        return x, new_c1, new_c2

    def _pool_and_quantize(self, x: jnp.ndarray, valid: jnp.ndarray):
        k = self.cfg.pooling_kernel_size
        b, t, d = x.shape
        pad = (-t) % k
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        x = x.reshape(b, -1, k, d).mean(axis=2)
        token_valid = valid[:, ::k]
        # nearest codebook by L2 (modeling_whisper.py:77-92)
        x2 = jnp.sum(x * x, axis=-1, keepdims=True)
        c2 = jnp.sum(self.codebook * self.codebook, axis=-1)
        dist = x2 + c2[None, None, :] - 2.0 * jnp.einsum(
            "btd,vd->btv", x, self.codebook)
        ids = jnp.argmin(dist, axis=-1)
        return ids, token_valid, x

    # -------------------------------------------------------------- batch
    def __call__(self, mel: jnp.ndarray, valid: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """mel (B, T, n_mels), valid (B, T) -> (token_ids (B, ceil(T/8)),
        token_valid)."""
        c = self.cfg
        x, _, _ = self._convs(mel)
        t2 = x.shape[1]
        x = x + self.embed_positions[None, :t2]
        valid2 = valid[:, ::2]

        pos = jnp.arange(t2)
        if c.causal_attention:
            allow = pos[None, :] <= pos[:, None]
        else:
            blk = c.quantize_causal_block_size
            allow = (pos[None, :] // blk) <= (pos[:, None] // blk)
        mask = allow[None] & valid2[:, None, :]
        bias = mask_to_bias(mask, x.dtype)[:, None]
        for layer in self.layers:
            x = layer(x, bias)
        ids, token_valid, _ = self._pool_and_quantize(x, valid2)
        return ids, token_valid

    # ------------------------------------------------------------- train
    def encode_train(self, mel: jnp.ndarray, valid: jnp.ndarray,
                     codebook: jnp.ndarray):
        """Training forward up to (and through) the VQ with a straight-
        through estimator (modeling_whisper.py:1391-1464): returns
        (hidden_pre_vq (B,Tt,D), quantized_st (B,Tt,D), ids, token_valid).

        ``codebook`` is the TRAINING codebook (training/vq.VQTrainState) —
        the module's own codebook param is inference-only; pass
        ``state.codebook`` here so EMA updates take effect immediately."""
        c = self.cfg
        x, _, _ = self._convs(mel)
        t2 = x.shape[1]
        x = x + self.embed_positions[None, :t2]
        valid2 = valid[:, ::2]
        pos = jnp.arange(t2)
        if c.causal_attention:
            allow = pos[None, :] <= pos[:, None]
        else:
            blk = c.quantize_causal_block_size
            allow = (pos[None, :] // blk) <= (pos[:, None] // blk)
        mask = allow[None] & valid2[:, None, :]
        bias = mask_to_bias(mask, x.dtype)[:, None]
        for layer in self.layers:
            x = layer(x, bias)
        k = c.pooling_kernel_size
        b, t, d = x.shape
        pad = (-t) % k
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            valid2 = jnp.pad(valid2, ((0, 0), (0, pad)))
        hidden = x.reshape(b, -1, k, d).mean(axis=2)
        token_valid = valid2[:, ::k]
        x2 = jnp.sum(hidden * hidden, axis=-1, keepdims=True)
        c2 = jnp.sum(codebook * codebook, axis=-1)
        dist = x2 + c2[None, None, :] - 2.0 * jnp.einsum(
            "btd,vd->btv", hidden, codebook)
        ids = jnp.argmin(dist, axis=-1)
        quantized = jnp.take(codebook, ids, axis=0)
        quantized_st = hidden + jax.lax.stop_gradient(quantized - hidden)
        return hidden, quantized_st, ids, token_valid

    # ---------------------------------------------------------- streaming
    def init_state(self, batch_size: int = 1) -> TokenizerStreamState:
        c = self.cfg
        return TokenizerStreamState(
            conv1_cache=jnp.zeros((batch_size, 2, c.num_mel_bins)),
            conv2_cache=jnp.zeros((batch_size, 2, c.d_model)),
            k_cache=jnp.zeros((c.quantize_position, batch_size,
                               c.attention_heads, c.max_source_positions,
                               c.head_dim)),
            v_cache=jnp.zeros((c.quantize_position, batch_size,
                               c.attention_heads, c.max_source_positions,
                               c.head_dim)),
            pos=jnp.zeros((), jnp.int32),
        )

    def step(self, mel_chunk: jnp.ndarray, state: TokenizerStreamState
             ) -> Tuple[jnp.ndarray, TokenizerStreamState]:
        """mel_chunk (B, S, n_mels) with S a multiple of
        2*pooling_kernel_size (8 frames = 80 ms) -> (token_ids (B, S//8),
        new state).  Matches forward_causal (modeling_whisper.py:1488-1610)
        with static-shape KV ring buffers."""
        c = self.cfg
        x, c1, c2 = self._convs(mel_chunk, state.conv1_cache,
                                state.conv2_cache)
        s2 = x.shape[1]
        assert s2 % c.pooling_kernel_size == 0, (
            "chunk must be a multiple of 2*pooling_kernel_size mel frames")
        pos0 = state.pos
        pos_idx = pos0 + jnp.arange(s2)
        x = x + jnp.take(self.embed_positions, pos_idx, axis=0)[None]

        # causal mask over the static cache: query i sees cache < pos0+i+1
        key_pos = jnp.arange(c.max_source_positions)
        allow = key_pos[None, :] <= (pos0 + jnp.arange(s2))[:, None]
        bias = jnp.where(allow, 0.0, _NEG)[None, None]   # (1,1,S2,maxT)

        k_cache, v_cache = state.k_cache, state.v_cache
        for i, layer in enumerate(self.layers):
            k_new, v_new = layer.streaming_kv(x)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new[None], (i, 0, 0, pos0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new[None], (i, 0, 0, pos0, 0))
            x = layer(x, bias, kv=(k_cache[i], v_cache[i]))

        valid2 = jnp.ones((x.shape[0], s2), bool)
        ids, _, _ = self._pool_and_quantize(x, valid2)
        new_state = TokenizerStreamState(
            conv1_cache=c1, conv2_cache=c2, k_cache=k_cache,
            v_cache=v_cache, pos=pos0 + s2)
        return ids, new_state
