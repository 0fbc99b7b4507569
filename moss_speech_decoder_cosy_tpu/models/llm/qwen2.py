"""Qwen2-style decoder-only transformer (the CosyVoice2 LM backbone).

The reference wraps HF Qwen2ForCausalLM (cosyvoice/llm/llm.py:231-260,
Qwen2Encoder) and leans on vLLM for fast decode (llm.py:466-494).  Here the
backbone is native flax — RMSNorm, rotary embeddings, grouped-query
attention with a static KV ring buffer, SwiGLU MLP — so the whole AR loop
can run inside one jitted ``lax.while_loop`` on TPU (no per-token host
round trips, the TPU equivalent of the vLLM fast path).

Weights are convertible from HF Qwen2 checkpoints (q/k/v have biases,
o_proj none; tied or untied lm_head both supported).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    ffn_size: int = 4864
    rope_theta: float = 1e6
    norm_eps: float = 1e-6
    max_seq_len: int = 4096

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_qwen2_config() -> Qwen2Config:
    return Qwen2Config(vocab_size=128, hidden_size=32, num_layers=2,
                       num_heads=4, num_kv_heads=2, ffn_size=64,
                       max_seq_len=128)


@flax.struct.dataclass
class KVCache:
    k: jnp.ndarray           # (L, B, H_kv, max_len, dk)
    v: jnp.ndarray
    length: jnp.ndarray      # () i32


@flax.struct.dataclass
class SlotKVCache:
    """Per-slot KV cache for continuous batching: every batch row is an
    independent request at its own position (vLLM-role serving —
    serving/lm_server.py).

    Two-tier mode (``recent_k is not None``): per-token writes land in a
    small recent ring (one-hot over R positions, ~30x less HBM traffic
    than the O(max_len) RMW) and are flushed into the main cache in bulk
    every <R decode steps; attention scores over [main ++ recent] concat
    at the SCORE level (no key concat materializes).  ``flushed`` is the
    per-slot main-cache valid length."""
    k: jnp.ndarray           # (L, B, H_kv, max_len, dk)
    v: jnp.ndarray
    lengths: jnp.ndarray     # (B,) i32
    recent_k: Optional[jnp.ndarray] = None   # (L, B, H_kv, R, dk)
    recent_v: Optional[jnp.ndarray] = None
    flushed: Optional[jnp.ndarray] = None    # (B,) i32


def _rope(x: jnp.ndarray, positions: jnp.ndarray,
          theta: float) -> jnp.ndarray:
    """x: (B, H, T, dk); positions: (T,) absolute."""
    dk = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dk, 2) / dk))
    ang = positions[:, None] * inv[None, :]              # (T, dk/2)
    cos = jnp.cos(ang)[None, None].astype(x.dtype)
    sin = jnp.sin(ang)[None, None].astype(x.dtype)
    x1, x2 = x[..., : dk // 2], x[..., dk // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1)


def _rope_b(x: jnp.ndarray, positions: jnp.ndarray,
            theta: float) -> jnp.ndarray:
    """x: (B, H, T, dk); positions: (B, T) per-sample absolute."""
    dk = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dk, 2) / dk))
    ang = positions[..., None] * inv[None, None, :]      # (B, T, dk/2)
    cos = jnp.cos(ang)[:, None].astype(x.dtype)
    sin = jnp.sin(ang)[:, None].astype(x.dtype)
    x1, x2 = x[..., : dk // 2], x[..., dk // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return y * scale


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config

    def setup(self):
        c = self.cfg
        h, dk = c.num_heads, c.head_dim
        self.input_layernorm = RMSNorm(c.norm_eps, name="input_layernorm")
        self.q_proj = nn.Dense(h * dk, name="q_proj")
        self.k_proj = nn.Dense(c.num_kv_heads * dk, name="k_proj")
        self.v_proj = nn.Dense(c.num_kv_heads * dk, name="v_proj")
        self.o_proj = nn.Dense(c.hidden_size, use_bias=False, name="o_proj")
        self.post_attention_layernorm = RMSNorm(
            c.norm_eps, name="post_attention_layernorm")
        self.gate_proj = nn.Dense(c.ffn_size, use_bias=False,
                                  name="gate_proj")
        self.up_proj = nn.Dense(c.ffn_size, use_bias=False, name="up_proj")
        self.down_proj = nn.Dense(c.hidden_size, use_bias=False,
                                  name="down_proj")

    def _heads(self, x, n):
        b, t, _ = x.shape
        return x.reshape(b, t, n, self.cfg.head_dim).transpose(0, 2, 1, 3)

    def attend(self, x, positions, k_all, v_all, mask_bias):
        """x (B,T,D); k_all/v_all (B,Hkv,S,dk) full key/value set
        (already rotary-encoded); mask_bias (1|B,1,T,S).  ``positions``
        may be (T,) shared or (B,T) per-slot (continuous batching)."""
        c = self.cfg
        rope = _rope_b if positions.ndim == 2 else _rope
        q = self._heads(self.q_proj(x), c.num_heads)
        q = rope(q, positions, c.rope_theta)
        rep = c.num_heads // c.num_kv_heads
        k = jnp.repeat(k_all, rep, axis=1)
        v = jnp.repeat(v_all, rep, axis=1)
        scores = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(c.head_dim)
        scores = scores + mask_bias
        attn = jax.nn.softmax(scores, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3)
        out = out.reshape(x.shape[0], x.shape[1], -1)
        return self.o_proj(out)

    def kv(self, x, positions):
        c = self.cfg
        rope = _rope_b if positions.ndim == 2 else _rope
        k = self._heads(self.k_proj(x), c.num_kv_heads)
        k = rope(k, positions, c.rope_theta)
        v = self._heads(self.v_proj(x), c.num_kv_heads)
        return k, v

    def __call__(self, x, positions, k_all, v_all, mask_bias):
        h = self.input_layernorm(x)
        x = x + self.attend(h, positions, k_all, v_all, mask_bias)
        h = self.post_attention_layernorm(x)
        x = x + self.down_proj(jax.nn.silu(self.gate_proj(h))
                               * self.up_proj(h))
        return x


class Qwen2Model(nn.Module):
    """Backbone operating on input EMBEDDINGS (the speech LM feeds mixed
    text/speech/special embeddings, llm.py:296-330)."""

    cfg: Qwen2Config

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(c.vocab_size, c.hidden_size,
                                     name="embed_tokens")
        self.layers = [Qwen2Layer(c, name=f"layers_{i}")
                       for i in range(c.num_layers)]
        self.norm = RMSNorm(c.norm_eps, name="norm")

    def init_cache(self, batch: int = 1, dtype=None) -> KVCache:
        c = self.cfg
        if dtype is None:
            # match the parameter dtype so cache updates are cast-free
            dtype = self.embed_tokens.embedding.dtype
        shape = (c.num_layers, batch, c.num_kv_heads, c.max_seq_len,
                 c.head_dim)
        return KVCache(k=jnp.zeros(shape, dtype),
                       v=jnp.zeros(shape, dtype),
                       length=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------ slot serving
    def init_slot_cache(self, batch: int, dtype=None,
                        recent: int = 0) -> SlotKVCache:
        """``recent > 0`` enables the two-tier cache with an R=recent
        ring (the batcher must flush at least every ``recent - 1``
        decode steps)."""
        c = self.cfg
        if dtype is None:
            dtype = self.embed_tokens.embedding.dtype
        shape = (c.num_layers, batch, c.num_kv_heads, c.max_seq_len,
                 c.head_dim)
        extra = {}
        if recent > 0:
            rshape = (c.num_layers, batch, c.num_kv_heads, recent,
                      c.head_dim)
            extra = dict(recent_k=jnp.zeros(rshape, dtype),
                         recent_v=jnp.zeros(rshape, dtype),
                         flushed=jnp.zeros((batch,), jnp.int32))
        return SlotKVCache(k=jnp.zeros(shape, dtype),
                           v=jnp.zeros(shape, dtype),
                           lengths=jnp.zeros((batch,), jnp.int32),
                           **extra)

    def flush_slots(self, cache: SlotKVCache) -> SlotKVCache:
        """Two-tier: scatter each slot's recent ring (rows
        0..lengths-flushed-1) into the main cache at its flushed offset
        (one-hot contraction, amortized over the flush cadence)."""
        r = cache.recent_k.shape[-2]
        s = cache.k.shape[-2]
        fill = cache.lengths - cache.flushed                 # (B,)
        idx = cache.flushed[:, None] + jnp.arange(r)[None, :]  # (B, R)
        oh = jax.nn.one_hot(jnp.where(
            jnp.arange(r)[None, :] < fill[:, None], idx, s), s + 1,
            dtype=cache.k.dtype)[..., :s]                    # (B, R, S)
        keep = 1.0 - jnp.sum(oh, axis=1)                     # (B, S)
        k_new = cache.k * keep[None, :, None, :, None] + jnp.einsum(
            "lbhrd,brs->lbhsd", cache.recent_k, oh)
        v_new = cache.v * keep[None, :, None, :, None] + jnp.einsum(
            "lbhrd,brs->lbhsd", cache.recent_v, oh)
        return dataclasses.replace(
            cache, k=k_new, v=v_new, flushed=cache.lengths,
            recent_k=jnp.zeros_like(cache.recent_k),
            recent_v=jnp.zeros_like(cache.recent_v))

    def prefill_slot(self, cache: SlotKVCache, slot: jnp.ndarray,
                     embeds: jnp.ndarray, n_valid: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, SlotKVCache]:
        """Prefill ONE slot with a fresh prompt (positions start at 0, so
        the write is a plain dynamic_update_slice at the slot row).
        embeds (1, P, D) right-padded to a bucket; n_valid () true length.
        Returns (hidden at the last valid position (1, D), cache)."""
        c = self.cfg
        p = embeds.shape[1]
        positions = jnp.arange(p)
        allow = (jnp.arange(p)[None, :] <= positions[:, None]) \
            & (jnp.arange(p)[None, :] < n_valid)
        bias = jnp.where(allow, 0.0, -1e10)[None, None]

        x = embeds
        ks, vs = [], []
        for layer in self.layers:
            h = layer.input_layernorm(x)
            k_new, v_new = layer.kv(h, positions)     # (1, Hkv, P, dk)
            ks.append(k_new)
            vs.append(v_new)
            x = x + layer.attend(h, positions, k_new, v_new, bias)
            h2 = layer.post_attention_layernorm(x)
            x = x + layer.down_proj(jax.nn.silu(layer.gate_proj(h2))
                                    * layer.up_proj(h2))
        x = self.norm(x)
        k_stack = jnp.stack(ks).astype(cache.k.dtype)  # (L, 1, Hkv, P, dk)
        v_stack = jnp.stack(vs).astype(cache.v.dtype)
        k_c = jax.lax.dynamic_update_slice(cache.k, k_stack,
                                           (0, slot, 0, 0, 0))
        v_c = jax.lax.dynamic_update_slice(cache.v, v_stack,
                                           (0, slot, 0, 0, 0))
        lengths = cache.lengths.at[slot].set(n_valid)
        last = jax.lax.dynamic_slice(x, (0, n_valid - 1, 0),
                                     (1, 1, x.shape[-1]))[:, 0]
        extra = {}
        if cache.flushed is not None:       # two-tier: prompt goes to main
            extra = dict(flushed=cache.flushed.at[slot].set(n_valid))
        return last, dataclasses.replace(cache, k=k_c, v=v_c,
                                         lengths=lengths, **extra)

    def decode_step_slots(self, embeds: jnp.ndarray, cache: SlotKVCache,
                          advance: Optional[jnp.ndarray] = None
                          ) -> Tuple[jnp.ndarray, SlotKVCache]:
        """One decode step for ALL slots: embeds (B, 1, D), each slot at
        its own position.  Writes use a one-hot contraction at per-slot
        positions (cf. models/flow/kv_stream.ring_write rationale).
        ``advance`` (B,) bool: slots with False keep their length
        (finished slots overwrite the same position harmlessly).
        Returns (hidden (B, D), cache)."""
        c = self.cfg
        s = c.max_seq_len
        lengths = cache.lengths
        positions = lengths[:, None]                       # (B, 1)
        key_pos = jnp.arange(s)
        tiered = cache.recent_k is not None

        if tiered:
            r = cache.recent_k.shape[-2]
            rpos = lengths - cache.flushed                 # (B,) in [0, R)
            oh_r = jax.nn.one_hot(rpos, r, dtype=cache.k.dtype)
            keep_r = (1.0 - oh_r)[:, None, :, None]
            put_r = oh_r[:, None, :, None]
            main_ok = key_pos[None, :] < cache.flushed[:, None]
            rec_ok = jnp.arange(r)[None, :] <= rpos[:, None]
            bias_main = jnp.where(main_ok, 0.0, -1e10)[:, None, None, :]
            bias_rec = jnp.where(rec_ok, 0.0, -1e10)[:, None, None, :]
        else:
            oh = jax.nn.one_hot(lengths, s, dtype=cache.k.dtype)
            keep = (1.0 - oh)[:, None, :, None]            # (B, 1, S, 1)
            put = oh[:, None, :, None]
            allow = key_pos[None, :] <= lengths[:, None]   # (B, S)
            bias = jnp.where(allow, 0.0, -1e10)[:, None, None, :]

        rep = c.num_heads // c.num_kv_heads
        scale = 1.0 / np.sqrt(c.head_dim)

        x = embeds
        k_cache, v_cache = cache.k, cache.v
        rk_cache, rv_cache = cache.recent_k, cache.recent_v
        for i, layer in enumerate(self.layers):
            h = layer.input_layernorm(x)
            k_new, v_new = layer.kv(h, positions)          # (B, Hkv, 1, dk)
            if tiered:
                rk_cache = rk_cache.at[i].set(
                    rk_cache[i] * keep_r
                    + k_new.astype(rk_cache.dtype) * put_r)
                rv_cache = rv_cache.at[i].set(
                    rv_cache[i] * keep_r
                    + v_new.astype(rv_cache.dtype) * put_r)
                q = layer._heads(layer.q_proj(h), c.num_heads)
                q = _rope_b(q, positions, c.rope_theta)
                km = jnp.repeat(k_cache[i], rep, axis=1)
                vm = jnp.repeat(v_cache[i], rep, axis=1)
                kr = jnp.repeat(rk_cache[i], rep, axis=1)
                vr = jnp.repeat(rv_cache[i], rep, axis=1)
                sc = jnp.concatenate(
                    [(q @ km.transpose(0, 1, 3, 2)) * scale + bias_main,
                     (q @ kr.transpose(0, 1, 3, 2)) * scale + bias_rec],
                    axis=-1)
                attn = jax.nn.softmax(sc, axis=-1)
                out = attn[..., :s] @ vm + attn[..., s:] @ vr
                out = out.transpose(0, 2, 1, 3).reshape(
                    x.shape[0], 1, -1)
                x = x + layer.o_proj(out)
            else:
                # NOTE: a per-layer slice-update + final jnp.stack variant
                # measured ~10% slower — XLA keeps this .at[i].set chain
                # in place
                k_cache = k_cache.at[i].set(
                    k_cache[i] * keep + k_new.astype(k_cache.dtype) * put)
                v_cache = v_cache.at[i].set(
                    v_cache[i] * keep + v_new.astype(v_cache.dtype) * put)
                x = x + layer.attend(h, positions, k_cache[i], v_cache[i],
                                     bias)
            h2 = layer.post_attention_layernorm(x)
            x = x + layer.down_proj(jax.nn.silu(layer.gate_proj(h2))
                                    * layer.up_proj(h2))
        x = self.norm(x)[:, 0]
        if advance is None:
            new_len = lengths + 1
        else:
            new_len = lengths + advance.astype(jnp.int32)
        return x, dataclasses.replace(cache, k=k_cache, v=v_cache,
                                      recent_k=rk_cache,
                                      recent_v=rv_cache, lengths=new_len)

    def forward_embeds(self, embeds: jnp.ndarray, cache: KVCache,
                       n_valid: Optional[jnp.ndarray] = None
                       ) -> Tuple[jnp.ndarray, KVCache]:
        """Append ``embeds`` (B, T, D) to the cache and return hidden states
        (B, T, D).  Works for prefill (T=prompt) and decode (T=1)."""
        c = self.cfg
        t = embeds.shape[1]
        pos0 = cache.length
        positions = pos0 + jnp.arange(t)
        if n_valid is None:
            n_valid = jnp.asarray(t, jnp.int32)

        key_pos = jnp.arange(c.max_seq_len)
        allow = key_pos[None, :] <= (pos0 + jnp.arange(t))[:, None]
        allow = allow & (key_pos[None, :] < pos0 + n_valid)
        bias = jnp.where(allow, 0.0, -1e10)[None, None]

        x = embeds
        k_cache, v_cache = cache.k, cache.v
        for i, layer in enumerate(self.layers):
            h = layer.input_layernorm(x)
            k_new, v_new = layer.kv(h, positions)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k_new[None].astype(k_cache.dtype),
                (i, 0, 0, pos0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v_new[None].astype(v_cache.dtype),
                (i, 0, 0, pos0, 0))
            x = x + layer.attend(h, positions, k_cache[i], v_cache[i], bias)
            h2 = layer.post_attention_layernorm(x)
            x = x + layer.down_proj(jax.nn.silu(layer.gate_proj(h2))
                                    * layer.up_proj(h2))
        x = self.norm(x)
        new_cache = KVCache(k=k_cache, v=v_cache, length=pos0 + n_valid)
        return x, new_cache
