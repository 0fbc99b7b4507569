"""CosyVoice-v1 flow path: MaskedDiffWithXvec + InterpolateRegulator.

The stock GLM-4-Voice 22.05 kHz decoder uses this older stack
(cosyvoice/flow/flow.py:24-148, length_regulator.py:21-85): a plain
conformer text encoder, linear-interpolation length regulation from 50 Hz
tokens to the 22 050/256 mel rate, and a NON-causal U-Net CFM with a
prompt+34-frame z/mu cache for chunk continuity
(flow_matching.py:44-74).

Kept alongside the production causal path (flow.py) so stock GLM-4-Voice
checkpoints are servable too.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .encoder import LinearEmbed, ConformerEncoderLayer
from .estimator import CausalConditionalDecoder
from .cfm import _fixed_noise, t_span_cosine
from ...ops.embeddings import espnet_rel_pos, wenet_rel_pos
from ...ops.masks import chunk_attention_mask
from ...ops.activations import mish
from ...ops.convs import Conv1d
from ...models.hift.generator import linear_interpolate
from ...utils.config import (EncoderConfig, EstimatorConfig, CFMConfig,
                             FlowConfig)


class ConformerEncoder(nn.Module):
    """Plain conformer encoder (no lookahead/upsample) — wenet
    ConformerEncoder as used by the v1 flow (transformer/encoder.py:368+).

    ``static_chunk_size > 0`` turns it into the cosyvoice1
    BlockConformerEncoder (cosyvoice1/transformer/encoder.py:477,
    attention.py:472): the 'grid' mask of block_mask_util.py:4-20
    (causal OR within own block) is exactly the wenet chunk mask with
    unlimited left context, so it is one mask knob here, not a separate
    attention class."""

    cfg: EncoderConfig
    static_chunk_size: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        t = x.shape[1]
        x = LinearEmbed(c.output_size, c.dropout_rate, name="embed")(
            x, deterministic)
        pos_fn = (espnet_rel_pos if c.pos_enc_layer_type == "rel_pos_espnet"
                  else wenet_rel_pos)
        pos = pos_fn(t, c.output_size).astype(x.dtype)
        attn_mask = chunk_attention_mask(valid, self.static_chunk_size)
        for i in range(c.num_blocks):
            x = ConformerEncoderLayer(c, name=f"encoders_{i}")(
                x, attn_mask, pos, valid, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)


def BlockConformerEncoder(cfg: EncoderConfig,
                          block_size: int = 25) -> ConformerEncoder:
    """cosyvoice1 block-causal conformer (grid-masked attention)."""
    return ConformerEncoder(cfg, static_chunk_size=block_size)


class InterpolateRegulator(nn.Module):
    """Linear-interpolate features to the mel rate, then conv+GroupNorm+Mish
    stack (length_regulator.py:21-43)."""

    channels: int
    n_layers: int = 4
    groups: int = 1

    @nn.compact
    def _stack(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.n_layers):
            x = Conv1d(self.channels, 3, padding=1, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name=f"norm_{i}")(x)
            x = mish(x)
        return Conv1d(self.channels, 1, name="out_conv")(x)

    def __call__(self, x: jnp.ndarray, out_len: int) -> jnp.ndarray:
        x = linear_interpolate(x, out_len)
        return self._stack(x)

    def inference(self, x1: jnp.ndarray, x2: jnp.ndarray, mel_len1: int,
                  mel_len2: int, input_frame_rate: float = 50.0,
                  sample_rate: int = 22050, hop: int = 256) -> jnp.ndarray:
        """Prompt and target interpolated separately; targets longer than
        40 tokens split head/mid/tail at 20-token boundaries for clean
        stream splice points (length_regulator.py:52-73)."""
        if x2.shape[1] > 40:
            n_edge = int(20 / input_frame_rate * sample_rate / hop)
            head = linear_interpolate(x2[:, :20], n_edge)
            mid = linear_interpolate(x2[:, 20:-20], mel_len2 - 2 * n_edge)
            tail = linear_interpolate(x2[:, -20:], n_edge)
            x2 = jnp.concatenate([head, mid, tail], axis=1)
        else:
            x2 = linear_interpolate(x2, mel_len2)
        if x1.shape[1] != 0:
            x1 = linear_interpolate(x1, mel_len1)
            x = jnp.concatenate([x1, x2], axis=1)
        else:
            x = x2
        return self._stack(x)


class ConditionalCFMWithCache(nn.Module):
    """v1 CFM: deterministic z, prompt+last-34-frame z/mu cache carried
    between chunks (flow_matching.py:44-74)."""

    cfg: CFMConfig
    estimator_cfg: EstimatorConfig

    def setup(self):
        self.estimator = CausalConditionalDecoder(self.estimator_cfg,
                                                  name="estimator")

    def __call__(self, mu: jnp.ndarray, valid: jnp.ndarray,
                 spks: jnp.ndarray, cond: jnp.ndarray,
                 prompt_len: int = 0,
                 cache: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cache: (B, cache_len, n_mel, 2) stacking [z, mu]; returns
        (mel, new_cache (B, prompt_len+34, n_mel, 2))."""
        c = self.cfg
        b, t, d = mu.shape
        z = jnp.broadcast_to(
            jnp.asarray(_fixed_noise(c.max_noise_len, d)[:, :t]),
            (b, t, d)).astype(mu.dtype)
        if cache is not None and cache.shape[1] > 0:
            n = cache.shape[1]
            # the reference hard-requires every chunk to span at least the
            # cached prompt+34 frames (flow_matching.py:64-66 crashes
            # otherwise); keep that contract explicit
            assert n <= t, (
                f"v1 flow chunk too short: {t} mel frames < {n} cached "
                "(prompt+34) — raise token_hop/overlap so each window "
                "covers the cache")
            z = jnp.concatenate([cache[..., 0].astype(z.dtype), z[:, n:]],
                                axis=1)
            mu = jnp.concatenate([cache[..., 1].astype(mu.dtype),
                                  mu[:, n:]], axis=1)
        z_cache = jnp.concatenate([z[:, :prompt_len], z[:, -34:]], axis=1)
        mu_cache = jnp.concatenate([mu[:, :prompt_len], mu[:, -34:]], axis=1)
        new_cache = jnp.stack([z_cache, mu_cache], axis=-1)

        sd = jnp.float32 if c.solver_dtype == "float32" else mu.dtype
        t_span = jnp.asarray(t_span_cosine(c.n_timesteps), sd) \
            if c.t_scheduler == "cosine" else \
            jnp.asarray(np.linspace(0, 1, c.n_timesteps + 1, np.float32),
                        sd)
        mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        valid_in = jnp.concatenate([valid, valid], axis=0)
        rate = jnp.asarray(c.inference_cfg_rate, sd)

        def body(mdl, x, ts):
            t_i, dt_i = ts
            x_in = jnp.concatenate([x, x], axis=0).astype(mu.dtype)
            t_in = jnp.full((2 * b,), t_i, mu.dtype)
            dphi = mdl.estimator(x_in, valid_in, mu_in, t_in, spks_in,
                                 cond_in, streaming=False).astype(sd)
            dphi = (1.0 + rate) * dphi[:b] - rate * dphi[b:]
            return x + dt_i * dphi, ()

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        x, _ = scan(self, z.astype(sd), (t_span[:-1], jnp.diff(t_span)))
        return x.astype(jnp.float32), new_cache


class MaskedDiffWithXvec(nn.Module):
    """v1 wrapper (flow.py:24-148): token embed -> conformer -> proj ->
    length-regulate -> CFM with flow cache."""

    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size,
                                               name="spk_embed_affine_layer")
        self.encoder = ConformerEncoder(c.encoder, name="encoder")
        self.encoder_proj = nn.Dense(c.output_size, name="encoder_proj")
        self.length_regulator = InterpolateRegulator(
            c.output_size, name="length_regulator")
        self.decoder = ConditionalCFMWithCache(c.cfm, c.estimator,
                                               name="decoder")

    def inference(self, token: jnp.ndarray, prompt_token: jnp.ndarray,
                  prompt_feat: jnp.ndarray, embedding: jnp.ndarray,
                  mel_len2: int,
                  flow_cache: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (mel (B, mel_len2, n_mel) — prompt region stripped,
        new flow cache).  mel_len2 = round(token_len / frame_rate *
        sample_rate / hop) computed by the caller (flow.py:131)."""
        c = self.cfg
        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        spks = self.spk_embed_affine_layer(embedding /
                                           jnp.maximum(norm, 1e-12))
        tokens = jnp.concatenate([prompt_token, token], axis=1)
        valid = jnp.ones(tokens.shape, bool)
        x = self.input_embedding(jnp.maximum(tokens, 0))
        h = self.encoder(x, valid)
        h = self.encoder_proj(h)
        p = prompt_token.shape[1]
        mel_len1 = prompt_feat.shape[1]
        h = self.length_regulator.inference(
            h[:, :p], h[:, p:], mel_len1, mel_len2, c.input_frame_rate)

        conds = jnp.zeros((h.shape[0], mel_len1 + mel_len2, c.output_size),
                          h.dtype)
        conds = conds.at[:, :mel_len1].set(prompt_feat.astype(h.dtype))
        mel_valid = jnp.ones((h.shape[0], mel_len1 + mel_len2), bool)
        feat, new_cache = self.decoder(h, mel_valid, spks=spks, cond=conds,
                                       prompt_len=mel_len1,
                                       cache=flow_cache)
        return feat[:, mel_len1:], new_cache
