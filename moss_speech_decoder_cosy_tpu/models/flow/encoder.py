"""Upsample conformer encoder: speech tokens -> mel-rate features.

TPU-first rebuild of the reference UpsampleConformerEncoder
(cosyvoice/transformer/upsample_encoder.py:105-321):

    linear embed (+ESPnet rel-pos scale) -> PreLookaheadLayer (3-token
    lookahead or explicit streaming context) -> N conformer blocks ->
    nearest x`stride` upsample + causal conv -> re-embed -> M conformer
    blocks -> LayerNorm

Streaming uses static chunk attention masks (x`stride` after the upsample,
upsample_encoder.py:286,299); the pipeline re-runs a bounded token window
per hop, so the whole forward stays a single static-shape jit.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.attention import RelPositionMultiHeadedAttention
from ...ops.embeddings import espnet_rel_pos, wenet_rel_pos
from ...ops.masks import chunk_attention_mask
from ...ops.convs import Conv1d
from ...ops.activations import get_activation
from ...utils.config import EncoderConfig


class LinearEmbed(nn.Module):
    """LinearNoSubsampling: Dense + LayerNorm(1e-5); the ESPnet rel-pos
    encoding scales x by sqrt(d) and returns a separate pos table
    (transformer/subsampling.py:69-113, embedding.py:255-271).

    ``relu=True`` selects the LegacyLinearNoSubsampling variant (extra
    trailing ReLU, subsampling.py:338-361 — the v1 TransformerLM's
    ``linear_legacy`` input layer)."""

    output_size: int
    dropout_rate: float = 0.0
    relu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.output_size, name="linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        if self.relu:
            x = jax.nn.relu(x)
        return x * jnp.sqrt(jnp.asarray(self.output_size, x.dtype))


class PreLookaheadLayer(nn.Module):
    """conv1 (kernel la+1, looks `la` tokens ahead or consumes an explicit
    context) -> leaky_relu -> causal conv2 k3 -> +residual
    (upsample_encoder.py:66-102)."""

    channels: int
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        la = self.pre_lookahead_len
        if context is None:
            h = jnp.pad(x, ((0, 0), (0, la), (0, 0)))
        else:
            assert context.shape[1] == la
            h = jnp.concatenate([x, context], axis=1)
        h = Conv1d(self.channels, la + 1, name="conv1")(h)
        h = jax.nn.leaky_relu(h, 0.01)
        h = jnp.pad(h, ((0, 0), (2, 0), (0, 0)))
        h = Conv1d(self.channels, 3, name="conv2")(h)
        return h + x


class ConvolutionModule(nn.Module):
    """Conformer conv module (transformer/convolution.py:24-145); layer-norm
    or batch-norm, optional causal left padding.

    ``norm="batch_norm"`` matches torch ``nn.BatchNorm1d`` in eval mode:
    per-channel running statistics stored as parameters
    (``running_mean``/``running_var``, filled by the checkpoint converter
    from the torch buffers).  The reference applies BN over the
    zero-masked sequence without excluding padding (convolution.py:105) —
    inference uses the stored stats so the distinction only matters in
    training, where the production flow configs disable the conv module."""

    channels: int
    kernel_size: int = 15
    activation: str = "swish"
    causal: bool = False
    norm: str = "layer_norm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = x * pad_mask[..., None]
        h = Conv1d(2 * self.channels, 1, name="pointwise_conv1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)                     # GLU
        if self.causal:
            h = jnp.pad(h, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
            pad = 0
        else:
            pad = (self.kernel_size - 1) // 2
        h = Conv1d(self.channels, self.kernel_size, padding=pad,
                   groups=self.channels, name="depthwise_conv")(h)
        if self.norm == "batch_norm":
            mean = self.param("running_mean", nn.initializers.zeros,
                              (self.channels,), jnp.float32)
            var = self.param("running_var", nn.initializers.ones,
                             (self.channels,), jnp.float32)
            scale = self.param("scale", nn.initializers.ones,
                               (self.channels,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros,
                              (self.channels,), jnp.float32)
            inv = jax.lax.rsqrt(var + 1e-5)
            h = ((h - mean.astype(h.dtype)) * inv.astype(h.dtype)
                 * scale.astype(h.dtype) + bias.astype(h.dtype))
        else:
            h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        h = act(h)
        h = Conv1d(self.channels, 1, name="pointwise_conv2")(h)
        return h * pad_mask[..., None]


class FeedForward(nn.Module):
    hidden: int
    activation: str = "swish"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.hidden, name="w_1")(x)
        h = get_activation(self.activation)(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(x.shape[-1], name="w_2")(h)


class ConformerEncoderLayer(nn.Module):
    """Pre-LN conformer layer (transformer/encoder_layer.py:110-236)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 pos_emb: jnp.ndarray, pad_mask: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        if c.macaron_style:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            x = x + 0.5 * FeedForward(c.linear_units, c.activation,
                                      c.dropout_rate, name="ff_macaron")(
                                          h, deterministic)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        x = x + RelPositionMultiHeadedAttention(
            c.attention_heads, c.output_size, c.key_bias,
            name="self_attn")(h, pos_emb, attn_mask)
        if c.use_cnn_module:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            x = x + ConvolutionModule(c.output_size, c.cnn_module_kernel,
                                      c.activation, c.cnn_causal,
                                      c.cnn_module_norm,
                                      name="conv_module")(h, pad_mask)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        ff_scale = 0.5 if c.macaron_style else 1.0
        x = x + ff_scale * FeedForward(c.linear_units, c.activation,
                                       c.dropout_rate, name="feed_forward")(
                                           h, deterministic)
        if c.use_cnn_module:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        return x


class Upsample1D(nn.Module):
    """Nearest x`stride` + left-padded conv k=2*stride+1
    (upsample_encoder.py:37-63)."""

    channels: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, self.stride, axis=1)
        x = jnp.pad(x, ((0, 0), (2 * self.stride, 0), (0, 0)))
        return Conv1d(self.channels, 2 * self.stride + 1, name="conv")(x)


class UpsampleConformerEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 streaming: bool = False,
                 deterministic: bool = True,
                 attn_masks: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: embedded tokens (B, T, input_size); valid: bool (B, T).

        ``attn_masks`` optionally overrides the (token-rate, mel-rate)
        attention masks with explicit (T, T) / (T*s, T*s) bool masks — used
        by the KV-cached streaming path's banded-mask reference forward
        (models/flow/kv_stream.py).

        Returns (features (B, T*stride, output_size), valid_up (B, T*stride)).
        """
        c = self.cfg
        t = x.shape[1]
        embed = LinearEmbed(c.output_size, c.dropout_rate, name="embed")
        x = embed(x, deterministic)
        rel_pos = (espnet_rel_pos if c.pos_enc_layer_type == "rel_pos_espnet"
                   else wenet_rel_pos)
        pos = rel_pos(t, c.output_size).astype(x.dtype)
        if context is not None:
            context = embed(context, deterministic)
        chunk = c.static_chunk_size if streaming else 0
        if attn_masks is not None:
            attn_mask = attn_masks[0][None] & valid[:, None, :]
        else:
            attn_mask = chunk_attention_mask(valid, chunk)

        x = PreLookaheadLayer(c.output_size, c.pre_lookahead_len,
                              name="pre_lookahead_layer")(x, context)
        for i in range(c.num_blocks):
            x = ConformerEncoderLayer(c, name=f"encoders_{i}")(
                x, attn_mask, pos, valid, deterministic)

        x = Upsample1D(c.output_size, c.upsample_stride, name="up_layer")(x)
        t_up = t * c.upsample_stride
        valid_up = jnp.repeat(valid, c.upsample_stride, axis=1)
        x = LinearEmbed(c.output_size, c.dropout_rate, name="up_embed")(
            x, deterministic)
        pos_up = rel_pos(t_up, c.output_size).astype(x.dtype)
        if attn_masks is not None:
            attn_mask_up = attn_masks[1][None] & valid_up[:, None, :]
        else:
            attn_mask_up = chunk_attention_mask(
                valid_up, chunk * c.upsample_stride if streaming else 0)
        for i in range(c.num_up_blocks):
            x = ConformerEncoderLayer(c, name=f"up_encoders_{i}")(
                x, attn_mask_up, pos_up, valid_up, deterministic)

        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        return x, valid_up
