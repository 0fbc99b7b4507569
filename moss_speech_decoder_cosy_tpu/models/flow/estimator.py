"""Causal U-Net flow estimator (the CFM velocity network).

Rebuilds the reference CausalConditionalDecoder (cosyvoice/flow/decoder.py:
294-494) plus the Matcha building blocks it imports (Block1D/ResnetBlock1D/
BasicTransformerBlock) in feature-last JAX.  The hot loop of the whole
pipeline is 10 Euler steps x 2 CFG forwards of this network per chunk, so it
must map cleanly onto the MXU: all convs/attention are (B, T, C) with C on
the lane dim, masks are precomputed bias tensors, and the module is fully
shape-static (`streaming` is a Python-level flag baked into the jitted
graph, like the reference's TRT engines per shape).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.activations import mish, get_activation
from ...ops.attention import UNetAttention
from ...ops.convs import Conv1d, CausalConv1d, ConvTranspose1d
from ...ops.embeddings import SinusoidalPosEmb, TimestepEmbedding
from ...ops.masks import chunk_attention_mask, mask_to_bias
from ...utils.config import EstimatorConfig


class CausalBlock1D(nn.Module):
    """CausalConv1d k3 -> LayerNorm -> Mish (decoder.py:66-80)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = CausalConv1d(self.dim_out, 3, name="conv")(x * mask[..., None])
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        return mish(h) * mask[..., None]


class Block1D(nn.Module):
    """Conv k3 same -> GroupNorm(8) -> Mish (matcha Block1D).

    GroupNorm statistics span channels-in-group AND time, like torch
    nn.GroupNorm on (B, C, T)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = Conv1d(self.dim_out, 3, padding=1, name="conv")(
            x * mask[..., None])
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm")(h)
        return mish(h) * mask[..., None]


class CausalResnetBlock1D(nn.Module):
    """block1 -> +time-emb -> block2 -> +res_conv(x) (matcha ResnetBlock1D
    with causal blocks, decoder.py:83-88)."""

    dim_out: int
    causal: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 t_emb: jnp.ndarray) -> jnp.ndarray:
        block = CausalBlock1D if self.causal else Block1D
        h = block(self.dim_out, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(t_emb))[:, None, :]
        h = block(self.dim_out, name="block2")(h, mask)
        res = Conv1d(self.dim_out, 1, name="res_conv")(x * mask[..., None])
        return h + res


class BasicTransformerBlock(nn.Module):
    """Matcha/diffusers BasicTransformerBlock: LN -> self-attn -> +res,
    LN -> FF(GELU) -> +res."""

    dim: int
    num_heads: int
    head_dim: int
    act_fn: str = "gelu"
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_bias: Optional[jnp.ndarray] = None,
                 flash_chunk: int = -1,
                 flash_valid_len: int = -1) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + UNetAttention(self.num_heads, self.head_dim,
                              name="attn1")(h, attn_bias, flash_chunk,
                                            flash_valid_len)
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        ff = nn.Dense(self.dim * self.ff_mult, name="ff_proj")(h)
        ff = get_activation(self.act_fn)(ff)
        x = x + nn.Dense(self.dim, name="ff_out")(ff)
        return x


class Downsample1D(nn.Module):
    """Conv k3 stride 2 pad 1 (matcha Downsample1D)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv1d(self.dim, 3, stride=2, padding=1, name="conv")(x)


class TransposeUpsample1D(nn.Module):
    """ConvTranspose k4 s2 p1 (matcha Upsample1D use_conv_transpose)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ConvTranspose1d(self.dim, 4, 2, padding=1, name="conv")(x)


class CausalConditionalDecoder(nn.Module):
    cfg: EstimatorConfig

    def _attn_bias(self, valid: jnp.ndarray, streaming: bool,
                   dtype):
        """Returns (bias or None, flash_chunk).  With flash enabled the
        chunk-causal mask is computed analytically inside the pallas
        kernel — valid must be all-True (offline decode path)."""
        c = self.cfg
        chunk = c.static_chunk_size if streaming else 0
        if c.use_flash_attention:
            return None, chunk
        m = chunk_attention_mask(valid, chunk, c.num_left_chunks)
        return mask_to_bias(m, dtype), -1

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, mu: jnp.ndarray,
                 t: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
                 streaming: bool = False,
                 attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x, mu, cond: (B, T, n_mel); valid: bool (B, T); t: (B,);
        spks: (B, n_mel).  ``attn_mask`` optionally overrides the chunk
        mask with an explicit (T, T) bool mask (single-level causal configs
        only) — the KV streaming path's banded reference forward
        (models/flow/kv_stream.py).  Returns velocity (B, T, n_mel)."""
        c = self.cfg
        if attn_mask is not None:
            assert len(c.channels) == 1 and not c.use_flash_attention
            override_bias = mask_to_bias(
                attn_mask[None] & valid[:, None, :], x.dtype)
        t_emb = SinusoidalPosEmb(c.in_channels, name="time_embeddings")(t)
        time_dim = c.channels[0] * 4
        t_emb = TimestepEmbedding(time_dim, name="time_mlp")(
            t_emb.astype(x.dtype))

        spks_b = jnp.broadcast_to(spks[:, None, :],
                                  (x.shape[0], x.shape[1], spks.shape[-1]))
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

        # flash path: pad the time axis ONCE to the kernel block size so
        # per-layer attention calls are copy-free; the true length feeds
        # the kernel's analytic key mask
        t_true = h.shape[1]
        flash_pad = 0
        if c.use_flash_attention:
            blk = 512
            flash_pad = (-t_true) % blk
            if flash_pad:
                h = jnp.pad(h, ((0, 0), (0, flash_pad), (0, 0)))
                valid = jnp.pad(valid, ((0, 0), (0, flash_pad)))

        channels = tuple(c.channels)
        causal = c.causal
        block_cls = CausalBlock1D if causal else Block1D
        hiddens = []
        masks = [valid]
        # --- down path (decoder.py:427-448)
        for i, ch in enumerate(channels):
            is_last = i == len(channels) - 1
            m = masks[-1]
            h = CausalResnetBlock1D(ch, causal=causal,
                                    name=f"down_res_{i}")(h, m, t_emb)
            bias, fchunk = self._attn_bias(m, streaming, h.dtype)
            if attn_mask is not None:
                bias = override_bias
            for j in range(c.n_blocks):
                h = BasicTransformerBlock(
                    ch, c.num_heads, c.attention_head_dim, c.act_fn,
                    name=f"down_tf_{i}_{j}")(h, bias, fchunk, t_true)
            hiddens.append(h)
            if is_last:
                if causal:
                    h = CausalConv1d(ch, 3, name=f"down_conv_{i}")(
                        h * m[..., None])
                else:
                    h = Conv1d(ch, 3, padding=1, name=f"down_conv_{i}")(
                        h * m[..., None])
            else:
                h = Downsample1D(ch, name=f"down_conv_{i}")(h * m[..., None])
            masks.append(m[:, ::2] if not is_last else m)
        masks = masks[:-1]

        # --- mid blocks
        m = masks[-1]
        bias, fchunk = self._attn_bias(m, streaming, h.dtype)
        if attn_mask is not None:
            bias = override_bias
        for i in range(c.num_mid_blocks):
            h = CausalResnetBlock1D(channels[-1], causal=causal,
                                    name=f"mid_res_{i}")(h, m, t_emb)
            for j in range(c.n_blocks):
                h = BasicTransformerBlock(
                    channels[-1], c.num_heads, c.attention_head_dim, c.act_fn,
                    name=f"mid_tf_{i}_{j}")(h, bias, fchunk, t_true)

        # --- up path with skip connections
        up_channels = channels[::-1] + (channels[0],)
        for i in range(len(up_channels) - 1):
            out_ch = up_channels[i + 1]
            is_last = i == len(up_channels) - 2
            m = masks.pop()
            skip = hiddens.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            h = CausalResnetBlock1D(out_ch, causal=causal,
                                    name=f"up_res_{i}")(h, m, t_emb)
            bias, fchunk = self._attn_bias(m, streaming, h.dtype)
            if attn_mask is not None:
                bias = override_bias
            for j in range(c.n_blocks):
                h = BasicTransformerBlock(
                    out_ch, c.num_heads, c.attention_head_dim, c.act_fn,
                    name=f"up_tf_{i}_{j}")(h, bias, fchunk, t_true)
            if is_last:
                if causal:
                    h = CausalConv1d(out_ch, 3, name=f"up_conv_{i}")(
                        h * m[..., None])
                else:
                    h = Conv1d(out_ch, 3, padding=1, name=f"up_conv_{i}")(
                        h * m[..., None])
            else:
                h = TransposeUpsample1D(out_ch, name=f"up_conv_{i}")(
                    h * m[..., None])

        h = block_cls(up_channels[-1], name="final_block")(h, m)
        out = Conv1d(c.out_channels, 1, name="final_proj")(h * m[..., None])
        out = out * valid[..., None]
        if flash_pad:
            out = out[:, :t_true]
        if c.use_flash_attention:
            # the flash kernel's analytic key mask covers only the scalar
            # pre-pad length, NOT per-row valid; poison the output if any
            # row is right-padded so misuse fails loudly instead of
            # silently attending padding (offline all-valid is the
            # supported path)
            ok = jnp.all(valid[:, :t_true])
            out = jnp.where(ok, out, jnp.full_like(out, jnp.nan))
        return out
