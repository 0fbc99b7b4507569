"""1-D convolution primitives (feature-last, torch-compatible semantics).

All tensors are (B, T, C) — channels on the TPU lane dimension so XLA maps
convs onto the MXU as batched matmuls.  Parameter layout is flax 'WIO'
(K, I, O); the checkpoint converter transposes torch's (O, I, K).

Includes:
- ``Conv1d``: symmetric integer padding like torch ``nn.Conv1d(padding=p)``,
  optional weight normalization (torch ``weight_norm`` dim=0 semantics).
- ``CausalConv1d``: left-padded conv with an explicit streaming cache,
  mirroring the reference's CausalConv1d (flow/decoder.py:37-63 and
  speech_tokenizer/modeling_whisper.py:100-156).
- ``ConvTranspose1d``: torch ``nn.ConvTranspose1d`` output-length semantics
  ((T-1)*s - 2p + k), used by the HiFT upsampler (hifigan/generator.py:447).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _weight_norm_kernel(v: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """kernel = g * v / ||v||, norm over (K, I) per output channel.

    Matches torch.nn.utils.weight_norm(dim=0) on an (O, I, K) tensor.
    """
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 0.0)
    return v * (g[None, None, :] / jnp.maximum(norm, 1e-12))


class Conv1d(nn.Module):
    """torch-style Conv1d on (B, T, C_in) -> (B, T', C_out)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0            # symmetric, like torch nn.Conv1d(padding=p)
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch // self.groups, self.features)
        if self.weight_norm:
            v = self.param("v", self.kernel_init, shape)
            g = self.param(
                "g", lambda _: jnp.sqrt(jnp.sum(v * v, axis=(0, 1))))
            kernel = _weight_norm_kernel(v, g)
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class CausalConv1d(nn.Module):
    """Left-padded conv (stride 1).  ``__call__(x)`` pads (k-1)*d zeros on the
    left; ``step(x, cache)`` consumes/returns an explicit (B, (k-1)*d, C)
    cache for streaming — stream == offline by construction.
    """

    features: int
    kernel_size: int
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @property
    def cache_len(self) -> int:
        return (self.kernel_size - 1) * self.dilation

    def _conv(self) -> Conv1d:
        return Conv1d(self.features, self.kernel_size, stride=1, padding=0,
                      dilation=self.dilation, groups=self.groups,
                      use_bias=self.use_bias, weight_norm=self.weight_norm,
                      kernel_init=self.kernel_init, name="conv")

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 cache: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray | Tuple[jnp.ndarray, jnp.ndarray]:
        pad = self.cache_len
        if cache is None:
            xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            return self._conv()(xp)
        assert cache.shape[1] == pad, (cache.shape, pad)
        xp = jnp.concatenate([cache, x], axis=1)
        new_cache = xp[:, xp.shape[1] - pad:, :]
        return self._conv()(xp), new_cache


class Conv2d(nn.Module):
    """torch-style Conv2d on (B, H, W, C), optional weight_norm(dim=0).

    Parameter layout 'HWIO'; converter maps torch (O, I, KH, KW) via
    transpose(2, 3, 1, 0).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        shape = (kh, kw, in_ch, self.features)
        if self.weight_norm:
            v = self.param("v", self.kernel_init, shape)
            g = self.param(
                "g", lambda _: jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2))))
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
            kernel = v * (g[None, None, None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class ConvTranspose1d(nn.Module):
    """torch nn.ConvTranspose1d: out_len = (T-1)*stride - 2*padding + k.

    Parameter layout (K, I, O); converter maps torch (I, O, K) via
    transpose(2, 0, 1).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)
        if self.weight_norm:
            v = self.param("v", self.kernel_init, shape)
            g = self.param(
                "g", lambda _: jnp.sqrt(jnp.sum(v * v, axis=(0, 2))))
            # torch weight_norm(dim=0) on (I, O, K): norm over (O, K) per I.
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True))
            kernel = v * (g[None, :, None] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", self.kernel_init, shape)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=0),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y
