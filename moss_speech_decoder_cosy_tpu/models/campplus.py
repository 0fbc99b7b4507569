"""CAM++ speaker embedding network (D-TDNN with context-aware masking).

The reference runs campplus.onnx on CPU onnxruntime
(GLM_modules/flow_inference.py:86-89) purely as a feature: 80-mel kaldi
fbank (mean-normalized) -> 192-d x-vector used to condition the flow
decoder.  Here the network is a native JAX module following the public
modelscope `speakerlab` CAM++ architecture (FCM 2-D front-end ->
TDNN -> 3 CAM-dense-TDNN blocks with transit layers -> stats pooling ->
dense), so the whole conditioning path can run on TPU.

NOTE: parameter-level conversion from the released onnx graph is pending
weight availability; the architecture constants below match the released
campplus_cn_common (feat 80, embed 192, growth 32, layers 12/24/16,
dilations 1/2/2).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.convs import Conv1d, Conv2d
from ..ops.melspec import kaldi_fbank


class BatchNorm(nn.Module):
    """Inference-mode batch norm (running stats as params, converted from
    the torch/onnx checkpoint)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


class BasicResBlock(nn.Module):
    planes: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):                      # x: (B, F, T, C)
        h = Conv2d(self.planes, (3, 3), self.stride, (1, 1),
                   use_bias=False, name="conv1")(x)
        h = BatchNorm(self.planes, name="bn1")(h)
        h = jax.nn.relu(h)
        h = Conv2d(self.planes, (3, 3), (1, 1), (1, 1),
                   use_bias=False, name="conv2")(h)
        h = BatchNorm(self.planes, name="bn2")(h)
        if self.stride != (1, 1) or x.shape[-1] != self.planes:
            x = Conv2d(self.planes, (1, 1), self.stride, (0, 0),
                       use_bias=False, name="shortcut_conv")(x)
            x = BatchNorm(self.planes, name="shortcut_bn")(x)
        return jax.nn.relu(h + x)


class FCM(nn.Module):
    """2-D conv front-end: (B, T, F) -> (B, T, 32*F/8)."""

    m_channels: int = 32

    @nn.compact
    def __call__(self, feat):                   # (B, T, F)
        x = feat.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
        x = Conv2d(self.m_channels, (3, 3), (1, 1), (1, 1),
                   use_bias=False, name="conv1")(x)
        x = jax.nn.relu(BatchNorm(self.m_channels, name="bn1")(x))
        for i, stride in enumerate([(2, 1), (2, 1)]):
            x = BasicResBlock(self.m_channels, stride,
                              name=f"block{i}a")(x)
            x = BasicResBlock(self.m_channels, (1, 1), name=f"block{i}b")(x)
        x = Conv2d(self.m_channels, (3, 3), (2, 1), (1, 1),
                   use_bias=False, name="conv2")(x)
        x = jax.nn.relu(BatchNorm(self.m_channels, name="bn2")(x))
        b, f, t, c = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, f * c)


class CAMLayer(nn.Module):
    """Context-aware mask conv (local conv gated by segment+global
    context)."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):                      # (B, T, C)
        pad = self.dilation * (self.kernel_size - 1) // 2
        y = Conv1d(self.out_channels, self.kernel_size, padding=pad,
                   dilation=self.dilation, use_bias=False,
                   name="linear_local")(x)
        g = jnp.mean(x, axis=1, keepdims=True)
        seg = self._seg_pooling(x)
        context = g + seg
        context = jax.nn.relu(
            Conv1d(self.bn_channels // self.reduction, 1,
                   name="linear1")(context))
        m = jax.nn.sigmoid(
            Conv1d(self.out_channels, 1, name="linear2")(context))
        return y * m

    def _seg_pooling(self, x):
        b, t, c = x.shape
        n = -(-t // self.seg_len)
        pad = n * self.seg_len - t
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        seg = xp.reshape(b, n, self.seg_len, c).mean(axis=2)
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :t]
        return seg


class CAMDenseTDNNLayer(nn.Module):
    growth_rate: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(BatchNorm(x.shape[-1], name="bn1")(x))
        h = Conv1d(self.bn_channels, 1, use_bias=False, name="linear1")(h)
        h = jax.nn.relu(BatchNorm(self.bn_channels, name="bn2")(h))
        return CAMLayer(self.bn_channels, self.growth_rate,
                        self.kernel_size, self.dilation,
                        name="cam_layer")(h)


class CAMPPlus(nn.Module):
    """(B, T, 80) kaldi fbank (mean-normalized) -> (B, 192) x-vector."""

    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    block_layers: Sequence[int] = (12, 24, 16)
    block_dilations: Sequence[int] = (1, 2, 2)

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        x = FCM(name="head")(feat)
        # TDNN stem: k5 stride 2
        x = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
        x = Conv1d(self.init_channels, 5, stride=2, use_bias=False,
                   name="tdnn_conv")(x)
        x = jax.nn.relu(BatchNorm(self.init_channels, name="tdnn_bn")(x))
        for bi, (n_layers, dil) in enumerate(zip(self.block_layers,
                                                 self.block_dilations)):
            for li in range(n_layers):
                h = CAMDenseTDNNLayer(
                    self.growth_rate, self.bn_size * self.growth_rate,
                    3, dil, name=f"block{bi}_layer{li}")(x)
                x = jnp.concatenate([x, h], axis=-1)
            x = jax.nn.relu(BatchNorm(x.shape[-1],
                                      name=f"transit{bi}_bn")(x))
            x = Conv1d(x.shape[-1] // 2, 1, use_bias=False,
                       name=f"transit{bi}_conv")(x)
        x = jax.nn.relu(BatchNorm(x.shape[-1], name="out_bn")(x))
        mean = jnp.mean(x, axis=1)
        std = jnp.std(x, axis=1)
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = nn.Dense(self.embedding_size, name="dense")(stats)
        return BatchNorm(self.embedding_size, name="dense_bn")(emb)


class SpeakerEncoder:
    """wav 16 kHz -> x-vector, with the reference's preprocessing:
    kaldi fbank 80 + per-utterance mean subtraction
    (whisper_encoder_decoder.py:197-206)."""

    def __init__(self, params, model: CAMPPlus | None = None):
        self.model = model or CAMPPlus()
        self.params = params
        self._fn = jax.jit(lambda p, f: self.model.apply(p, f))

    def __call__(self, wav_16k: np.ndarray) -> np.ndarray:
        wav = jnp.asarray(np.asarray(wav_16k, np.float32).reshape(1, -1))
        feat = kaldi_fbank(wav)
        feat = feat - jnp.mean(feat, axis=1, keepdims=True)
        return np.asarray(self._fn(self.params, feat))

    @classmethod
    def from_onnx(cls, path: str) -> "SpeakerEncoder":
        """Load the reference's campplus.onnx
        (GLM_modules/flow_inference.py:86-89) and run it natively."""
        from ..utils.onnx_io import load_onnx_initializers
        from ..utils.checkpoint import convert_campplus_state_dict
        params, unused = convert_campplus_state_dict(
            load_onnx_initializers(path))
        if unused:
            import logging
            logging.getLogger(__name__).warning(
                "campplus.onnx: %d unused initializers (e.g. %s)",
                len(unused), unused[:3])
        return cls(params)
