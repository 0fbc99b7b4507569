"""HiFT vocoder (HiFTNet: neural source filter + iSTFT head), TPU-native.

Re-implements the capabilities of the reference HiFTGenerator
(cosyvoice/hifigan/generator.py:392-582) in feature-last JAX:

    mel (B, T, 80) -> f0 predictor -> NSF harmonic source (cumsum phase)
    -> conv_pre -> [lrelu -> ConvTranspose up -> (+ STFT'd source branch)
    -> Snake ResBlocks] x N -> conv_post -> exp(mag)/sin(phase)
    -> iSTFT (n_fft 16, hop 4) -> clamp(±0.99)

Streaming continuity uses the same source-cache contract as the reference
``inference(speech_feat, cache_source)`` (generator.py:570-582): the first
``len(cache_source)`` source samples are replaced by the cached source so
chunk boundaries line up, and the caller keeps mel/source/speech tails.

Everything here is shape-static and jit-friendly; the iSTFT is a matmul
against a tiny DFT basis (ops/stft.py) rather than an FFT dispatch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops import stft as stft_ops
from ...ops.activations import Snake
from ...ops.convs import Conv1d, ConvTranspose1d
from ...utils.config import HiFTConfig

_INIT_001 = nn.initializers.normal(stddev=0.01)


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def linear_interpolate(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) on (B, T, C)."""
    in_len = x.shape[1]
    scale = in_len / out_len
    pos = (jnp.arange(out_len) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, in_len - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = (pos - lo)[None, :, None].astype(x.dtype)
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


class ConvRNNF0Predictor(nn.Module):
    """5x (weight-norm conv k3 'same' + ELU) + linear head -> |f0|
    (hifigan/f0_predictor.py:22-61)."""

    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel
        for i in range(5):
            x = Conv1d(self.cond_channels, 3, padding=1, weight_norm=True,
                       name=f"cond{i}")(x)
            x = jax.nn.elu(x)
        f0 = nn.Dense(1, name="classifier")(x)
        return jnp.abs(f0[..., 0])                      # (B, T)


class SourceModuleHnNSF2(nn.Module):
    """Harmonic-plus-noise source for non-22.05 kHz rates
    (generator.py:246-389: SineGen2 + SourceModuleHnNSF2).

    f0 (B, L, 1) at audio rate -> per-harmonic phases integrated at frame
    rate (L/upsample_scale) and linearly re-upsampled, uv gating, noise.
    Returns the merged single-channel excitation (B, L, 1).
    """

    cfg: HiFTConfig

    @nn.compact
    def __call__(self, f0: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        cfg = self.cfg
        h = cfg.nb_harmonics + 1
        up = cfg.total_upsample
        # phase integration must run in f32: bf16 cumsum destroys pitch
        f0 = f0.astype(jnp.float32)
        b, length, _ = f0.shape
        k_ini, k_noise = jax.random.split(key)

        fn = f0 * jnp.arange(1, h + 1, dtype=f0.dtype)[None, None, :]
        rad = (fn / cfg.sampling_rate) % 1.0
        # random initial phase per harmonic except the fundamental; drawn
        # with batch 1 and broadcast so batched serving == single-stream
        rand_ini = jax.random.uniform(k_ini, (1, h), dtype=f0.dtype)
        rand_ini = rand_ini.at[:, 0].set(0.0)
        rad = rad.at[:, 0, :].add(rand_ini)
        # integrate at low rate, re-upsample the phase (SineGen2._f02sine)
        rad_low = linear_interpolate(rad, length // up)
        phase_low = jnp.cumsum(rad_low, axis=1) * 2.0 * np.pi
        phase = linear_interpolate(phase_low * up, length)
        sines = jnp.sin(phase) * cfg.nsf_alpha

        uv = (f0 > cfg.nsf_voiced_threshold).astype(f0.dtype)
        noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
        noise = noise_amp * jnp.broadcast_to(
            jax.random.normal(k_noise, (1,) + sines.shape[1:], f0.dtype),
            sines.shape)
        sine_waves = sines * uv + noise

        merged = jnp.tanh(nn.Dense(1, name="l_linear")(sine_waves))
        return merged                                    # (B, L, 1)


class SourceModuleHnNSF(nn.Module):
    """22.05 kHz source variant (generator.py:109-232: SineGen +
    SourceModuleHnNSF): per-harmonic phase integrated at FULL audio rate
    (theta = 2 pi cumsum(f0*h/sr mod 1)), uniform initial phase except the
    fundamental.  Selected when sampling_rate == 22050 (generator.py:429)."""

    cfg: HiFTConfig

    @nn.compact
    def __call__(self, f0: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        cfg = self.cfg
        h = cfg.nb_harmonics + 1
        f0 = f0.astype(jnp.float32)                      # (B, L, 1)
        k_ini, k_noise = jax.random.split(key)
        fn = f0 * jnp.arange(1, h + 1, dtype=jnp.float32)[None, None, :]
        rad = (fn / cfg.sampling_rate) % 1.0
        theta = 2.0 * np.pi * jnp.cumsum(rad, axis=1)
        phase_vec = jax.random.uniform(k_ini, (1, 1, h), jnp.float32,
                                       minval=-np.pi, maxval=np.pi)
        phase_vec = phase_vec.at[..., 0].set(0.0)
        sines = cfg.nsf_alpha * jnp.sin(theta + phase_vec)
        uv = (f0 > cfg.nsf_voiced_threshold).astype(jnp.float32)
        noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
        noise = noise_amp * jnp.broadcast_to(
            jax.random.normal(k_noise, (1,) + sines.shape[1:], jnp.float32),
            sines.shape)
        sine_waves = sines * uv + noise
        return jnp.tanh(nn.Dense(1, name="l_linear")(sine_waves))


class ResBlock(nn.Module):
    """BigVGAN-style dilated residual block with Snake activations
    (generator.py:46-107)."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            xt = Snake(self.channels, name=f"act1_{i}")(x)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        padding=get_padding(self.kernel_size, d),
                        weight_norm=True, kernel_init=_INIT_001,
                        name=f"conv1_{i}")(xt)
            xt = Snake(self.channels, name=f"act2_{i}")(xt)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1,
                        padding=get_padding(self.kernel_size, 1),
                        weight_norm=True, kernel_init=_INIT_001,
                        name=f"conv2_{i}")(xt)
            x = x + xt
        return x


class HiFTGenerator(nn.Module):
    cfg: HiFTConfig

    def setup(self):
        cfg = self.cfg
        self.f0_predictor = ConvRNNF0Predictor(cfg.f0_cond_channels)
        # NOTE CosyVoice2 uses the original source module at 22.05 kHz
        # (generator.py:429)
        self.m_source = (SourceModuleHnNSF(cfg)
                         if cfg.sampling_rate == 22050
                         else SourceModuleHnNSF2(cfg))
        self.conv_pre = Conv1d(cfg.base_channels, 7, padding=3,
                               weight_norm=True, name="conv_pre")
        ups = []
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            ups.append(ConvTranspose1d(
                cfg.base_channels // (2 ** (i + 1)), k, u,
                padding=(k - u) // 2, weight_norm=True,
                kernel_init=_INIT_001, name=f"ups_{i}"))
        self.ups = ups

        # source branch downsamplers (generator.py:466-486)
        n_fft2 = cfg.istft_n_fft + 2
        down_rates = (1,) + tuple(cfg.upsample_rates[::-1][:-1])
        cum = np.cumprod(down_rates)[::-1]
        sdowns, sres = [], []
        for i, (u, k, d) in enumerate(zip(
                cum, cfg.source_resblock_kernel_sizes,
                cfg.source_resblock_dilation_sizes)):
            ch = cfg.base_channels // (2 ** (i + 1))
            if u == 1:
                sdowns.append(Conv1d(ch, 1, name=f"source_down_{i}"))
            else:
                sdowns.append(Conv1d(ch, int(u) * 2, stride=int(u),
                                     padding=int(u) // 2,
                                     name=f"source_down_{i}"))
            sres.append(ResBlock(ch, k, tuple(d), name=f"source_res_{i}"))
        self.source_downs = sdowns
        self.source_resblocks = sres
        del n_fft2

        resblocks = []
        for i in range(len(self.ups)):
            ch = cfg.base_channels // (2 ** (i + 1))
            for j, (k, d) in enumerate(zip(cfg.resblock_kernel_sizes,
                                           cfg.resblock_dilation_sizes)):
                resblocks.append(ResBlock(ch, k, tuple(d),
                                          name=f"resblock_{i}_{j}"))
        self.resblocks = resblocks
        self.conv_post = Conv1d(cfg.istft_n_fft + 2, 7, padding=3,
                                weight_norm=True, kernel_init=_INIT_001,
                                name="conv_post")
        self._window = stft_ops.hann_window(cfg.istft_n_fft, periodic=True)

    def _source_stft(self, s: jnp.ndarray) -> jnp.ndarray:
        real, imag = stft_ops.stft(s[..., 0], self.cfg.istft_n_fft,
                                   self.cfg.istft_hop_len, self._window)
        return jnp.concatenate([real, imag], axis=-1)    # (B, T'', n_fft+2)

    def decode(self, mel: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        """mel (B, T, 80), source s (B, T*480, 1) -> wav (B, T*480)."""
        cfg = self.cfg
        s_stft = self._source_stft(s).astype(mel.dtype)
        x = self.conv_pre(mel)
        num_kernels = len(cfg.resblock_kernel_sizes)
        for i in range(len(self.ups)):
            x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                # ReflectionPad1d((1, 0)) on the time axis
                x = jnp.concatenate([x[:, 1:2], x], axis=1)
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            x = x + si
            xs = None
            for j in range(num_kernels):
                r = self.resblocks[i * num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / num_kernels
        x = jax.nn.leaky_relu(x)                         # default slope 0.01
        x = self.conv_post(x)
        f = cfg.istft_n_fft // 2 + 1
        magnitude = jnp.minimum(jnp.exp(x[..., :f]), 1e2)
        phase = jnp.sin(x[..., f:])
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        wav = stft_ops.istft(real, imag, cfg.istft_n_fft,
                             cfg.istft_hop_len, self._window)
        return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)

    def source(self, mel: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """mel -> NSF excitation (B, T*480, 1)."""
        f0 = self.f0_predictor(mel)                      # (B, T)
        up = self.cfg.total_upsample
        s = jnp.repeat(f0[:, :, None], up, axis=1)       # nearest upsample
        return self.m_source(s, key)

    def forward_train(self, mel: jnp.ndarray, key: jax.Array
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Training forward (generator.py:555-568): (wav, f0)."""
        f0 = self.f0_predictor(mel)
        up = self.cfg.total_upsample
        s = self.m_source(jnp.repeat(f0[:, :, None], up, axis=1), key)
        return self.decode(mel, s), f0

    def __call__(self, mel: jnp.ndarray,
                 cache_source: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """inference(speech_feat, cache_source) -> (wav, source).

        cache_source (B, S, 1) overwrites the first S source samples for
        glitch-free streaming (generator.py:578-580).
        """
        if key is None:
            key = jax.random.PRNGKey(0)
        s = self.source(mel, key)
        if cache_source is not None and cache_source.shape[1] > 0:
            n = cache_source.shape[1]
            s = jnp.concatenate([cache_source, s[:, n:]], axis=1)
        wav = self.decode(mel, s)
        return wav, s
