"""Mel feature extractors for the prompt / speaker paths.

- ``matcha_mel_spectrogram``: the flow-prompt mel (80 bins @ 24 kHz, n_fft
  1920, hop 480, center=False with (n_fft-hop)/2 reflect pad, log-clamp
  1e-5) — the ``feat_extractor`` object the reference instantiates from the
  checkpoint's hyperpyyaml (GLM_modules/flow_inference.py:64; matcha
  audio.mel_spectrogram).
- ``kaldi_fbank``: torchaudio.compliance.kaldi.fbank(num_mel_bins=80,
  dither=0, sample_frequency=16000) — the CAM++ speaker-embedding input
  (whisper_encoder_decoder.py:197-206): povey window, preemphasis 0.97,
  DC removal, HTK-mel triangles (low 20 Hz), log with float-eps floor.
"""

from __future__ import annotations

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from . import stft as stft_ops
from ..tokenizer.features import mel_filter_bank


def matcha_mel_spectrogram(wav: jnp.ndarray, n_fft: int = 1920,
                           num_mels: int = 80, sampling_rate: int = 24000,
                           hop_size: int = 480, win_size: int = 1920,
                           fmin: float = 0.0, fmax: float = 8000.0
                           ) -> jnp.ndarray:
    """wav (B, L) -> log-mel (B, T, num_mels), T = floor((L-n_fft)/hop)+1
    after (n_fft-hop)/2 reflect padding on both sides."""
    pad = (n_fft - hop_size) // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    real, imag = stft_ops.stft(x, n_fft, hop_size,
                               stft_ops.hann_window(win_size),
                               center=False)
    mag = jnp.sqrt(real * real + imag * imag + 1e-9)
    filters = mel_filter_bank(n_fft // 2 + 1, num_mels, sampling_rate,
                              fmin, fmax)
    mel = jnp.matmul(mag, jnp.asarray(filters),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, 1e-5))


@functools.lru_cache(maxsize=None)
def _povey_window(n: int) -> np.ndarray:
    """Kaldi 'povey' window: hann(periodic over n-1... kaldi uses
    0.5-0.5cos(2pi i/(n-1)) raised to 0.85."""
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / (n - 1))
    return (hann ** 0.85).astype(np.float32)


def _hz_to_mel_htk(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)


@functools.lru_cache(maxsize=None)
def kaldi_mel_banks(num_bins: int, n_fft: int, sample_rate: int,
                    low_freq: float = 20.0, high_freq: float = 0.0
                    ) -> np.ndarray:
    """Kaldi-style mel triangles computed in the MEL domain (no slaney
    norm), (n_fft//2, num_bins) — matching torchaudio compliance.get_mel_banks
    (note kaldi drops the nyquist bin)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2 + high_freq
    mel_low = _hz_to_mel_htk(low_freq)
    mel_high = _hz_to_mel_htk(high_freq)
    delta = (mel_high - mel_low) / (num_bins + 1)
    centers = mel_low + np.arange(num_bins + 2) * delta
    fft_freqs = np.arange(n_fft // 2) * sample_rate / n_fft
    mel_f = _hz_to_mel_htk(fft_freqs)
    left = centers[:-2][None, :]
    center = centers[1:-1][None, :]
    right = centers[2:][None, :]
    up = (mel_f[:, None] - left) / (center - left)
    down = (right - mel_f[:, None]) / (right - center)
    fb = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def kaldi_fbank(wav: jnp.ndarray, num_mel_bins: int = 80,
                sample_rate: int = 16000, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0,
                preemphasis: float = 0.97) -> jnp.ndarray:
    """wav (B, L) in [-1, 1] -> (B, T, num_mel_bins) log-mel, kaldi
    semantics with dither=0 (snip_edges, DC removal, povey window,
    round-to-pow2 FFT, power spectrum, HTK-mel banks, log-eps floor).

    NOTE kaldi scales input to int16 range; torchaudio fbank operates on
    the float waveform directly (as the reference calls it), so we do too.
    """
    win = int(sample_rate * frame_length_ms / 1000)      # 400
    hop = int(sample_rate * frame_shift_ms / 1000)       # 160
    n_fft = 1 << (win - 1).bit_length()                  # 512
    b, length = wav.shape
    t = 1 + (length - win) // hop                        # snip_edges
    idx = np.arange(t)[:, None] * hop + np.arange(win)[None, :]
    frames = wav[:, idx]                                 # (B, T, win)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # preemphasis with replicated first sample (kaldi 'offset' handling)
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_povey_window(win))[None, None, :]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_fft - win)))
    cos_b, sin_b = stft_ops._dft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    real = jnp.matmul(frames, jnp.asarray(cos_b), precision=hi)
    imag = jnp.matmul(frames, jnp.asarray(sin_b), precision=hi)
    power = (real * real + imag * imag)[..., : n_fft // 2]
    banks = kaldi_mel_banks(num_mel_bins, n_fft, sample_rate)
    mel = jnp.matmul(power, jnp.asarray(banks), precision=hi)
    return jnp.log(jnp.maximum(mel, sys.float_info.epsilon))
