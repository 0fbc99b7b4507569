"""STFT / iSTFT with torch-compatible semantics, built for TPU.

The HiFT vocoder's iSTFT head (n_fft=16, hop=4; generator.py:504-518 in the
reference) is on the hot path, so the transforms are expressed as small
matmuls against precomputed DFT bases (MXU-friendly, no FFT dispatch) and the
overlap-add uses a stride-decomposition instead of scatter when
``n_fft % hop == 0`` (always true here).

Conventions: audio is (B, L); spectra are (B, T, F) feature-last with
F = n_fft//2 + 1.  ``center=True`` reflect padding and the (T-1)*hop output
length of ``torch.istft`` are reproduced exactly.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def hann_window(n_fft: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic matches torch.hann_window / scipy get_window."""
    n = np.arange(n_fft, dtype=np.float64)
    denom = n_fft if periodic else n_fft - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_bases(n_fft: int):
    """cos/sin bases (n_fft, F) for the forward real DFT."""
    f = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _idft_bases(n_fft: int):
    """Weighted bases (F, n_fft) for the inverse real DFT (irfft)."""
    f = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(f)[:, None]
    ang = 2.0 * np.pi * n * k / n_fft
    w = np.full((f, 1), 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        w[-1] = 1.0 / n_fft
    cos_b = (np.cos(ang) * w).astype(np.float32)
    sin_b = (np.sin(ang) * w).astype(np.float32)
    return cos_b, sin_b


def frame(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True,
          pad_mode: str = "reflect") -> jnp.ndarray:
    """(B, L) -> (B, T, n_fft) frames, torch.stft framing semantics."""
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode)
    length = x.shape[-1]
    t = 1 + (length - n_fft) // hop
    idx = np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def stft(x: jnp.ndarray, n_fft: int, hop: int, window: np.ndarray,
         center: bool = True, pad_mode: str = "reflect"):
    """torch.stft equivalent. Returns (real, imag) each (B, T, F)."""
    in_dtype = x.dtype
    frames = frame(x, n_fft, hop, center, pad_mode).astype(jnp.float32)
    frames = frames * jnp.asarray(window)[None, None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    # DFT bases must be applied at full precision even on TPU (bf16 matmul
    # error is audible through the exp/sin iSTFT head).
    hi = jax.lax.Precision.HIGHEST
    real = jnp.matmul(frames, jnp.asarray(cos_b), precision=hi)
    imag = -jnp.matmul(frames, jnp.asarray(sin_b), precision=hi)
    return real.astype(in_dtype), imag.astype(in_dtype)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """(B, T, n_fft) -> (B, (T-1)*hop + n_fft) overlap-add.

    Uses the stride decomposition when hop divides n_fft: sub-block j of frame
    t lands at output block t + j, so OLA is a sum of shifted reshapes.
    """
    b, t, n_fft = frames.shape
    out_len = (t - 1) * hop + n_fft
    if n_fft % hop == 0:
        r = n_fft // hop
        out = jnp.zeros((b, t + r - 1, hop), frames.dtype)
        blocks = frames.reshape(b, t, r, hop)
        for j in range(r):
            out = out.at[:, j:j + t].add(blocks[:, :, j])
        return out.reshape(b, -1)[:, :out_len]
    # general fallback: scatter-add
    idx = (np.arange(t)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((b, out_len), frames.dtype)
    return out.at[:, idx].add(frames.reshape(b, -1))


def istft(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop: int,
          window: np.ndarray, center: bool = True) -> jnp.ndarray:
    """torch.istft equivalent: (B, T, F) spectra -> (B, (T-1)*hop) audio.

    Windowed OLA normalized by the OLA of the squared window, then the
    center padding (n_fft//2 per side) is trimmed — identical to
    torch.istft(center=True, length=None).
    """
    cos_b, sin_b = _idft_bases(n_fft)
    hi = jax.lax.Precision.HIGHEST
    real = real.astype(jnp.float32)
    imag = imag.astype(jnp.float32)
    frames = (jnp.matmul(real, jnp.asarray(cos_b), precision=hi)
              - jnp.matmul(imag, jnp.asarray(sin_b), precision=hi))
    win = jnp.asarray(window)
    sig = _overlap_add(frames * win[None, None, :], hop)
    t = real.shape[1]
    env = _overlap_add(
        jnp.broadcast_to((win * win)[None, None, :], (1, t, n_fft)), hop)
    sig = sig / jnp.maximum(env, 1e-11)
    if center:
        sig = sig[:, n_fft // 2: sig.shape[1] - n_fft // 2]
    return sig
