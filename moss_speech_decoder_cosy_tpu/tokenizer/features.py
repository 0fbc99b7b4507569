"""Whisper log-mel features (128 bins), jittable.

Rebuilds the reference's forked WhisperFeatureExtractor
(whisper_feat_extractor.py:127-161): STFT(400/160, hann, center) ->
|.|^2 with the last frame dropped -> slaney mel (128) -> log10 ->
dynamic-range clamp at (max - 8) -> (x+4)/4.

The fork's addition, ``max_log_spec``, lets chunked/streaming extraction
clamp against a GLOBAL running max instead of the per-chunk max
(whisper_feat_extractor.py:148-156); we expose the same knob with raw-log
units in and out (the reference returns a normalized value but consumes a
raw one — we keep one consistent unit).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import stft as stft_ops


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freq, 1e-10)
                                         / min_log_hz) * logstep,
                    mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


@functools.lru_cache(maxsize=None)
def mel_filter_bank(n_freqs: int, n_mels: int, sampling_rate: int,
                    fmin: float = 0.0, fmax: Optional[float] = None
                    ) -> np.ndarray:
    """(n_freqs, n_mels) slaney-scale, slaney-normalized triangular filters
    — equivalent to HF ``mel_filter_bank(..., norm='slaney',
    mel_scale='slaney')`` used by the whisper extractor."""
    fmax = fmax if fmax is not None else sampling_rate / 2
    fft_freqs = np.linspace(0, sampling_rate / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(np.array(fmin)),
                          _hz_to_mel_slaney(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


class WhisperFeatureExtractor:
    """wav (B, L) @16 kHz -> log-mel (B, T, n_mels), T = L // hop."""

    def __init__(self, n_fft: int = 400, hop_length: int = 160,
                 n_mels: int = 128, sampling_rate: int = 16000):
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.sampling_rate = sampling_rate
        self.window = stft_ops.hann_window(n_fft)
        self.filters = mel_filter_bank(n_fft // 2 + 1, n_mels, sampling_rate)

    def __call__(self, wav: jnp.ndarray,
                 max_log_spec: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (features (B, T, n_mels), max_log_spec scalar).

        Pass the returned ``max_log_spec`` back in for subsequent chunks so
        streaming normalization matches offline extraction.
        """
        real, imag = stft_ops.stft(wav, self.n_fft, self.hop_length,
                                   self.window)
        power = (real * real + imag * imag)[:, :-1]      # drop last frame
        mel = jnp.matmul(power, jnp.asarray(self.filters))
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        max_val = jnp.max(log_spec)
        if max_log_spec is not None:
            max_val = jnp.asarray(max_log_spec, log_spec.dtype)
        log_spec = jnp.maximum(log_spec, max_val - 8.0)
        return (log_spec + 4.0) / 4.0, max_val


class StreamingFeatures:
    """Incremental feature extraction that is EXACTLY equal to the offline
    extractor, frame for frame.

    The offline STFT is center-padded: frame t sees samples
    [t*hop - n_fft/2, t*hop + n_fft/2).  The reference's streaming path
    (speech_tokenizer/utils.py:144-176) runs the stock extractor per chunk,
    so its boundary frames see per-chunk reflect padding and diverge from
    the batch features; here we instead hold back ``n_fft/2`` samples
    (12.5 ms at 400/16k) so every emitted frame has its true context.

    Normalization: the dynamic-range clamp uses the max of the first
    emitted block, then stays frozen — the reference fork's
    ``max_log_spec`` carry (whisper_feat_extractor.py:148-156) with
    consistent raw-log units.
    """

    def __init__(self, fe: WhisperFeatureExtractor):
        self.fe = fe
        self._buf = np.zeros(0, np.float32)   # samples from frame _f0's left
        self._f0 = 0                          # next frame index to emit
        self._started = False
        self.max_log_spec = None

    @property
    def _half(self) -> int:
        return self.fe.n_fft // 2

    def push(self, samples: np.ndarray) -> Optional[jnp.ndarray]:
        """Feed samples; returns features for all frames whose full
        (center-padded) context is now available, or None."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        hop, half = self.fe.hop_length, self._half
        if not self._started:
            if len(self._buf) + len(samples) <= half:
                self._buf = np.concatenate([self._buf, samples])
                return None
            buf = np.concatenate([self._buf, samples])
            # left reflect pad exactly like center=True at stream start
            self._buf = np.concatenate([buf[half:0:-1], buf])
            self._started = True
        else:
            self._buf = np.concatenate([self._buf, samples])
        # buffer starts at padded-coordinate f0*hop; frame k (relative)
        # needs padded samples [k*hop, k*hop + n_fft)
        n = (len(self._buf) - self.fe.n_fft) // hop + 1
        if n <= 0:
            return None
        return self._emit(n, self._buf[: (n - 1) * hop + self.fe.n_fft])

    def flush(self) -> Optional[jnp.ndarray]:
        """Emit the remaining frames using right reflect padding, matching
        the offline extractor's tail (total frames = L // hop)."""
        hop, half = self.fe.hop_length, self._half
        if not self._started:
            if len(self._buf) == 0:
                return None
            buf = self._buf
            self._buf = np.concatenate([buf[half:0:-1], buf])
            self._started = True
        total_len = len(self._buf)
        # reconstruct L (raw samples seen): padded stream = half + L
        length = self._f0 * hop + total_len - half
        n_total = length // hop                       # offline frame count
        n = n_total - self._f0
        if n <= 0:
            return None
        need = (n - 1) * hop + self.fe.n_fft
        pad = need - total_len
        buf = self._buf
        if pad > 0:
            buf = np.concatenate([buf, buf[-2: -2 - pad: -1]])
        return self._emit(n, buf[:need])

    def _emit(self, n: int, window: np.ndarray) -> jnp.ndarray:
        hop = self.fe.hop_length
        real, imag = stft_ops.stft(jnp.asarray(window).reshape(1, -1),
                                   self.fe.n_fft, hop, self.fe.window,
                                   center=False)
        power = real * real + imag * imag
        mel = jnp.matmul(power, jnp.asarray(self.fe.filters))
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        if self.max_log_spec is None:
            self.max_log_spec = jnp.max(log_spec)
        feats = (jnp.maximum(log_spec, self.max_log_spec - 8.0) + 4.0) / 4.0
        self._buf = self._buf[n * hop:]
        self._f0 += n
        return feats
