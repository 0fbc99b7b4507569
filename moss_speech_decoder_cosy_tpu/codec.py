"""High-level speech codec API: wav <-> discrete tokens <-> wav.

The TPU-native equivalent of the reference's GLM4Codec / GLM4Encoder
session classes (GLM_modules/modeling_glm4_codec.py:12-124,
whisper_encoder_decoder.py:35-314):

- ``encode``            wav @16 kHz -> tokens @12.5 Hz, 30 s segmentation
                        (speech_tokenizer/utils.py:44-96)
- ``encode_streaming``  80 ms-chunk streaming tokenization (utils.py:191-292)
- ``prepare_prompt``    prompt wav -> (prompt tokens, prompt mel, speaker
                        embedding), trimmed to 4*token_len alignment
                        (whisper_encoder_decoder.py:221-229)
- ``decode`` / ``decode_streaming``  tokens -> 24 kHz wav via the flow+hift
                        pipeline (pipeline/audio_decoder.py)
- ``convert_voice``     wav -> tokens -> wav with a target-speaker prompt
                        (the gradio_voice_converter path)

Token-sequence padding uses right-pad + valid masks (bucketed to bound the
number of compiled shapes) — the static-shape answer to the reference's
fully dynamic lengths.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .tokenizer import (WhisperVQConfig, WhisperVQEncoder,
                        WhisperFeatureExtractor)
from .pipeline import AudioDecoder
from .ops.melspec import matcha_mel_spectrogram


def _bucket(n: int, step: int = 512) -> int:
    return max(step, ((n + step - 1) // step) * step)


@dataclasses.dataclass
class Prompt:
    token: np.ndarray        # (1, P)
    feat: np.ndarray         # (1, P*ratio, 80)
    embedding: np.ndarray    # (1, 192)


# --------------------------------------------------------------------------
# prompt-wav preparation (the reference VC demos' prompt picker,
# gradio_voice_converter_unstreaming.py:57-120)
# --------------------------------------------------------------------------

def calculate_rms(wav: np.ndarray) -> float:
    """RMS of a waveform (gradio_voice_converter_unstreaming.py:57-59)."""
    w = np.asarray(wav, np.float64).reshape(-1)
    return float(np.sqrt(np.mean(w * w))) if w.size else 0.0


def normalize_volume(wav: np.ndarray, target_rms: float) -> np.ndarray:
    """Scale a waveform to a target RMS; silence passes through unchanged
    (gradio_voice_converter_unstreaming.py:61-67)."""
    wav = np.asarray(wav, np.float32)
    rms = calculate_rms(wav)
    if rms > 0:
        wav = wav * np.float32(target_rms / rms)
    return wav


def find_loudest_segment(wav: np.ndarray, sr: int,
                         segment_duration: float,
                         window_size: float = 0.1,
                         return_bounds: bool = False):
    """Loudest contiguous ``segment_duration``-second slice of a waveform.

    Sliding-RMS energies at ``window_size``-second windows (hop = 1/4
    window), box-smoothed over ``segment_duration/window_size`` windows,
    argmax picks the segment start — the reference demos' prompt picker
    (gradio_voice_converter_unstreaming.py:69-116) vectorised with a
    cumulative sum instead of the per-window python loop.

    ``return_bounds=True`` additionally returns ``(start, end)`` sample
    indices so a paired waveform at another sample rate can be sliced to
    the SAME time window.
    """
    flat = np.asarray(wav, np.float32).reshape(-1)
    n = flat.size
    seg = int(segment_duration * sr)
    if n <= segment_duration * sr:
        return (wav, (0, n)) if return_bounds else wav
    win = int(window_size * sr)
    hop = max(win // 4, 1)
    sq = np.concatenate([[0.0], np.cumsum(flat.astype(np.float64) ** 2)])
    starts = np.arange(0, n - win + 1, hop)
    energies = np.sqrt((sq[starts + win] - sq[starts]) / win)
    kernel_size = max(1, int(segment_duration / window_size))
    if energies.size >= kernel_size:
        kernel = np.ones(kernel_size) / kernel_size
        smoothed = np.convolve(energies, kernel, mode="valid")
    else:
        smoothed = energies
    start = int(np.argmax(smoothed)) * hop
    end = start + seg
    if end > n:
        end = n
        start = max(0, end - seg)
    sliced = (wav[..., start:end] if np.asarray(wav).ndim > 1
              else flat[start:end])
    return (sliced, (start, end)) if return_bounds else sliced


class SpeechCodec:
    def __init__(self, tok_cfg: WhisperVQConfig, tok_params,
                 decoder: AudioDecoder, speaker_encoder=None,
                 segment_seconds: float = 30.0, prompt_mel_fn=None):
        self.tok_cfg = tok_cfg
        self.tokenizer = WhisperVQEncoder(tok_cfg)
        self.tok_params = tok_params
        self.decoder = decoder
        self.speaker_encoder = speaker_encoder
        self.features = WhisperFeatureExtractor(
            tok_cfg.n_fft, tok_cfg.hop_length, tok_cfg.num_mel_bins,
            tok_cfg.sampling_rate)
        # segments may never exceed the encoder's position table; at the
        # production config the 30 s segmentation (utils.py:120-121) IS the
        # ring capacity (1500 post-conv positions * 2 * hop = 30 s).
        # Rounded down to whole tokens so no frames are dropped at segment
        # boundaries (30 s = 375 * 1280 exactly) and the streaming session
        # can segment at the same points.
        ring_samples = tok_cfg.max_source_positions * 2 * tok_cfg.hop_length
        seg = min(int(segment_seconds * tok_cfg.sampling_rate), ring_samples)
        self.segment_samples = max(
            tok_cfg.samples_per_token,
            seg - seg % tok_cfg.samples_per_token)
        self.prompt_mel_fn = prompt_mel_fn or (
            lambda w: matcha_mel_spectrogram(w))
        self._tok_fn = jax.jit(
            lambda p, mel, valid: self.tokenizer.apply(p, mel, valid))
        self._step_fn = jax.jit(
            lambda p, mel, st: self.tokenizer.apply(p, mel, st,
                                                    method=self.tokenizer.step))

    # ------------------------------------------------------------- encode
    def encode(self, wav_16k: np.ndarray) -> np.ndarray:
        """wav (L,) or (1, L) float32 @16 kHz -> (1, n_tokens) int32."""
        wav = np.asarray(wav_16k, np.float32).reshape(1, -1)
        mel_per_tok = 2 * self.tok_cfg.pooling_kernel_size
        out: List[np.ndarray] = []
        for s in range(0, wav.shape[1], self.segment_samples):
            seg = wav[:, s: s + self.segment_samples]
            feats, _ = self.features(jnp.asarray(seg))
            t = feats.shape[1]
            n_tok = max(1, t // mel_per_tok)          # floor, like stride trim
            t_pad = _bucket(n_tok * mel_per_tok, 16 * mel_per_tok)
            feats = jnp.pad(feats, ((0, 0), (0, t_pad - t), (0, 0)))[
                :, :t_pad]
            valid = np.zeros((1, t_pad), bool)
            valid[:, : n_tok * mel_per_tok] = True
            ids, token_valid = self._tok_fn(self.tok_params, feats,
                                            jnp.asarray(valid))
            ids = np.asarray(ids)[np.asarray(token_valid)]
            out.append(ids.reshape(1, -1))
        return np.concatenate(out, axis=1).astype(np.int32)

    def new_encode_session(self):
        return TokenizerSession(self)

    def encode_streaming(self, wav_16k: np.ndarray,
                         chunk_samples: Optional[int] = None) -> np.ndarray:
        """Feed the wav in 80 ms chunks through the causal path; equals
        ``encode`` token-for-token (the boundary-exact streaming features
        plus the same ring-capacity segmentation)."""
        wav = np.asarray(wav_16k, np.float32).reshape(-1)
        step = chunk_samples or self.tok_cfg.samples_per_token
        sess = self.new_encode_session()
        toks: List[np.ndarray] = []
        for s in range(0, len(wav), step):
            toks.extend(sess.push(wav[s: s + step]))
        toks.extend(sess.flush())
        return (np.concatenate(toks, axis=1) if toks
                else np.zeros((1, 0), np.int32))

    # ------------------------------------------------------------- prompt
    def prepare_prompt(self, prompt_wav_24k: np.ndarray,
                       prompt_wav_16k: np.ndarray,
                       pick_loudest_seconds: Optional[float] = None,
                       target_rms: Optional[float] = None) -> Prompt:
        """Build flow-conditioning inputs from a reference utterance
        (whisper_encoder_decoder.py:210-240).

        ``pick_loudest_seconds`` / ``target_rms`` reproduce the reference
        VC demos' prompt preparation (gradio_voice_converter_unstreaming.py
        :398-408): cut the prompt to its loudest contiguous segment, then
        RMS-normalize it to the input's loudness.  The segment window is
        picked ONCE on the 16 kHz wav and both rates are sliced to the
        same time span so tokens, mel, and speaker embedding stay aligned.
        """
        if pick_loudest_seconds is not None:
            _, (s16, e16) = find_loudest_segment(
                np.asarray(prompt_wav_16k, np.float32).reshape(-1), 16000,
                pick_loudest_seconds, return_bounds=True)
            prompt_wav_16k = (
                np.asarray(prompt_wav_16k, np.float32).reshape(-1)[s16:e16])
            w24 = np.asarray(prompt_wav_24k, np.float32).reshape(-1)
            s24 = (s16 * 3) // 2                 # same instant @24 kHz
            prompt_wav_24k = w24[s24: s24 + ((e16 - s16) * 3) // 2]
        if target_rms is not None:
            prompt_wav_16k = normalize_volume(prompt_wav_16k, target_rms)
            prompt_wav_24k = normalize_volume(prompt_wav_24k, target_rms)
        ratio = self.decoder.ratio
        token = self.encode(prompt_wav_16k)
        feat = np.asarray(self.prompt_mel_fn(
            jnp.asarray(prompt_wav_24k, dtype=jnp.float32).reshape(1, -1)))
        token_len = min(feat.shape[1] // ratio, token.shape[1])
        token = token[:, :token_len]
        feat = feat[:, : ratio * token_len]
        if self.speaker_encoder is not None:
            emb = self.speaker_encoder(prompt_wav_16k)
        else:
            emb = np.zeros((1, self.decoder.flow_cfg.spk_embed_dim),
                           np.float32)
        return Prompt(token=token.astype(np.int32),
                      feat=feat.astype(np.float32),
                      embedding=np.asarray(emb, np.float32).reshape(1, -1))

    # ------------------------------------------------------------- decode
    def decode(self, token: np.ndarray,
               prompt: Optional[Prompt] = None) -> np.ndarray:
        p = prompt or Prompt(np.zeros((1, 0), np.int32),
                             np.zeros((1, 0, 80), np.float32),
                             np.zeros((1, self.decoder.flow_cfg.spk_embed_dim),
                                      np.float32))
        return self.decoder.token2wav(np.asarray(token), p.token, p.feat,
                                      p.embedding)

    def decode_streaming(self, token: np.ndarray,
                         prompt: Optional[Prompt] = None,
                         block_size: Optional[int] = None,
                         max_token_len: Optional[int] = None) -> np.ndarray:
        p = prompt or Prompt(np.zeros((1, 0), np.int32),
                             np.zeros((1, 0, 80), np.float32),
                             np.zeros((1, self.decoder.flow_cfg.spk_embed_dim),
                                      np.float32))
        return self.decoder.stream_inference(
            np.asarray(token), p.token, p.feat, p.embedding,
            block_size=block_size, max_token_len=max_token_len)

    # ----------------------------------------------------- voice convert
    def convert_voice(self, wav_16k: np.ndarray, prompt: Prompt,
                      streaming: bool = False) -> np.ndarray:
        token = self.encode(wav_16k)
        if streaming:
            return self.decode_streaming(token, prompt)
        return self.decode(token, prompt)


class TokenizerSession:
    """Incremental 16 kHz samples -> tokens, 80 ms granularity.

    Matches the batch ``encode`` exactly:
    - features come from StreamingFeatures (true frame context via a
      12.5 ms holdback instead of the reference's per-chunk padding,
      utils.py:144-176);
    - sessions auto-segment when the KV ring would reach
      ``max_source_positions`` — the streaming twin of the 30 s batch
      segmentation (utils.py:120-121) — so a long-lived session never
      silently overwrites the last ring slot.
    """

    def __init__(self, codec: SpeechCodec):
        from .tokenizer.features import StreamingFeatures
        self.codec = codec
        cfg = codec.tok_cfg
        self.mel_per_tok = 2 * cfg.pooling_kernel_size
        self._StreamingFeatures = StreamingFeatures
        self._stream = StreamingFeatures(codec.features)
        self._feat_buf = None                 # (1, <8, n_mels) remainder
        self._seg_fed = 0                     # samples fed this segment
        self.state = self._fresh_state()

    def _fresh_state(self):
        return self.codec.tokenizer.apply(
            self.codec.tok_params, 1, method=self.codec.tokenizer.init_state)

    def _consume(self, feats) -> List[np.ndarray]:
        if feats is None:
            return []
        if self._feat_buf is not None:
            feats = jnp.concatenate([self._feat_buf, feats], axis=1)
        out = []
        t = (feats.shape[1] // self.mel_per_tok) * self.mel_per_tok
        for i in range(0, t, self.mel_per_tok):
            ids, self.state = self.codec._step_fn(
                self.codec.tok_params, feats[:, i: i + self.mel_per_tok],
                self.state)
            out.append(np.asarray(ids))
        self._feat_buf = feats[:, t:] if t < feats.shape[1] else None
        return out

    def _next_segment(self) -> List[np.ndarray]:
        """Close the current segment and start fresh: features are
        re-centered and the KV ring + conv caches reset, exactly like the
        batch path's independent per-segment extraction.  The norm max
        carries over (the causal stand-in for per-segment max)."""
        out = self._consume(self._stream.flush())
        max_carry = self._stream.max_log_spec
        self._stream = self._StreamingFeatures(self.codec.features)
        self._stream.max_log_spec = max_carry
        self._feat_buf = None
        self.state = self._fresh_state()
        self._seg_fed = 0
        return out

    def push(self, samples: np.ndarray) -> List[np.ndarray]:
        samples = np.asarray(samples, np.float32).reshape(-1)
        seg_cap = self.codec.segment_samples
        out: List[np.ndarray] = []
        pos = 0
        while pos < len(samples):
            room = seg_cap - self._seg_fed
            take = samples[pos: pos + room]
            pos += len(take)
            self._seg_fed += len(take)
            out.extend(self._consume(self._stream.push(take)))
            if self._seg_fed == seg_cap:
                out.extend(self._next_segment())
        return out

    def flush(self) -> List[np.ndarray]:
        """Emit the tokens for any buffered tail (total = floor(T/8) like
        the batch path's stride trim)."""
        return self._consume(self._stream.flush())
