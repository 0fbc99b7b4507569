"""CosyVoice-v1 session-level streaming (cli/model.py:29-238).

The v1 scheme re-decodes a bounded token window per hop through the
non-causal ``MaskedDiffWithXvec`` flow (models/flow/flow_v1.py) and stitches
chunks with hamming crossfades:

- token hop scheduler: ``token_min_hop_len = 2 * input_frame_rate`` growing
  by ``stream_scale_factor`` up to ``token_max_hop_len = 4 * frame_rate``
  (cli/model.py:44-45,200-210); ``token_overlap_len`` (20) extra tokens are
  decoded each hop and retained for the next window.
- mel continuity: the CFM's prompt+34-frame z/mu ``flow_cache``
  (flow_matching.py:44-74) plus a ``mel_overlap_len``-frame hamming
  ``fade_in_out`` between consecutive chunk mels (cli/model.py:46-49,143-146).
- vocoder continuity: the last ``mel_cache_len`` mel frames are re-vocoded
  next hop with the NSF source overwritten from cache
  (``HiFTGenerator.inference(cache_source=...)``) and the overlapping
  ``source_cache_len`` waveform samples crossfaded (cli/model.py:150-162).

This is a host-orchestrated compatibility surface for stock v1/GLM-4-Voice
checkpoints: mel chunks round-trip through the host between the flow and
vocoder jits (kept separate deliberately — see CLAUDE.md).  The production
fast path is the v2 device session / KV wavefront (device_session.py,
kv_session.py).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp


def fade_in_out(new_head: np.ndarray, old_tail: np.ndarray,
                window: np.ndarray) -> np.ndarray:
    """Crossfade ``new_head[:L]`` with ``old_tail`` (length L) using a
    2L hamming window (utils/common.py:142-150); time is axis 1."""
    ln = window.shape[0] // 2
    w_in = window[:ln].reshape((1, ln) + (1,) * (new_head.ndim - 2))
    w_out = window[ln:].reshape((1, ln) + (1,) * (new_head.ndim - 2))
    out = new_head.copy()
    out[:, :ln] = new_head[:, :ln] * w_in + old_tail * w_out
    return out


class StreamSessionV1:
    """Streaming token->wav session for the v1 stack (one uuid's worth of
    the reference's per-dict state, cli/model.py:61-66,186-210)."""

    def __init__(self, flow, flow_params, hift, hift_params,
                 prompt_token: np.ndarray, prompt_feat: np.ndarray,
                 embedding: np.ndarray,
                 sample_rate: int = 22050, mel_hop: int = 256,
                 token_overlap_len: int = 20, mel_cache_len: int = 20,
                 stream_scale_factor: float = 1.0,
                 token_min_hop_len: Optional[int] = None,
                 token_max_hop_len: Optional[int] = None):
        fr = flow.cfg.input_frame_rate
        self.flow, self.flow_params = flow, flow_params
        self.hift, self.hift_params = hift, hift_params
        self.frame_rate = fr
        self.sample_rate = sample_rate
        self.mel_hop = mel_hop
        self.token_min_hop_len = token_min_hop_len or 2 * fr
        self.token_max_hop_len = token_max_hop_len or 4 * fr
        self.token_overlap_len = token_overlap_len
        self.mel_overlap_len = int(token_overlap_len / fr
                                   * sample_rate / mel_hop)
        self.mel_window = np.hamming(
            2 * self.mel_overlap_len).astype(np.float32)
        self.mel_cache_len = mel_cache_len
        self.source_cache_len = mel_cache_len * hift.cfg.total_upsample
        self.speech_window = np.hamming(
            2 * self.source_cache_len).astype(np.float32)
        assert stream_scale_factor >= 1.0
        self.stream_scale_factor = stream_scale_factor

        self.prompt_token = jnp.asarray(prompt_token, jnp.int32)
        self.prompt_feat = jnp.asarray(prompt_feat, jnp.float32)
        self.embedding = jnp.asarray(embedding, jnp.float32)

        # per-session state (the reference's *_dict[uuid] entries)
        self.token_hop_len = self.token_min_hop_len
        self.pending: List[int] = []
        self.mel_overlap: Optional[np.ndarray] = None    # (1, L, 80)
        self.hift_cache = None                  # {mel, source, speech}
        self.flow_cache = None                  # (1, P+34, n_mel, 2)
        self.finished = False

    # ------------------------------------------------------------- jits
    @functools.lru_cache(maxsize=None)
    def _flow_fn(self, n_tok: int, cache_len: int):
        mel_len2 = int(n_tok / self.frame_rate
                       * self.sample_rate / self.mel_hop)     # flow.py:128
        flow = self.flow

        def run(params, token, prompt_token, prompt_feat, emb, cache):
            return flow.apply(params, token, prompt_token, prompt_feat,
                              emb, mel_len2, cache,
                              method=flow.inference)
        return jax.jit(run)

    @functools.lru_cache(maxsize=None)
    def _hift_fn(self, t_mel: int, cache_len: int):
        hift = self.hift

        def run(params, mel, cache_source):
            return hift.apply(params, mel, cache_source)
        return jax.jit(run)

    # ------------------------------------------------------------ core
    def _token2wav(self, tokens: np.ndarray, finalize: bool) -> np.ndarray:
        """One hop of cli/model.py:133-163 (token2wav)."""
        if tokens.size:
            tok = jnp.asarray(tokens[None], jnp.int32)
            cache_len = 0 if self.flow_cache is None \
                else int(self.flow_cache.shape[1])
            mel, self.flow_cache = self._flow_fn(
                int(tok.shape[1]), cache_len)(
                self.flow_params, tok, self.prompt_token, self.prompt_feat,
                self.embedding, self.flow_cache)
            mel = np.asarray(mel, np.float32)             # (1, T, n_mel)
            if self.mel_overlap is not None:
                mel = fade_in_out(mel, self.mel_overlap, self.mel_window)
        else:
            # nothing new to decode: flush the held-back overlap tail
            mel = (self.mel_overlap if self.mel_overlap is not None
                   else np.zeros((1, 0, self.prompt_feat.shape[-1]),
                                 np.float32))
            self.mel_overlap = None
        if self.hift_cache is not None:
            mel = np.concatenate([self.hift_cache["mel"], mel], axis=1)
            cache_source = self.hift_cache["source"]
        else:
            cache_source = np.zeros((1, 0, 1), np.float32)

        if not finalize and self.mel_overlap_len > 0:
            self.mel_overlap = mel[:, -self.mel_overlap_len:]
            mel = mel[:, :-self.mel_overlap_len]
        wav, source = self._hift_fn(mel.shape[1], cache_source.shape[1])(
            self.hift_params, jnp.asarray(mel), jnp.asarray(cache_source))
        wav = np.asarray(wav, np.float32)                 # (1, S)
        source = np.asarray(source, np.float32)           # (1, S, 1)
        if self.hift_cache is not None:
            wav = fade_in_out(wav, self.hift_cache["speech"],
                              self.speech_window)
        if not finalize:
            self.hift_cache = {
                "mel": mel[:, -self.mel_cache_len:],
                "source": source[:, -self.source_cache_len:],
                "speech": wav[:, -self.source_cache_len:],
            }
            wav = wav[:, :-self.source_cache_len]
        return wav[0]

    # ------------------------------------------------------------- API
    def push_tokens(self, tokens) -> List[np.ndarray]:
        """Feed speech tokens; returns zero or more wav chunks as hops
        fill (cli/model.py:196-210)."""
        assert not self.finished
        self.pending.extend(int(t) for t in np.asarray(tokens).reshape(-1))
        out = []
        while len(self.pending) >= self.token_hop_len + self.token_overlap_len:
            window = np.asarray(
                self.pending[: self.token_hop_len + self.token_overlap_len],
                np.int64)
            out.append(self._token2wav(window, finalize=False))
            del self.pending[: self.token_hop_len]
            self.token_hop_len = min(
                self.token_max_hop_len,
                int(self.token_hop_len * self.stream_scale_factor))
        return out

    def finalize(self) -> np.ndarray:
        """Decode the remaining tokens as the final chunk
        (cli/model.py:212-221)."""
        assert not self.finished
        self.finished = True
        window = np.asarray(self.pending, np.int64)
        self.pending = []
        if window.size == 0 and self.hift_cache is None \
                and self.mel_overlap is None:
            return np.zeros((0,), np.float32)
        return self._token2wav(window, finalize=True)
