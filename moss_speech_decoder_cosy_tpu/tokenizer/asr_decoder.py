"""Whisper ASR head for tokenizer training supervision.

The reference keeps the full Whisper seq2seq around the VQ so the codebook
is trained with ASR cross-entropy (modeling_whisper.py:1614-2777; layers
after quantize_position continue on the quantized hidden states + the
second positional table, :1466).  This module provides the training-time
pieces:

- ``PostVQEncoder``: encoder layers after the VQ over
  ``codebook[ids] + embed_positions2`` (modeling_whisper.py:1466).
- ``WhisperVQDecoder``: standard whisper decoder (learned positions,
  causal self-attn + cross-attn, tied output embedding).
- ``asr_ce_loss``: label cross-entropy with padding mask.

The shipped tokenizer checkpoint is ``quantize_encoder_only``
(config.json:55) — inference never needs this file.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .config import WhisperVQConfig
from .model import WhisperVQEncoderLayer, WhisperAttention
from ..ops.masks import mask_to_bias


class PostVQEncoder(nn.Module):
    """Encoder layers quantize_position..encoder_layers over quantized
    hidden states."""

    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, quantized: jnp.ndarray,
                 token_valid: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        t = quantized.shape[1]
        pos2 = self.param("embed_positions2", nn.initializers.normal(0.02),
                          (c.max_source_positions // c.pooling_kernel_size,
                           c.d_model))
        x = quantized + pos2[None, :t]
        pos = jnp.arange(t)
        if c.causal_attention:
            allow = pos[None, :] <= pos[:, None]
        else:
            blk = max(1, c.quantize_causal_block_size
                      // c.pooling_kernel_size)
            allow = (pos[None, :] // blk) <= (pos[:, None] // blk)
        mask = allow[None] & token_valid[:, None, :]
        bias = mask_to_bias(mask, x.dtype)[:, None]
        for i in range(c.encoder_layers - c.quantize_position):
            x = WhisperVQEncoderLayer(c, name=f"layers_{i}")(x, bias)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


class WhisperDecoderLayer(nn.Module):
    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, x, enc, self_bias, cross_bias,
                 return_attn: bool = False):
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, name="self_attn_layer_norm")(x)
        x = x + WhisperAttention(c.decoder_attention_heads, c.d_model,
                                 name="self_attn")(h, self_bias)
        h = nn.LayerNorm(epsilon=1e-5, name="encoder_attn_layer_norm")(x)
        attn = WhisperAttention(c.decoder_attention_heads, c.d_model,
                                name="encoder_attn")
        # cross attention: q from decoder, k/v from encoder states
        b, t, _ = h.shape
        dk = c.d_model // c.decoder_attention_heads
        q = attn.q_proj(h) * (dk ** -0.5)
        q = attn._heads(q)
        k = attn._heads(attn.k_proj(enc))
        v = attn._heads(attn.v_proj(enc))
        s = q @ k.transpose(0, 1, 3, 2) + cross_bias
        a = jax.nn.softmax(s, axis=-1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, c.d_model)
        x = x + attn.out_proj(o)
        h = nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)
        h = jax.nn.gelu(nn.Dense(c.decoder_ffn_dim, name="fc1")(h),
                        approximate=False)
        out = x + nn.Dense(c.d_model, name="fc2")(h)
        if return_attn:
            return out, a                    # a: (B, H, T, S) cross weights
        return out


class WhisperVQDecoder(nn.Module):
    """Token decoder with tied input/output embedding
    (modeling_whisper.py WhisperVQDecoder)."""

    cfg: WhisperVQConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, token_valid: jnp.ndarray,
                 enc: jnp.ndarray, enc_valid: jnp.ndarray,
                 return_cross_attn: bool = False):
        """``return_cross_attn=True`` additionally returns the stacked
        per-layer cross-attention weights (L, B, H, T, S) — the signal the
        DTW token-timestamp path consumes (generation_whisper.py:186-191
        collects these per decode step; this decoder recomputes the full
        prefix, so ONE batched forward over the final sequence yields the
        identical rows)."""
        c = self.cfg
        b, t = tokens.shape
        embed = nn.Embed(c.vocab_size, c.d_model, name="embed_tokens")
        pos = self.param("embed_positions", nn.initializers.normal(0.02),
                         (c.max_target_positions, c.d_model))
        x = embed(tokens) + pos[None, :t]

        ar = jnp.arange(t)
        causal = (ar[None, :] <= ar[:, None])[None] & token_valid[:, None, :]
        self_bias = mask_to_bias(causal, x.dtype)[:, None]
        cross_bias = mask_to_bias(enc_valid[:, None, :], x.dtype)[:, None]
        attns = []
        for i in range(c.decoder_layers):
            layer = WhisperDecoderLayer(c, name=f"layers_{i}")
            if return_cross_attn:
                x, a = layer(x, enc, self_bias, cross_bias,
                             return_attn=True)
                attns.append(a)
            else:
                x = layer(x, enc, self_bias, cross_bias)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)
        logits = x @ embed.embedding.T                   # tied projection
        if return_cross_attn:
            return logits, jnp.stack(attns)
        return logits


class WhisperAudioClassifier(nn.Module):
    """Sequence-classification head over encoder states
    (WhisperForAudioClassification, modeling_whisper.py:2653-2762):
    optional softmax-weighted layer sum -> projector -> mean pool ->
    classifier.

    ``states``: (B, T, D) final encoder states, or (B, L, T, D) stacked
    per-layer states when ``use_weighted_layer_sum``.  ``valid`` masks the
    pooled mean (the reference pools padding too; pass None to match it
    exactly)."""

    cfg: WhisperVQConfig
    num_labels: int
    classifier_proj_size: int = 256
    use_weighted_layer_sum: bool = False

    @nn.compact
    def __call__(self, states: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.use_weighted_layer_sum:
            n = states.shape[1]
            w = self.param("layer_weights",
                           nn.initializers.constant(1.0 / n), (n,))
            w = jax.nn.softmax(w)
            states = jnp.einsum("bltd,l->btd", states, w)
        h = nn.Dense(self.classifier_proj_size, name="projector")(states)
        if valid is None:
            pooled = jnp.mean(h, axis=1)
        else:
            m = valid[..., None].astype(h.dtype)
            pooled = jnp.sum(h * m, axis=1) / jnp.maximum(
                jnp.sum(m, axis=1), 1.0)
        return nn.Dense(self.num_labels, name="classifier")(pooled)


def asr_ce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[..., None],
                               axis=-1)[..., 0]
    m = valid.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def greedy_decode(decoder: WhisperVQDecoder, params, enc: jnp.ndarray,
                  enc_valid: jnp.ndarray, bos_id: int, eos_id: int,
                  max_len: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy ASR decoding over the post-VQ encoder states — the inference
    side of the whisper head (generation_whisper.py's core loop, greedy
    path).  Full-prefix recompute per step inside one lax.scan (whisper
    target lengths are short, max_target_positions=448).

    Returns (tokens (B, max_len) i32 padded with eos, lengths (B,))."""
    b = enc.shape[0]

    def apply_step(tokens, n):
        token_valid = jnp.arange(max_len)[None, :] < jnp.maximum(n, 1)[:, None]
        logits = decoder.apply(params, tokens, token_valid, enc, enc_valid)
        idx = jnp.maximum(n - 1, 0)
        last = jnp.take_along_axis(
            logits, idx[:, None, None].repeat(1, axis=1), axis=1)[:, 0]
        return jnp.argmax(last, axis=-1).astype(jnp.int32)

    def body(carry, _):
        tokens, n, done = carry
        nxt = apply_step(tokens, n)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.vmap(lambda t, i, v: t.at[i].set(v))(
            tokens, jnp.minimum(n, max_len - 1), nxt)
        done = done | (nxt == eos_id)
        n = jnp.where(done, n, n + 1)
        return (tokens, n, done), ()

    tokens0 = jnp.full((b, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)
    carry = (tokens0, jnp.ones((b,), jnp.int32),
             jnp.zeros((b,), bool))
    (tokens, n, _), _ = jax.lax.scan(body, carry, None, length=max_len - 1)
    return tokens, n


def sample_decode(decoder: WhisperVQDecoder, params, enc: jnp.ndarray,
                  enc_valid: jnp.ndarray, bos_id: int, eos_id: int,
                  rng: jax.Array, temperature: float = 0.0,
                  max_len: int = 64):
    """Greedy (temperature == 0) or temperature sampling, tracking the sum
    of chosen-token log-probs — the statistic the long-form fallback needs
    (generation_whisper.py:1731-1748 _retrieve_avg_logprobs).

    Returns (tokens (B, L) i32, lengths (B,) incl. bos, sum_logprob (B,))."""
    b = enc.shape[0]

    def body(carry, step_rng):
        tokens, n, done, lp = carry
        token_valid = jnp.arange(max_len)[None, :] < jnp.maximum(n, 1)[:, None]
        logits = decoder.apply(params, tokens, token_valid, enc, enc_valid)
        idx = jnp.maximum(n - 1, 0)
        last = jnp.take_along_axis(
            logits, idx[:, None, None].repeat(1, axis=1), axis=1)[:, 0]
        logp = jax.nn.log_softmax(last, axis=-1)
        if temperature > 0:
            nxt = jax.random.categorical(step_rng, last / temperature,
                                         axis=-1).astype(jnp.int32)
        else:
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        step_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        nxt = jnp.where(done, eos_id, nxt)
        lp = lp + jnp.where(done, 0.0, step_lp)
        tokens = jax.vmap(lambda t, i, v: t.at[i].set(v))(
            tokens, jnp.minimum(n, max_len - 1), nxt)
        done = done | (nxt == eos_id)
        n = jnp.where(done, n, n + 1)
        return (tokens, n, done, lp), ()

    tokens0 = jnp.full((b, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)
    carry = (tokens0, jnp.ones((b,), jnp.int32), jnp.zeros((b,), bool),
             jnp.zeros((b,), jnp.float32))
    (tokens, n, _, lp), _ = jax.lax.scan(
        body, carry, jax.random.split(rng, max_len - 1))
    return tokens, n, lp


def timestamp_decode(decoder: WhisperVQDecoder, params, enc: jnp.ndarray,
                     enc_valid: jnp.ndarray, bos_id: int, eos_id: int,
                     timestamp_begin: int,
                     max_initial_timestamp_index: int = 50,
                     max_len: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decoding under the whisper timestamp-token grammar — the
    ``WhisperTimeStampLogitsProcessor`` semantics that
    ``return_timestamps=True`` enables in the reference's long-form
    generation (generation_whisper.py:349-352,520-525):

    - the first sampled token must be a timestamp, capped at
      ``timestamp_begin + max_initial_timestamp_index``;
    - after a lone timestamp, only text or eos may follow; after a
      timestamp PAIR, the next token must be text;
    - a timestamp directly after text closes the pair: the next token
      must be a timestamp or eos;
    - timestamps are non-decreasing (earlier timestamp ids are masked);
    - whenever the total timestamp probability exceeds the best text
      token's, a timestamp is forced.

    Returns (tokens (B, max_len) i32, lengths (B,))."""
    b = enc.shape[0]
    ts0 = jnp.int32(timestamp_begin)

    def apply_rules(last_logits, last, penult, last_ts, n):
        ids = jnp.arange(last_logits.shape[-1])
        is_ts_id = ids[None, :] >= ts0
        neg = jnp.full_like(last_logits, -1e10)

        last_was = last >= ts0                                   # (B,)
        penult_was = (penult >= ts0) | (n <= 2)
        # pairing rules (HF WhisperTimeStampLogitsProcessor)
        mask_ts = last_was & penult_was          # completed pair -> text
        mask_text = last_was & ~penult_was       # open pair -> ts/eos only
        lg = jnp.where(mask_ts[:, None] & is_ts_id, neg, last_logits)
        allow_text = is_ts_id | (ids[None, :] == eos_id)
        lg = jnp.where(mask_text[:, None] & ~allow_text, neg, lg)
        # non-decreasing timestamps
        floor = jnp.where(mask_text, last_ts, last_ts + 1)       # (B,)
        seen = last_ts >= ts0
        below = is_ts_id & (ids[None, :] < floor[:, None])
        lg = jnp.where(seen[:, None] & below, neg, lg)
        # first sampled position: timestamps only, capped
        at_begin = n == 1
        init_ok = is_ts_id & (ids[None, :]
                              <= ts0 + max_initial_timestamp_index)
        lg = jnp.where(at_begin[:, None] & ~init_ok, neg, lg)
        # force a timestamp when its total mass beats every text token
        logp = jax.nn.log_softmax(lg, axis=-1)
        ts_lp = jax.nn.logsumexp(jnp.where(is_ts_id, logp, -1e10), axis=-1)
        text_max = jnp.max(jnp.where(is_ts_id, -1e10, logp), axis=-1)
        force = ts_lp > text_max
        lg = jnp.where(force[:, None] & ~is_ts_id, neg, lg)
        return lg

    def body(carry, _):
        tokens, n, done, last, penult, last_ts = carry
        token_valid = jnp.arange(max_len)[None, :] < jnp.maximum(n, 1)[:, None]
        logits = decoder.apply(params, tokens, token_valid, enc, enc_valid)
        idx = jnp.maximum(n - 1, 0)
        lg = jnp.take_along_axis(
            logits, idx[:, None, None].repeat(1, axis=1), axis=1)[:, 0]
        lg = apply_rules(lg, last, penult, last_ts, n)
        nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.vmap(lambda t, i, v: t.at[i].set(v))(
            tokens, jnp.minimum(n, max_len - 1), nxt)
        new_done = done | (nxt == eos_id)
        penult = jnp.where(done, penult, last)
        last = jnp.where(done, last, nxt)
        last_ts = jnp.where((nxt >= ts0) & ~done, nxt, last_ts)
        n = jnp.where(new_done, n, n + 1)
        return (tokens, n, new_done, last, penult, last_ts), ()

    tokens0 = jnp.full((b, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, 0].set(bos_id)
    carry = (tokens0, jnp.ones((b,), jnp.int32), jnp.zeros((b,), bool),
             jnp.full((b,), bos_id, jnp.int32),
             jnp.full((b,), bos_id, jnp.int32),
             jnp.zeros((b,), jnp.int32))
    (tokens, n, _, _, _, _), _ = jax.lax.scan(body, carry, None,
                                              length=max_len - 1)
    return tokens, n


def extract_timestamp_segments(tokens, n: int, timestamp_begin: int,
                               time_precision: float = 0.02,
                               offset_sec: float = 0.0):
    """Split one decoded row into [(start_s, end_s, text_ids)] at
    timestamp-token pairs (the reference's _retrieve_segment,
    generation_whisper.py:693-711).  An unclosed trailing segment ends at
    the last seen timestamp (or the final token position)."""
    import numpy as np
    seq = np.asarray(tokens).reshape(-1)[1:int(n)]       # strip bos
    is_ts = seq >= timestamp_begin
    segs = []
    start = None
    text: list = []
    for tok, ts in zip(seq.tolist(), is_ts.tolist()):
        if ts:
            t_sec = (tok - timestamp_begin) * time_precision + offset_sec
            if start is None:
                start = t_sec
            elif text:
                segs.append((start, t_sec, np.asarray(text, np.int32)))
                start, text = t_sec, []
            else:
                start = t_sec                    # consecutive pair: reset
        else:
            text.append(tok)
    if text and start is not None:
        end = start + len(text) * time_precision
        segs.append((start, end, np.asarray(text, np.int32)))
    return segs


def beam_decode(decoder: WhisperVQDecoder, params, enc: jnp.ndarray,
                enc_valid: jnp.ndarray, bos_id: int, eos_id: int,
                beam_size: int = 4, max_len: int = 64,
                length_penalty: float = 1.0):
    """Beam search over the whisper decoder (the reference reaches this via
    HF ``generate(num_beams=...)``, generation_whisper.py:277 ->
    transformers beam search).  TPU-native: fixed beam width inside one
    lax.scan, full-prefix recompute per step (whisper targets are short).

    Returns (best tokens (B, L), lengths (B,), best score (B,)) where score
    is sum-logprob / length**length_penalty."""
    b = enc.shape[0]
    k = beam_size

    enc_k = jnp.repeat(enc, k, axis=0)
    enc_valid_k = jnp.repeat(enc_valid, k, axis=0)

    def body(carry, _):
        tokens, scores, n, done, ln = carry
        flat = tokens.reshape(b * k, max_len)
        token_valid = jnp.arange(max_len)[None, :] < jnp.maximum(n, 1)
        token_valid = jnp.broadcast_to(token_valid, flat.shape)
        logits = decoder.apply(params, flat, token_valid, enc_k, enc_valid_k)
        last = jax.lax.dynamic_slice_in_dim(
            logits, jnp.maximum(n - 1, 0), 1, axis=1)[:, 0]
        nv = last.shape[-1]
        logp = jax.nn.log_softmax(last, axis=-1).reshape(b, k, nv)
        # finished beams may only extend with eos at zero cost
        eos_row = jnp.full((nv,), -1e9, logp.dtype).at[eos_id].set(0.0)
        logp = jnp.where(done[..., None], eos_row[None, None], logp)
        cand = scores[..., None] + logp                       # (B, K, V)
        top_s, top_i = jax.lax.top_k(cand.reshape(b, k * nv), k)
        beam_idx = top_i // nv                                # (B, K)
        tok = (top_i % nv).astype(jnp.int32)
        gather = jax.vmap(lambda t, i: t[i])
        tokens = gather(tokens, beam_idx)
        done_g = gather(done, beam_idx)
        ln_g = gather(ln, beam_idx)
        tokens = jax.vmap(jax.vmap(lambda t, p, x: t.at[p].set(x),
                                   in_axes=(0, None, 0)),
                          in_axes=(0, None, 0))(
            tokens, jnp.minimum(n, max_len - 1), tok)
        new_done = done_g | (tok == eos_id)
        ln_new = jnp.where(done_g, ln_g, ln_g + 1)
        return (tokens, top_s, n + 1, new_done, ln_new), ()

    tokens0 = jnp.full((b, k, max_len), eos_id, jnp.int32)
    tokens0 = tokens0.at[:, :, 0].set(bos_id)
    scores0 = jnp.zeros((b, k), jnp.float32).at[:, 1:].set(-1e9)
    carry = (tokens0, scores0, jnp.ones((), jnp.int32),
             jnp.zeros((b, k), bool), jnp.ones((b, k), jnp.int32))
    (tokens, scores, n, done, ln), _ = jax.lax.scan(
        body, carry, None, length=max_len - 1)
    final = scores / (ln.astype(scores.dtype) ** length_penalty)
    best = jnp.argmax(final, axis=1)
    pick = jax.vmap(lambda t, i: t[i])
    return (pick(tokens, best), pick(ln, best),
            pick(final, best))


def compression_ratio(token_ids) -> float:
    """zlib compression ratio of the token byte stream — the repetition
    detector of the long-form fallback (generation_whisper.py:1722-1729)."""
    import zlib
    import numpy as np
    raw = np.asarray(token_ids, np.int32).tobytes()
    if not raw:
        return 0.0
    return len(raw) / len(zlib.compress(raw))


def median_filter(x, filter_width: int):
    """Median filter along the last dim with reflect padding
    (generation_whisper.py:43-63).  numpy, host-side: timestamp
    extraction is post-processing over tiny matrices, not a device
    hot path."""
    import numpy as np
    if filter_width <= 0 or filter_width % 2 != 1:
        raise ValueError("`filter_width` should be an odd number")
    pad = filter_width // 2
    x = np.asarray(x)
    if x.shape[-1] <= pad:
        return x
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(
        xp, filter_width, axis=-1)
    # the reference takes sort()[..., pad] — the median of an odd window
    return np.sort(windows, axis=-1)[..., pad]


def dynamic_time_warping(matrix):
    """Monotonic min-cost alignment path through a (text, time) cost
    matrix (generation_whisper.py:66-116).  Returns (text_indices,
    time_indices) along the path, earliest first."""
    import numpy as np
    matrix = np.asarray(matrix, np.float64)
    t_len, s_len = matrix.shape
    # f32 cost accumulator, exactly like the reference (:72) — keeps the
    # chosen path bit-identical to the torch mixin for the golden test
    cost = np.full((t_len + 1, s_len + 1), np.inf, np.float32)
    trace = -np.ones((t_len + 1, s_len + 1), np.int8)
    cost[0, 0] = 0.0
    for j in range(1, s_len + 1):
        col_m = matrix[:, j - 1]
        prev = cost[:, j - 1]                    # cost[., j-1] (fixed)
        cur = cost[:, j]
        for i in range(1, t_len + 1):
            c0, c1, c2 = prev[i - 1], cur[i - 1], prev[i]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cur[i] = col_m[i - 1] + c
            trace[i, j] = t
    trace[0, :] = 2
    trace[:, 0] = 1
    i, j = t_len, s_len
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return (np.array(text_indices[::-1], np.int64),
            np.array(time_indices[::-1], np.int64))


def extract_token_timestamps(cross_attn, alignment_heads,
                             median_filter_width: int = 7,
                             time_precision: float = 0.02,
                             num_positions=None):
    """Token-level timestamps from stacked cross-attention weights via
    DTW (generation_whisper.py:176-255 `_extract_token_timestamps`).

    ``cross_attn``: (L, B, H, T, S) weights from
    ``WhisperVQDecoder(..., return_cross_attn=True)`` — the one-forward
    equivalent of the mixin's per-step concatenation.
    ``alignment_heads``: sequence of (layer, head) pairs.
    ``num_positions``: crop S to this many encoder positions first —
    already in encoder-position units (the mixin's ``num_frames // 2``,
    :230-240); an int or a per-batch sequence.
    ``time_precision``: seconds per encoder position.

    Returns (B, T+1) float32 — ``timestamps[:, 1:]`` are the DTW jump
    times, matching the reference layout (:270-273).
    """
    import numpy as np
    cross_attn = np.asarray(cross_attn, np.float32)
    w = np.stack([cross_attn[l][:, h] for l, h in alignment_heads])
    w = w.transpose(1, 0, 2, 3)                        # (B, N, T, S)
    batch, _, t_len, _ = w.shape
    timestamps = np.zeros((batch, t_len + 1), np.float32)
    per_batch = (num_positions is not None
                 and not isinstance(num_positions, int)
                 and len(np.unique(np.asarray(num_positions))) > 1)
    if not per_batch:
        if num_positions is not None:
            np_i = (num_positions if isinstance(num_positions, int)
                    else int(np.asarray(num_positions).reshape(-1)[0]))
            w = w[..., :np_i]
        std = w.std(axis=-2, keepdims=True)
        mean = w.mean(axis=-2, keepdims=True)
        w = (w - mean) / std
        w = median_filter(w, median_filter_width)
        w = w.mean(axis=1)                             # (B, T, S)
    for b in range(batch):
        if per_batch:
            m = w[b, ..., : int(np.asarray(num_positions)[b])]
            std = m.std(axis=-2, keepdims=True)
            mean = m.mean(axis=-2, keepdims=True)
            m = (m - mean) / std
            m = median_filter(m, median_filter_width)
            m = m.mean(axis=0)
        else:
            m = w[b]
        text_idx, time_idx = dynamic_time_warping(-m.astype(np.float64))
        jumps = np.pad(np.diff(text_idx), (1, 0),
                       constant_values=1).astype(bool)
        timestamps[b, 1:] = time_idx[jumps] * time_precision
    return timestamps


class WhisperASR:
    """Long-form transcription over discrete speech tokens.

    TPU-native equivalent of the reference's chunked long-form generation
    (generation_whisper.py:277-775): the 30 s seek loop becomes per-segment
    decoding over the codec's exact 30 s token segmentation, and
    ``generate_with_fallback`` (:775-925) becomes a host-side temperature
    ladder gated on compression ratio and avg log-prob (:1027-1070).

    The ASR operates on tokens directly: the post-VQ encoder consumes
    ``codebook[ids] + embed_positions2`` (modeling_whisper.py:1466), so a
    transcript never needs the pre-VQ acoustic states.
    """

    def __init__(self, cfg, post_params, dec_params, codebook,
                 bos_id: int = 1, eos_id: int = 2, max_len: int = 64,
                 segment_tokens: int = 375,
                 timestamp_begin: Optional[int] = None,
                 time_precision: float = 0.02,
                 alignment_heads=None,
                 median_filter_width: int = 7):
        self.cfg = cfg
        self.post = PostVQEncoder(cfg)
        self.dec = WhisperVQDecoder(cfg)
        self.post_params = post_params
        self.dec_params = dec_params
        self.codebook = jnp.asarray(codebook)
        self.bos_id = bos_id
        self.eos_id = eos_id
        self.max_len = max_len
        self.segment_tokens = segment_tokens
        # whisper reserves the vocab tail for <|0.00|>..<|30.00|>
        # (1501 timestamp ids); generation_whisper.py:520 sets
        # timestamp_begin = no_timestamps_token_id + 1
        self.timestamp_begin = (timestamp_begin if timestamp_begin
                                is not None else cfg.vocab_size - 1501)
        self.time_precision = time_precision
        self._ts_decode = jax.jit(
            lambda e, v: timestamp_decode(self.dec, self.dec_params, e, v,
                                          self.bos_id, self.eos_id,
                                          self.timestamp_begin,
                                          max_len=self.max_len))
        self._enc_fn = jax.jit(self._enc_impl)
        self._greedy = jax.jit(
            lambda e, v, r: sample_decode(self.dec, self.dec_params, e, v,
                                          self.bos_id, self.eos_id, r,
                                          temperature=0.0,
                                          max_len=self.max_len))
        self._sample = {}
        self._beam = jax.jit(
            lambda e, v: beam_decode(self.dec, self.dec_params, e, v,
                                     self.bos_id, self.eos_id,
                                     max_len=self.max_len))
        # DTW word-timing config (generation_whisper.py:946-950: the
        # generation config's alignment_heads select (layer, head) pairs;
        # default = every cross-attention head when none are published)
        self.alignment_heads = (
            tuple(tuple(p) for p in alignment_heads)
            if alignment_heads is not None else
            tuple((l, h) for l in range(cfg.decoder_layers)
                  for h in range(cfg.decoder_attention_heads)))
        self.median_filter_width = median_filter_width
        self._cross_attn = jax.jit(
            lambda toks, tv, e, v: self.dec.apply(
                self.dec_params, toks, tv, e, v,
                return_cross_attn=True)[1])

    def _enc_impl(self, ids, valid):
        q = self.codebook[jnp.maximum(ids, 0)]
        q = q * valid[..., None].astype(q.dtype)
        return self.post.apply(self.post_params, q, valid)

    def _segment_states(self, ids: jnp.ndarray):
        st = self.segment_tokens
        t = ids.shape[1]
        pad = (-t) % st
        ids_p = jnp.pad(ids, ((0, 0), (0, pad)))
        valid = jnp.arange(t + pad)[None, :] < t
        segs = ids_p.reshape(-1, st)
        vsegs = valid.reshape(-1, st)
        return self._enc_fn(segs, vsegs), vsegs

    def transcribe(self, ids, beam_size: int = 0,
                   temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                   compression_ratio_threshold: float = 2.4,
                   logprob_threshold: float = -1.0,
                   return_timestamps: bool = False,
                   word_timestamps: bool = False,
                   rng: jax.Array = None):
        """ids (1, T) int32 speech tokens -> list of per-segment transcript
        token arrays (eos/bos stripped), long-form stitched in order.

        beam_size > 1 decodes each segment with beam search (no temperature
        ladder, like the reference where num_beams disables sampling
        fallback); otherwise the greedy->sampling fallback ladder runs.

        ``return_timestamps=True`` decodes under the whisper timestamp
        grammar instead and returns [(start_s, end_s, text_ids)] across
        the stitched segments (generation_whisper.py:349-352,693-711);
        our exact 30 s segmentation makes the segment offset
        ``s * segment_tokens * 80 ms`` rather than a running seek.

        ``word_timestamps=True`` returns [(tokens, times)] per segment:
        token-LEVEL times from cross-attention DTW over the alignment
        heads (generation_whisper.py:176-255 `_extract_token_timestamps`,
        wired at :946-950), offset by the segment start.  Times are per
        encoder position = one speech token = 80 ms at the production
        config (whisper's num_frames//2 mel precision becomes the token
        grid here)."""
        import numpy as np
        ids = jnp.asarray(np.asarray(ids, np.int32).reshape(1, -1))
        enc, vsegs = self._segment_states(ids)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seg_sec = self.segment_tokens \
            * self.cfg.samples_per_token / self.cfg.sampling_rate
        out = []
        for s in range(enc.shape[0]):
            e = enc[s:s + 1]
            v = vsegs[s:s + 1]
            if return_timestamps:
                toks, n = self._ts_decode(e, v)
                out.extend(extract_timestamp_segments(
                    np.asarray(toks)[0], int(np.asarray(n)[0]),
                    self.timestamp_begin, self.time_precision,
                    offset_sec=s * seg_sec))
                continue
            if beam_size > 1:
                toks, n, _ = self._beam(e, v)
                toks, n = np.asarray(toks), int(np.asarray(n)[0])
            else:
                toks, n = self._fallback_decode(
                    e, v, temperatures, compression_ratio_threshold,
                    logprob_threshold, rng)
                rng, _ = jax.random.split(rng)
            if word_timestamps:
                out.append(self._token_times(toks, n, e, v,
                                             offset_sec=s * seg_sec))
                continue
            seq = toks[0, 1:n]                      # strip bos
            seq = seq[seq != self.eos_id]
            out.append(np.asarray(seq, np.int32))
        return out

    def _token_times(self, toks, n: int, e, v, offset_sec: float = 0.0):
        """(tokens (m,), times (m,)) for one decoded segment via
        cross-attention DTW.  One full-prefix forward reproduces the rows
        the mixin concatenates per step (generation_whisper.py:186-191);
        S is cropped to the segment's valid token count (the mixin's
        num_frames crop, :230-240)."""
        import numpy as np
        toks_j = jnp.asarray(np.asarray(toks, np.int32)[:1])
        tv = jnp.arange(toks_j.shape[1])[None, :] < max(n, 1)
        attn = np.asarray(self._cross_attn(toks_j, tv, e, v), np.float32)
        attn = attn[:, :, :, :n, :]                # rows: decoded prefix
        pos_sec = self.cfg.samples_per_token / self.cfg.sampling_rate
        ts = extract_token_timestamps(
            attn, self.alignment_heads,
            median_filter_width=self.median_filter_width,
            time_precision=pos_sec,
            num_positions=int(np.asarray(v).sum()))
        # reference alignment (:951): sequences[:, start_idx:] pairs with
        # token_timestamps[:, start_idx:] — position p gets jump p-1
        seq = np.asarray(toks)[0, 1:n]
        times = ts[0, 1:n] + offset_sec
        keep = seq != self.eos_id
        return (seq[keep].astype(np.int32),
                times[keep].astype(np.float32))

    def _fallback_decode(self, e, v, temperatures, cr_threshold,
                         lp_threshold, rng):
        """Temperature ladder: retry with higher temperature while the
        output looks degenerate (generation_whisper.py:775,1027-1070)."""
        import numpy as np
        best = None
        for temp in temperatures:
            if temp == 0.0:
                toks, n, lp = self._greedy(e, v, rng)
            else:
                key = round(float(temp), 3)
                if key not in self._sample:
                    self._sample[key] = jax.jit(
                        lambda ee, vv, rr, _t=temp: sample_decode(
                            self.dec, self.dec_params, ee, vv, self.bos_id,
                            self.eos_id, rr, temperature=_t,
                            max_len=self.max_len))
                toks, n, lp = self._sample[key](e, v, rng)
            toks = np.asarray(toks)
            n_i = int(np.asarray(n)[0])
            avg_lp = float(np.asarray(lp)[0]) / max(n_i, 1)
            cr = compression_ratio(toks[0, 1:n_i])
            best = (toks, n_i)
            needs_fallback = (cr > cr_threshold) or (avg_lp < lp_threshold)
            if not needs_fallback:
                break
            rng, _ = jax.random.split(rng)
        return best
