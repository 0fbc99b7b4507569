"""Speech-token language model (CosyVoice2 Qwen2LM rebuilt, llm.py:263-611).

Text tokens -> autoregressive speech tokens with repetition-aware nucleus
sampling.  The ENTIRE generation loop — per-step backbone forward, logits,
RAS sampling, EOS handling — runs inside one jitted ``lax.while_loop``
(`generate`): zero per-token host traffic, the TPU-native answer to the
reference's vLLM fast path (llm.py:466-494).

Also provides the bistream text/speech interleave (mix ratio 5:15,
llm.py:514-611) as a host-coordinated session over the same jitted pieces.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Tuple

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp
import flax.linen as nn

from .qwen2 import Qwen2Config, Qwen2Model, KVCache, tiny_qwen2_config


@dataclasses.dataclass(frozen=True)
class SpeechLMConfig:
    backbone: Qwen2Config = Qwen2Config()
    speech_token_size: int = 6561        # vocab 16384 for the MOSS tokenizer
    top_p: float = 0.8
    top_k: int = 25
    win_size: int = 10
    tau_r: float = 0.1
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0
    mix_ratio: Tuple[int, int] = (5, 15)


def tiny_speech_lm_config() -> SpeechLMConfig:
    return SpeechLMConfig(backbone=tiny_qwen2_config(),
                          speech_token_size=32, top_k=8, win_size=4)


def ras_sample(key: jax.Array, logp: jnp.ndarray, history: jnp.ndarray,
               cfg: SpeechLMConfig) -> jnp.ndarray:
    """Repetition-aware nucleus sampling (utils/common.py:111-139):
    nucleus(top_p, top_k); if the candidate appeared >= win*tau_r times in
    the last ``win_size`` tokens, fall back to plain random sampling."""
    k1, k2 = jax.random.split(key)
    probs = jax.nn.softmax(logp)
    order = jnp.argsort(-probs)
    sp = probs[order]
    cum = jnp.cumsum(sp)
    keep = ((cum - sp) < cfg.top_p) & (jnp.arange(sp.shape[0]) < cfg.top_k)
    keep = keep.at[0].set(True)
    masked = jnp.where(keep, sp, 0.0)
    cand = order[jax.random.categorical(k1, jnp.log(masked + 1e-20))]

    rep = jnp.sum((history == cand).astype(jnp.int32))
    fallback = order[jax.random.categorical(k2, jnp.log(sp + 1e-20))]
    return jnp.where(rep >= cfg.win_size * cfg.tau_r, fallback, cand)


@flax.struct.dataclass
class GenCarry:
    cache: KVCache
    cur_emb: jnp.ndarray      # (1, 1, D)
    out: jnp.ndarray          # (max_len,) i32
    history: jnp.ndarray      # (win_size,) i32 ring of recent tokens
    i: jnp.ndarray            # () i32
    done: jnp.ndarray         # () bool
    key: jax.Array


class Qwen2SpeechLM(nn.Module):
    cfg: SpeechLMConfig

    def setup(self):
        c = self.cfg
        self.llm = Qwen2Model(c.backbone, name="llm")
        # 0 = sos_eos, 1 = task_id (llm.py:289-291)
        self.llm_embedding = nn.Embed(2, c.backbone.hidden_size,
                                      name="llm_embedding")
        self.speech_embedding = nn.Embed(c.speech_token_size + 3,
                                         c.backbone.hidden_size,
                                         name="speech_embedding")
        self.llm_decoder = nn.Dense(c.speech_token_size + 3,
                                    name="llm_decoder")

    # ---------------------------------------------------------------- emb
    def prompt_embeds(self, text: jnp.ndarray,
                      prompt_speech: jnp.ndarray) -> jnp.ndarray:
        """[sos, text emb, task_id, prompt speech emb] (llm.py:436-443)."""
        sos = self.llm_embedding(jnp.zeros((1, 1), jnp.int32))
        task = self.llm_embedding(jnp.ones((1, 1), jnp.int32))
        parts = [sos, self.llm.embed_tokens(text), task]
        if prompt_speech.shape[1] > 0:
            parts.append(self.speech_embedding(prompt_speech))
        return jnp.concatenate(parts, axis=1)

    def prefill(self, embeds: jnp.ndarray,
                cache: Optional[KVCache] = None) -> Tuple[jnp.ndarray,
                                                          KVCache]:
        if cache is None:
            cache = self.llm.init_cache(embeds.shape[0])
        h, cache = self.llm.forward_embeds(embeds, cache)
        return h, cache

    # ----------------------------------------------------------- generate
    def generate(self, embeds: jnp.ndarray, key: jax.Array,
                 min_len: jnp.ndarray, max_len: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full AR generation in one traced while_loop.

        Returns (tokens (max_len,) i32 padded with eos, count ()).
        """
        c = self.cfg
        eos = c.speech_token_size
        h, cache = self.prefill(embeds)
        logits0 = self.llm_decoder(h[:, -1])

        def sample(logits, i, history, key):
            logp = jax.nn.log_softmax(logits[0])
            # forbid eos (and the >eos special ids) before min_len
            special = jnp.arange(logp.shape[0]) >= eos
            logp = jnp.where(special & (i < min_len), -1e10, logp)
            return ras_sample(key, logp, history, c)

        def cond(carry: GenCarry):
            return (~carry.done) & (carry.i < max_len)

        def body(carry: GenCarry):
            key, k_s = jax.random.split(carry.key)
            h, cache = self.llm.forward_embeds(carry.cur_emb, carry.cache)
            logits = self.llm_decoder(h[:, -1])
            tok = sample(logits, carry.i, carry.history, k_s)
            done = tok >= eos
            out = carry.out.at[carry.i].set(
                jnp.where(done, eos, tok).astype(jnp.int32))
            history = jnp.roll(carry.history, -1).at[-1].set(tok)
            cur = self.speech_embedding(tok[None, None])
            return GenCarry(cache=cache, cur_emb=cur, out=out,
                            history=history,
                            i=carry.i + jnp.where(done, 0, 1),
                            done=done, key=key)

        key, k0 = jax.random.split(key)
        tok0 = sample(logits0, jnp.zeros((), jnp.int32),
                      jnp.full((c.win_size,), -1, jnp.int32), k0)
        done0 = tok0 >= eos
        out = jnp.full((max_len,), eos, jnp.int32)
        out = out.at[0].set(jnp.where(done0, eos, tok0).astype(jnp.int32))
        carry = GenCarry(
            cache=cache,
            cur_emb=self.speech_embedding(tok0[None, None]),
            out=out,
            history=jnp.full((c.win_size,), -1,
                             jnp.int32).at[-1].set(tok0),
            i=jnp.where(done0, 0, 1).astype(jnp.int32),
            done=done0, key=key)
        final = jax.lax.while_loop(cond, body, carry)
        return final.out, final.i

    def __call__(self, text: jnp.ndarray, prompt_speech: jnp.ndarray,
                 key: jax.Array, max_len: int = 64):
        """Convenience inference entry (llm.py:428-462)."""
        embeds = self.prompt_embeds(text, prompt_speech)
        min_len = jnp.asarray(
            int(text.shape[1] * self.cfg.min_token_text_ratio), jnp.int32)
        return self.generate(embeds, key, min_len, max_len)


class BistreamSession:
    """Live text/speech interleave (llm.py:514-611): consume text in chunks
    of mix_ratio[0] tokens, emit mix_ratio[1] speech tokens per chunk; one
    device dispatch per phase."""

    def __init__(self, model: Qwen2SpeechLM, params, key: jax.Array):
        self.model = model
        self.params = params
        self.key = key
        self.cache = None
        self._prefill = jax.jit(
            lambda p, e, c: model.apply(p, e, c, method=model.prefill))
        self._gen_chunk = jax.jit(self._gen_impl,
                                  static_argnames=("n", "final"))
        self._text_buf: List[int] = []
        self._started = False
        # RAS history ring persists across chunks (the reference feeds the
        # full decoded-token history to sampling_ids, llm.py:580,602)
        self._history = jnp.full((model.cfg.win_size,), -1, jnp.int32)
        # embedding of the last accepted speech token, not yet in the KV
        # cache (fed before the next phase's inputs)
        self._pending_emb = None

    def _gen_impl(self, params, logits0, cache, history, key, n, final):
        """Sample up to n speech tokens starting from ``logits0`` (the last
        prefilled position), feeding speech embeddings autoregressively.

        Mid-stream (final=False): eos is masked, the FILL token
        (speech_token_size + 2) ends the chunk (llm.py:570-591).
        Final (final=True): eos is allowed and ends generation
        (llm.py:595-611, ignore_eos=False).

        Returns (tokens (n,), count, cache, history, last_emb, stopped):
        ``last_emb`` is the embedding of the final accepted token, which is
        NOT yet in the cache (the reference never feeds the fill/eos token
        back; when the budget ends without a stop token the pending
        embedding must prefix the next phase's inputs)."""
        model = self.model

        def gen(mdl, logits0, cache, history, key):
            c = mdl.cfg
            eos = c.speech_token_size
            fill = eos + 2

            def sample(logits, hist, ks):
                logp = jax.nn.log_softmax(logits[0])
                ids = jnp.arange(logp.shape[0])
                if final:
                    allow = ids <= eos                 # specials masked
                else:
                    allow = (ids < eos) | (ids == fill)
                logp = jnp.where(allow, logp, -1e10)
                return ras_sample(ks, logp, hist, c)

            def is_stop(tok):
                return tok == (eos if final else fill)

            def cond(carry: GenCarry):
                return (~carry.done) & (carry.i < n)

            def body(carry: GenCarry):
                key, ks = jax.random.split(carry.key)
                h, cache = mdl.llm.forward_embeds(carry.cur_emb, carry.cache)
                logits = mdl.llm_decoder(h[:, -1])
                tok = sample(logits, carry.history, ks)
                stop = is_stop(tok)
                out = carry.out.at[carry.i].set(
                    jnp.where(stop, carry.out[carry.i],
                              tok).astype(jnp.int32))
                history = jnp.where(
                    stop, carry.history,
                    jnp.roll(carry.history, -1).at[-1].set(tok))
                cur = jnp.where(stop, carry.cur_emb,
                                mdl.speech_embedding(tok[None, None]))
                return GenCarry(cache=cache, cur_emb=cur, out=out,
                                history=history,
                                i=carry.i + jnp.where(stop, 0, 1),
                                done=stop, key=key)

            key, k0 = jax.random.split(key)
            tok0 = sample(logits0, history, k0)
            stop0 = is_stop(tok0)
            out = jnp.full((n,), eos, jnp.int32)
            out = out.at[0].set(jnp.where(stop0, eos, tok0).astype(jnp.int32))
            emb0 = mdl.speech_embedding(tok0[None, None])
            carry = GenCarry(
                cache=cache, cur_emb=emb0, out=out,
                history=jnp.where(
                    stop0, history,
                    jnp.roll(history, -1).at[-1].set(tok0)),
                i=jnp.where(stop0, 0, 1).astype(jnp.int32),
                done=stop0, key=key)
            f = jax.lax.while_loop(cond, body, carry)
            return f.out, f.i, f.cache, f.history, f.cur_emb, f.done

        return model.apply(params, logits0, cache, history, key, method=gen)

    def _run_chunk(self, logits0, n, final):
        self.key, k = jax.random.split(self.key)
        toks, count, self.cache, self._history, last_emb, stopped = \
            self._gen_chunk(self.params, logits0, self.cache, self._history,
                            k, n=n, final=final)
        count = int(count)
        # budget exhausted without fill/eos: the last token's embedding has
        # not been fed through the backbone yet
        self._pending_emb = None if bool(stopped) or count == 0 else last_emb
        return np.asarray(toks)[:count]

    def push_text(self, text_ids: Iterable[int]) -> List[np.ndarray]:
        """Feed text tokens; yields speech chunks as ratios fill."""
        self._text_buf.extend(int(t) for t in text_ids)
        n_text, n_speech = self.model.cfg.mix_ratio
        out = []
        while len(self._text_buf) >= n_text:
            chunk, self._text_buf = (self._text_buf[:n_text],
                                     self._text_buf[n_text:])
            ids = jnp.asarray(chunk, jnp.int32)[None]
            embeds = self.model.apply(
                self.params, ids,
                method=lambda m, i: m.llm.embed_tokens(i))
            if not self._started:
                sos = self.model.apply(
                    self.params, jnp.zeros((1, 1), jnp.int32),
                    method=lambda m, i: m.llm_embedding(i))
                embeds = jnp.concatenate([sos, embeds], axis=1)
                self.cache = self.model.apply(
                    self.params, 1,
                    method=lambda m, b: m.llm.init_cache(b))
                self._started = True
            if self._pending_emb is not None:
                embeds = jnp.concatenate([self._pending_emb, embeds], axis=1)
                self._pending_emb = None
            h, self.cache = self._prefill(self.params, embeds, self.cache)
            logits0 = self.model.apply(
                self.params, h[:, -1],
                method=lambda m, x: m.llm_decoder(x))
            toks = self._run_chunk(logits0, n_speech, final=False)
            if toks.size:
                out.append(toks)
        return out

    def flush(self, n_final: int | None = None):
        """Consume any trailing text (< mix_ratio[0] tokens) and decode
        until eos (the reference's end-of-text handling, llm.py:593-611:
        ignore_eos=False; generation stops at the first eos instead of
        emitting a fixed-length block).  ``n_final`` bounds the decode."""
        n_text, n_speech = self.model.cfg.mix_ratio
        n_final = n_final or 4 * n_speech
        out = []
        if not self._started and not self._text_buf:
            return out
        chunk, self._text_buf = self._text_buf, []
        ids = jnp.asarray(chunk, jnp.int32)[None] if chunk else None
        embeds = None
        if ids is not None and ids.shape[1] > 0:
            embeds = self.model.apply(
                self.params, ids, method=lambda m, i: m.llm.embed_tokens(i))
        task = self.model.apply(
            self.params, jnp.ones((1, 1), jnp.int32),
            method=lambda m, i: m.llm_embedding(i))
        if not self._started:
            sos = self.model.apply(
                self.params, jnp.zeros((1, 1), jnp.int32),
                method=lambda m, i: m.llm_embedding(i))
            embeds = (jnp.concatenate([sos, embeds, task], axis=1)
                      if embeds is not None
                      else jnp.concatenate([sos, task], axis=1))
            self.cache = self.model.apply(
                self.params, 1, method=lambda m, b: m.llm.init_cache(b))
            self._started = True
        else:
            # [last pending speech emb] ++ trailing text ++ task
            # (llm.py:596: lm_input ++ text_cache ++ task_id_emb)
            parts = ([] if self._pending_emb is None
                     else [self._pending_emb])
            if embeds is not None:
                parts.append(embeds)
            parts.append(task)
            embeds = jnp.concatenate(parts, axis=1)
            self._pending_emb = None
        h, self.cache = self._prefill(self.params, embeds, self.cache)
        logits0 = self.model.apply(
            self.params, h[:, -1], method=lambda m, x: m.llm_decoder(x))
        toks = self._run_chunk(logits0, n_final, final=True)
        if toks.size:
            out.append(toks)
        return out
