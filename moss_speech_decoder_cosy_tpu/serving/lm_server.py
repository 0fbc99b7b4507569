"""Continuous batching engine for the speech LM (the vLLM role).

The reference leans on vLLM for fast AR decode (cosyvoice/llm/llm.py:
466-494 + cosyvoice/vllm/cosyvoice2.py); our single-dispatch while_loop
(models/llm/speech_lm.py) is the TPU answer for one stream.  This module
adds the multi-request serving layer on top: a fixed pool of B slots,
each an independent request at its own KV position
(models/llm/qwen2.py::SlotKVCache), with

- bucketed single-slot prefill (admission at any time, no pause of the
  other slots' token streams between step dispatches),
- batched decode: one dispatch advances ALL active slots ``step_chunk``
  tokens (a lax.scan of single-token steps — per-slot RAS sampling,
  min-length masking, per-slot RNG chains),
- slot eviction/reuse on EOS (prefill simply overwrites the slot; stale
  keys beyond the new length are masked by position).

Per-slot sampling reproduces Qwen2SpeechLM.generate token-for-token for
the same seed (tests/test_llm.py::test_continuous_batcher_*): admission
order and co-batched neighbors cannot change a request's output.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp

from ..models.llm.speech_lm import Qwen2SpeechLM, ras_sample


@flax.struct.dataclass
class BatchState:
    cache: object                 # SlotKVCache
    cur_emb: jnp.ndarray          # (B, 1, D)
    history: jnp.ndarray          # (B, win) i32
    keys: jnp.ndarray             # (B, 2) uint32
    counts: jnp.ndarray           # (B,) i32 emitted tokens
    done: jnp.ndarray             # (B,) bool
    min_len: jnp.ndarray          # (B,) i32


class ContinuousBatcher:
    """Admission + batched decode over a fixed slot pool."""

    def __init__(self, model: Qwen2SpeechLM, params, slots: int = 4,
                 step_chunk: int = 16,
                 text_buckets=(8, 16, 32, 64),
                 speech_buckets=(0, 16, 64),
                 recent: int = 0):
        """``recent > 0``: two-tier KV cache (qwen2.SlotKVCache docstring)
        — per-token writes hit an R=recent ring, bulk-flushed into the
        main cache between decode chunks (requires
        recent > step_chunk)."""
        self.model = model
        self.params = params
        self.b = slots
        self.step_chunk = step_chunk
        self.recent = recent
        self._since_flush = 0
        if recent:
            assert recent > step_chunk, (recent, step_chunk)
        self.text_buckets = tuple(sorted(text_buckets))
        self.speech_buckets = tuple(sorted(speech_buckets))
        c = model.cfg
        self.eos = c.speech_token_size
        self._free = list(range(slots))
        self._next_req = 0
        self._slot_req: Dict[int, int] = {}      # slot -> active request
        self._req_slot: Dict[int, int] = {}
        self._streams: Dict[int, List[int]] = {}  # request id -> tokens
        self._finished: Dict[int, bool] = {}      # request id -> done
        self._max_len: Dict[int, int] = {}

        d = c.backbone.hidden_size
        self.state = BatchState(
            cache=jax.jit(
                lambda p: model.apply(
                    p, slots,
                    method=lambda m, n: m.llm.init_slot_cache(
                        n, recent=recent))
            )(params),
            cur_emb=jnp.zeros((slots, 1, d)),
            history=jnp.full((slots, c.win_size), -1, jnp.int32),
            keys=jnp.zeros((slots, 2), jnp.uint32),
            counts=jnp.zeros((slots,), jnp.int32),
            done=jnp.ones((slots,), bool),
            min_len=jnp.zeros((slots,), jnp.int32),
        )
        self._submit = jax.jit(self._submit_impl)
        self._steps = jax.jit(self._steps_impl,
                              static_argnames=("n_steps",))
        self._mark_done = jax.jit(
            lambda st, slot: dataclasses.replace(
                st, done=st.done.at[slot].set(True)))
        self._flush = jax.jit(
            lambda p, st: dataclasses.replace(
                st, cache=self.model.apply(
                    p, st.cache,
                    method=lambda m, cc: m.llm.flush_slots(cc))))

    # ------------------------------------------------------------ sampling
    def _sample(self, mdl, key, logits, count, history, min_len):
        logp = jax.nn.log_softmax(logits)
        special = jnp.arange(logp.shape[0]) >= self.eos
        logp = jnp.where(special & (count < min_len), -1e10, logp)
        return ras_sample(key, logp, history, mdl.cfg)

    # ------------------------------------------------------------- submit
    def _submit_impl(self, params, state: BatchState, slot, text, n_text,
                     speech, n_speech, seed):
        """Prefill ONE slot: assemble [sos, text, task, speech] embeds
        from right-padded buckets (gather-compacted), prefill, sample the
        first token (same RNG chain as Qwen2SpeechLM.generate)."""
        mdl = self.model

        def impl(m: Qwen2SpeechLM):
            tb = text.shape[1]
            sos = m.llm_embedding(jnp.zeros((1, 1), jnp.int32))
            task = m.llm_embedding(jnp.ones((1, 1), jnp.int32))
            text_e = m.llm.embed_tokens(text)
            speech_e = m.speech_embedding(speech)
            src = jnp.concatenate([sos, text_e, task, speech_e], axis=1)
            j = jnp.arange(src.shape[1])
            gmap = jnp.where(
                j == 0, 0,
                jnp.where(j <= n_text, j,
                          jnp.where(j == n_text + 1, tb + 1,
                                    jnp.minimum(j + tb - n_text,
                                                src.shape[1] - 1))))
            embeds = src[0][gmap][None]
            n_valid = 2 + n_text + n_speech

            last, cache = m.llm.prefill_slot(state.cache, slot, embeds,
                                             n_valid)
            logits0 = m.llm_decoder(last)[0]

            key0 = jax.random.PRNGKey(seed)
            key, k0 = jax.random.split(key0)
            min_len = (n_text.astype(jnp.float32)
                       * m.cfg.min_token_text_ratio).astype(jnp.int32)
            hist0 = jnp.full((m.cfg.win_size,), -1, jnp.int32)
            tok0 = self._sample(m, k0, logits0, jnp.zeros((), jnp.int32),
                                hist0, min_len)
            done0 = tok0 >= self.eos
            cur = m.speech_embedding(tok0[None, None])
            new = BatchState(
                cache=cache,
                cur_emb=state.cur_emb.at[slot].set(cur[0]),
                history=state.history.at[slot].set(
                    hist0.at[-1].set(tok0)),
                keys=state.keys.at[slot].set(key),
                # generate counts tok0 (i=1 after a successful first
                # sample) — the min-length mask depends on this
                counts=state.counts.at[slot].set(
                    jnp.where(done0, 0, 1).astype(jnp.int32)),
                done=state.done.at[slot].set(done0),
                min_len=state.min_len.at[slot].set(min_len),
            )
            return new, tok0, done0

        return mdl.apply(params, method=lambda m: impl(m))

    def submit(self, text_ids, prompt_speech_ids=None,
               seed: int = 0, max_len: int = 512) -> Optional[int]:
        """Admit a request; returns a request id or None when full.
        Raises ValueError (before taking a slot) when the text/prompt is
        longer than the largest configured bucket."""
        text = np.asarray(text_ids, np.int32).reshape(1, -1)
        speech = (np.zeros((1, 0), np.int32) if prompt_speech_ids is None
                  else np.asarray(prompt_speech_ids,
                                  np.int32).reshape(1, -1))
        tb = next((x for x in self.text_buckets if x >= text.shape[1]),
                  None)
        sb = next((x for x in self.speech_buckets
                   if x >= speech.shape[1]), None)
        if tb is None or sb is None:
            raise ValueError(
                f"request exceeds buckets: text {text.shape[1]} > "
                f"{self.text_buckets[-1]} or prompt {speech.shape[1]} > "
                f"{self.speech_buckets[-1]}")
        if not self._free:
            return None
        slot = self._free.pop(0)
        req = self._next_req
        self._next_req += 1
        self._slot_req[slot] = req
        self._req_slot[req] = slot
        n_text = text.shape[1]
        n_speech = speech.shape[1]
        text = np.pad(text, ((0, 0), (0, tb - n_text)))
        speech = np.pad(speech, ((0, 0), (0, sb - n_speech)))
        self.state, tok0, done0 = self._submit(
            self.params, self.state, jnp.asarray(slot, jnp.int32),
            jnp.asarray(text), jnp.asarray(n_text, jnp.int32),
            jnp.asarray(speech), jnp.asarray(n_speech, jnp.int32),
            jnp.asarray(seed, jnp.uint32))
        tok0 = int(tok0)
        done0 = bool(done0)
        self._streams[req] = [] if done0 else [tok0]
        self._finished[req] = done0
        self._max_len[req] = max_len
        if done0:
            self._release(slot)
        return req

    # -------------------------------------------------------------- decode
    def _steps_impl(self, params, state: BatchState, n_steps: int):
        mdl = self.model

        def impl(m: Qwen2SpeechLM):
            def step(st: BatchState, _):
                splits = jax.vmap(jax.random.split)(st.keys)
                keys, k_s = splits[:, 0], splits[:, 1]
                h, cache = m.llm.decode_step_slots(
                    st.cur_emb, st.cache, advance=~st.done)
                logits = m.llm_decoder(h)                    # (B, V)
                toks = jax.vmap(
                    lambda kk, lg, ct, hi, mn: self._sample(
                        m, kk, lg, ct, hi, mn))(
                    k_s, logits, st.counts, st.history, st.min_len)
                newly_done = toks >= self.eos
                active = ~st.done
                emit = jnp.where(active & ~newly_done, toks, self.eos)
                history = jnp.where(
                    active[:, None],
                    jnp.roll(st.history, -1, axis=1).at[:, -1].set(toks),
                    st.history)
                cur = m.speech_embedding(toks[:, None])
                cur = jnp.where(active[:, None, None], cur, st.cur_emb)
                counts = st.counts + (active & ~newly_done).astype(
                    jnp.int32)
                done = st.done | newly_done
                st2 = BatchState(cache=cache, cur_emb=cur,
                                 history=history, keys=keys,
                                 counts=counts, done=done,
                                 min_len=st.min_len)
                return st2, (emit, active & ~newly_done)

            return jax.lax.scan(step, state, None, length=n_steps)

        return mdl.apply(params, method=lambda m: impl(m))

    def step(self) -> Dict[int, List[int]]:
        """Advance all active slots ``step_chunk`` tokens; returns the
        newly emitted tokens per request id (empty dict when idle)."""
        if not any(req is not None and not self._finished[req]
                   for req in self._slot_req.values()):
            return {}
        if self.recent and (self._since_flush + self.step_chunk
                            >= self.recent):
            self.state = self._flush(self.params, self.state)
            self._since_flush = 0
        self.state, (emits, ok) = self._steps(
            self.params, self.state, n_steps=self.step_chunk)
        self._since_flush += self.step_chunk
        emits = np.asarray(emits)                  # (n, B)
        ok = np.asarray(ok)
        out: Dict[int, List[int]] = {}
        for slot, req in list(self._slot_req.items()):
            if req is None or self._finished[req]:
                continue
            toks = self._streams[req]
            new = [int(t) for t, o in zip(emits[:, slot], ok[:, slot])
                   if o]
            got_eos = not all(ok[:, slot])
            room = self._max_len[req] - len(toks)
            capped = len(new) >= room
            if capped:                           # cap BEFORE reporting
                new = new[:room]
                got_eos = True
            if new:
                toks.extend(new)
                out[req] = new
            if got_eos:
                if capped and all(ok[:, slot]):
                    # max_len stop without device EOS: silence the slot
                    # so later dispatches don't keep decoding a zombie
                    self.state = self._mark_done(
                        self.state, jnp.asarray(slot, jnp.int32))
                self._finished[req] = True
                self._release(slot)
        return out

    def _release(self, slot: int):
        self._slot_req[slot] = None
        if slot not in self._free:
            self._free.append(slot)

    # ------------------------------------------------------------- queries
    def result(self, req: int) -> List[int]:
        return self._streams.get(req, [])

    def finished(self, req: int) -> bool:
        return self._finished.get(req, False)

    def run_all(self, max_steps: int = 1000) -> None:
        for _ in range(max_steps):
            if not self.step() and all(
                    self._finished.get(s, True) for s in self._streams):
                return
