"""Fully device-resident streaming decode.

The host-mediated session (audio_decoder.StreamSession) is correct but pays
host<->device round trips per hop; on this environment a single transfer
costs ~50-200 ms while the fused chunk compute costs ~1 ms (see
BENCH_NOTES.md).  This module keeps EVERYTHING on device:

- the token stream lives in a padded device buffer, uploaded once (or
  incrementally via async dynamic_update_slice),
- one jitted ``step`` per hop fuses flow (bounded 40-token window, right-pad
  invariance) -> mel slice -> hift with mel/source caches -> Hamming
  cross-fade -> cache update,
- per-hop wav segments stay on device; ``stream_decode`` concatenates and
  fetches once at the end.

A handful of compiled programs per (block_size, prompt) geometry: first
hop, steady hop (plus power-of-two lax.scan bulk variants), finalize — the
TPU answer to the reference's per-shape TRT engines
(flow_matching.py:129-156).  Flow and vocoder stay separate XLA programs:
fusing both into one stalls this environment's remote compiler.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp


@jax.jit
def _pcm16_device(wav: jnp.ndarray) -> jnp.ndarray:
    return (jnp.clip(wav, -1.0, 1.0) * 32767.0).astype(jnp.int16)


def _parallel_fetch(arr: jnp.ndarray, n_threads: int = 8) -> np.ndarray:
    """Device->host fetch in concurrent slices.  The transfer path here
    (axon relay) serves concurrent streams ~10-20x faster than one large
    synchronous copy (measured: 19 MB/s vs ~1-2 MB/s) — see BENCH_NOTES."""
    import threading
    t = arr.shape[-1]
    if t < n_threads * 1024:
        return np.asarray(arr)
    bounds = [t * i // n_threads for i in range(n_threads + 1)]
    parts = [arr[..., bounds[i]: bounds[i + 1]] for i in range(n_threads)]
    jax.block_until_ready(parts)
    out: list = [None] * n_threads

    def get(i):
        out[i] = np.asarray(parts[i])

    threads = [threading.Thread(target=get, args=(i,))
               for i in range(n_threads)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    return np.concatenate(out, axis=-1)


@flax.struct.dataclass
class DeviceStreamState:
    token_offset: jnp.ndarray     # () i32, emitted tokens so far
    mel_cache: jnp.ndarray        # (1, mel_cache_len, n_mel)
    source_cache: jnp.ndarray     # (1, scl, 1)
    speech_cache: jnp.ndarray     # (1, scl)


class DeviceStreamDecoder:
    """Compiled streaming decoder bound to an AudioDecoder's params."""

    def __init__(self, dec, prompt_token: np.ndarray,
                 prompt_feat: np.ndarray, embedding: np.ndarray,
                 block_size: int, max_token_len: int, batch: int = 1):
        self.dec = dec
        self.batch = batch
        self.hop = block_size
        self.window = max_token_len
        self.p = int(prompt_token.shape[1])
        self.prompt_pad = int(
            math.ceil(self.p / self.hop) * self.hop - self.p)
        self.la = dec.lookahead
        self.ratio = dec.ratio
        self.frame = dec.hift_cfg.total_upsample
        self.mel_cache_len = dec.pipe_cfg.mel_cache_len
        self.scl = dec.source_cache_len
        dt = dec.compute_dtype or jnp.float32

        def _bcast(x):
            x = jnp.asarray(x)
            if x.shape[0] == 1 and batch > 1:
                x = jnp.broadcast_to(x, (batch,) + x.shape[1:])
            return x
        self._prompt_tok = _bcast(prompt_token).astype(jnp.int32)
        self._prompt_feat = _bcast(prompt_feat).astype(dt)
        self._emb = _bcast(embedding).astype(dt)
        win = np.hamming(2 * self.scl).astype(np.float32)
        self._fade_in = jnp.asarray(win[: self.scl])
        self._fade_out = jnp.asarray(win[self.scl:])

        self._step = jax.jit(
            self._step_impl,
            static_argnames=("emit_tokens", "first", "finalize"))
        # split variant: two smaller XLA programs (much faster to compile
        # than the monolith; still zero host crossings — intermediates are
        # device arrays)
        self._flow_step = jax.jit(
            self._flow_step_impl,
            static_argnames=("emit_tokens", "finalize"))
        self._voc_step = jax.jit(
            self._voc_step_impl, static_argnames=("first", "finalize"))
        self._flow_scan = jax.jit(
            self._flow_scan_impl,
            static_argnames=("n_hops", "emit_tokens"))
        self._voc_scan = jax.jit(
            self._voc_scan_impl, static_argnames=("emit_tokens",))
        self._flow_batched = jax.jit(
            self._flow_batched_impl,
            static_argnames=("n_hops", "emit_tokens"))

    # ------------------------------------------------------------------
    def init_state(self) -> DeviceStreamState:
        d = self.dec
        b = self.batch
        n_mel = d.flow_cfg.output_size
        return DeviceStreamState(
            token_offset=jnp.zeros((), jnp.int32),
            mel_cache=jnp.zeros((b, self.mel_cache_len, n_mel)),
            source_cache=jnp.zeros((b, self.scl, 1)),
            speech_cache=jnp.zeros((b, self.scl)),
        )

    def _step_impl(self, flow_params, hift_params, token_buf: jnp.ndarray,
                   state: DeviceStreamState,
                   emit_tokens: int, first: bool, finalize: bool
                   ) -> Tuple[jnp.ndarray, DeviceStreamState]:
        """token_buf: (1, cap) device buffer of stream tokens (no prompt).

        Returns (wav segment (1, emit_samples), new state)."""
        d = self.dec
        w = self.window
        b = token_buf.shape[0]
        offset = state.token_offset
        end = offset + emit_tokens + (0 if finalize else self.la)
        start = jnp.maximum(end - w, 0)
        window = jax.lax.dynamic_slice(token_buf, (0, start),
                                       (b, w))          # (B, W)
        tokens = jnp.concatenate([self._prompt_tok, window], axis=1)
        n_valid = self.p + (end - start)
        valid = jnp.broadcast_to(
            jnp.arange(self.p + w)[None, :] < n_valid, tokens.shape)

        mel_full = d.flow.apply(flow_params, tokens, valid,
                                self._prompt_feat, self._emb,
                                streaming=True, finalize=finalize)
        actual_offset = offset - start
        emit_mel = jax.lax.dynamic_slice(
            mel_full, (0, (self.p + actual_offset) * self.ratio, 0),
            (b, emit_tokens * self.ratio, mel_full.shape[-1]))

        dt = d.compute_dtype or jnp.float32
        if first:
            mel_in = emit_mel
            cache_source = jnp.zeros((emit_mel.shape[0], 0, 1), dt)
        else:
            mel_in = jnp.concatenate(
                [state.mel_cache.astype(emit_mel.dtype), emit_mel], axis=1)
            cache_source = state.source_cache.astype(dt)
        wav, source = d.hift.apply(hift_params, mel_in.astype(dt),
                                   cache_source, jax.random.PRNGKey(0))
        if not first:
            head = (wav[:, : self.scl] * self._fade_in
                    + state.speech_cache * self._fade_out)
            wav = jnp.concatenate([head, wav[:, self.scl:]], axis=1)

        if finalize:
            emit = wav
            new_state = state.replace(token_offset=offset + emit_tokens)
        else:
            emit = wav[:, : wav.shape[1] - self.scl]
            new_state = DeviceStreamState(
                token_offset=offset + emit_tokens,
                mel_cache=mel_in[:, mel_in.shape[1] - self.mel_cache_len:]
                .astype(jnp.float32),
                source_cache=source[:, source.shape[1] - self.scl:]
                .astype(jnp.float32),
                speech_cache=wav[:, wav.shape[1] - self.scl:]
                .astype(jnp.float32),
            )
        return emit, new_state

    def _flow_step_impl(self, flow_params, token_buf: jnp.ndarray,
                        token_offset: jnp.ndarray,
                        emit_tokens: int, finalize: bool) -> jnp.ndarray:
        """Flow half of the hop: window slice -> mel -> emit slice."""
        d = self.dec
        w = self.window
        b = token_buf.shape[0]
        end = token_offset + emit_tokens + (0 if finalize else self.la)
        start = jnp.maximum(end - w, 0)
        window = jax.lax.dynamic_slice(token_buf, (0, start), (b, w))
        tokens = jnp.concatenate([self._prompt_tok, window], axis=1)
        n_valid = self.p + (end - start)
        valid = jnp.broadcast_to(
            jnp.arange(self.p + w)[None, :] < n_valid, tokens.shape)
        mel_full = d.flow.apply(flow_params, tokens, valid,
                                self._prompt_feat, self._emb,
                                streaming=True, finalize=finalize)
        actual_offset = token_offset - start
        return jax.lax.dynamic_slice(
            mel_full, (0, (self.p + actual_offset) * self.ratio, 0),
            (b, emit_tokens * self.ratio, mel_full.shape[-1]))

    def _voc_step_impl(self, hift_params, emit_mel: jnp.ndarray,
                       state: DeviceStreamState, first: bool,
                       finalize: bool
                       ) -> Tuple[jnp.ndarray, DeviceStreamState]:
        """Vocoder half: hift with caches + cross-fade + cache update."""
        d = self.dec
        emit_tokens = emit_mel.shape[1] // self.ratio
        dt = d.compute_dtype or jnp.float32
        offset = state.token_offset
        if first:
            mel_in = emit_mel
            cache_source = jnp.zeros((emit_mel.shape[0], 0, 1), dt)
        else:
            mel_in = jnp.concatenate(
                [state.mel_cache.astype(emit_mel.dtype), emit_mel], axis=1)
            cache_source = state.source_cache.astype(dt)
        wav, source = d.hift.apply(hift_params, mel_in.astype(dt),
                                   cache_source, jax.random.PRNGKey(0))
        if not first:
            head = (wav[:, : self.scl] * self._fade_in
                    + state.speech_cache * self._fade_out)
            wav = jnp.concatenate([head, wav[:, self.scl:]], axis=1)
        if finalize:
            return wav, state.replace(token_offset=offset + emit_tokens)
        emit = wav[:, : wav.shape[1] - self.scl]
        new_state = DeviceStreamState(
            token_offset=offset + emit_tokens,
            mel_cache=mel_in[:, mel_in.shape[1] - self.mel_cache_len:]
            .astype(jnp.float32),
            source_cache=source[:, source.shape[1] - self.scl:]
            .astype(jnp.float32),
            speech_cache=wav[:, wav.shape[1] - self.scl:]
            .astype(jnp.float32),
        )
        return emit, new_state

    def _flow_scan_impl(self, flow_params, token_buf: jnp.ndarray,
                        token_offset: jnp.ndarray, n_hops: int,
                        emit_tokens: int):
        """n_hops steady flow hops in one lax.scan dispatch.  (Flow and
        vocoder are scanned as SEPARATE programs: fusing both into one XLA
        program stalls the remote compiler — see BENCH_NOTES.md.)"""

        def body(offset, _):
            mel = self._flow_step_impl(flow_params, token_buf, offset,
                                       emit_tokens=emit_tokens,
                                       finalize=False)
            return offset + emit_tokens, mel

        offset, mels = jax.lax.scan(body, token_offset, None, length=n_hops)
        return mels, offset                 # (n_hops, B, emit*r, D)

    def _voc_scan_impl(self, hift_params, mels: jnp.ndarray,
                       state: DeviceStreamState, emit_tokens: int):
        """Vocoder over the stacked steady-hop mels, carrying caches."""

        def body(st, mel):
            seg, st = self._voc_step_impl(hift_params, mel, st,
                                          first=False, finalize=False)
            return st, seg

        state, segs = jax.lax.scan(body, state, mels)
        segs = segs.transpose(1, 0, 2).reshape(segs.shape[1], -1)
        return segs, state

    def _flow_batched_impl(self, flow_params, token_buf: jnp.ndarray,
                           token_offset: jnp.ndarray, n_hops: int,
                           emit_tokens: int) -> jnp.ndarray:
        """All n_hops steady flow windows as ONE batched forward.

        Flow hops are independent (only the vocoder caches chain), so the
        windows stack on the batch axis: 50 sequential latency-bound
        forwards become one MXU-saturating call.  Stream batch must be 1.

        Returns mels (n_hops, emit_tokens*ratio, n_mel)."""
        d = self.dec
        w = self.window
        offsets = token_offset + emit_tokens * jnp.arange(n_hops)
        ends = offsets + emit_tokens + self.la
        starts = jnp.maximum(ends - w, 0)
        idx = starts[:, None] + jnp.arange(w)[None, :]   # (n_hops, W)
        windows = token_buf[0][idx]
        prompt = jnp.broadcast_to(self._prompt_tok,
                                  (n_hops,) + self._prompt_tok.shape[1:])
        tokens = jnp.concatenate([prompt, windows], axis=1)
        n_valid = self.p + (ends - starts)
        valid = jnp.arange(self.p + w)[None, :] < n_valid[:, None]
        pf = jnp.broadcast_to(self._prompt_feat,
                              (n_hops,) + self._prompt_feat.shape[1:])
        emb = jnp.broadcast_to(self._emb,
                               (n_hops,) + self._emb.shape[1:])
        mel_full = d.flow.apply(flow_params, tokens, valid, pf, emb,
                                streaming=True, finalize=False)
        actual = offsets - starts                        # (n_hops,)
        r = self.ratio
        frame_idx = ((self.p + actual[:, None]) * r
                     + jnp.arange(emit_tokens * r)[None, :])
        return jnp.take_along_axis(mel_full, frame_idx[..., None], axis=1)

    # ------------------------------------------------------------------
    def schedule(self, n_tokens: int) -> List[Tuple[int, bool, bool]]:
        """Hop plan: [(emit_tokens, first, finalize), ...] mirroring
        stream_inference (flow_inference.py:187-237)."""
        plan = []
        offset = 0
        first = True
        while True:
            this_hop = self.hop + self.prompt_pad if first else self.hop
            if n_tokens - offset < this_hop + self.la:
                break
            plan.append((this_hop, first, False))
            offset += this_hop
            first = False
        plan.append((n_tokens - offset, first, True))
        return plan

    def stream_decode(self, tokens: np.ndarray, fused: bool = False,
                      output: str = "float32") -> np.ndarray:
        """Full-stream decode with one device upload and one fetch.

        ``fused=False`` (default) uses the split flow/voc jits — identical
        results, far cheaper compile; ``fused=True`` uses the single-program
        step.  ``output='int16'`` quantizes ON DEVICE to 16-bit PCM (the
        reference's wire/file format, CLIENT_STREAMING_USAGE.md:110) —
        quarter the device->host bytes."""
        tokens = np.asarray(tokens)
        assert tokens.shape[0] == self.batch, (tokens.shape, self.batch)
        n = int(tokens.shape[1])
        cap = max(n + self.window, self.window)
        buf = np.zeros((self.batch, cap), np.int32)
        buf[:, :n] = tokens
        token_buf = jnp.asarray(buf)
        state = self.init_state()
        segs = []
        plan = [p for p in self.schedule(n) if p[0] > 0]
        i = 0
        while i < len(plan):
            emit_tokens, first, finalize = plan[i]
            # batch consecutive identical steady hops into scan dispatches;
            # power-of-two bucket sizes so any stream length reuses the
            # same handful of compiled programs
            if (not fused and not first and not finalize):
                j = i
                while (j < len(plan) and plan[j] == (emit_tokens, False,
                                                     False)):
                    j += 1
                run = j - i
                if run > 1:
                    for bucket in (64, 16, 4, 2):
                        while run >= bucket:
                            if self.batch == 1:
                                # one batched flow forward for the bucket
                                m = self._flow_batched(
                                    self.dec.flow_params, token_buf,
                                    state.token_offset, n_hops=bucket,
                                    emit_tokens=emit_tokens)
                                mels = m[:, None]      # (hops, 1, T, D)
                            else:
                                mels, _ = self._flow_scan(
                                    self.dec.flow_params, token_buf,
                                    state.token_offset, n_hops=bucket,
                                    emit_tokens=emit_tokens)
                            seg, state = self._voc_scan(
                                self.dec.hift_params, mels, state,
                                emit_tokens=emit_tokens)
                            segs.append(seg)
                            run -= bucket
                    i = j - run
                    continue
            if fused:
                seg, state = self._step(self.dec.flow_params,
                                        self.dec.hift_params, token_buf,
                                        state, emit_tokens=emit_tokens,
                                        first=first, finalize=finalize)
            else:
                mel = self._flow_step(self.dec.flow_params, token_buf,
                                      state.token_offset,
                                      emit_tokens=emit_tokens,
                                      finalize=finalize)
                seg, state = self._voc_step(self.dec.hift_params, mel,
                                            state, first=first,
                                            finalize=finalize)
            segs.append(seg)
            i += 1
        wav = jnp.concatenate(segs, axis=1)
        if output == "int16":
            return _parallel_fetch(_pcm16_device(wav))
        return _parallel_fetch(wav).astype(np.float32)

    def warmup(self, n_tokens: int):
        """Compile the hop shapes for an n-token stream."""
        self.stream_decode(np.zeros((1, n_tokens), np.int32))

    def program_flops(self, n_tokens: int) -> float:
        """Total FLOPs of the compiled programs one
        ``stream_decode(n_tokens)`` (split path) executes — XLA cost
        analysis over the same dispatch sequence (utils/flops.py).  Run
        after a warmup pass so lower+compile hit the cache."""
        from ..utils.flops import compiled_flops

        cap = max(n_tokens + self.window, self.window)
        token_buf = jnp.zeros((self.batch, cap), jnp.int32)
        state = self.init_state()
        off = state.token_offset
        # mel dummies must carry the COMPUTE dtype the flow emits — a f32
        # dummy would lower a different (freshly compiled) vocoder program
        mel_dt = self.dec.compute_dtype or jnp.float32
        total = 0.0
        plan = [p for p in self.schedule(n_tokens) if p[0] > 0]
        i = 0
        while i < len(plan):
            emit_tokens, first, finalize = plan[i]
            if not first and not finalize:
                j = i
                while (j < len(plan) and plan[j] == (emit_tokens, False,
                                                     False)):
                    j += 1
                run = j - i
                if run > 1:
                    mel_d = self.dec.flow_cfg.output_size
                    for bucket in (64, 16, 4, 2):
                        while run >= bucket:
                            if self.batch == 1:
                                total += compiled_flops(
                                    self._flow_batched, self.dec.flow_params,
                                    token_buf, off, n_hops=bucket,
                                    emit_tokens=emit_tokens)
                            else:
                                total += compiled_flops(
                                    self._flow_scan, self.dec.flow_params,
                                    token_buf, off, n_hops=bucket,
                                    emit_tokens=emit_tokens)
                            mels = jnp.zeros(
                                (bucket, self.batch,
                                 emit_tokens * self.ratio, mel_d), mel_dt)
                            total += compiled_flops(
                                self._voc_scan, self.dec.hift_params,
                                mels, state, emit_tokens=emit_tokens)
                            run -= bucket
                    i = j - run
                    continue
            total += compiled_flops(
                self._flow_step, self.dec.flow_params, token_buf, off,
                emit_tokens=emit_tokens, finalize=finalize)
            mel = jnp.zeros((self.batch, emit_tokens * self.ratio,
                             self.dec.flow_cfg.output_size), mel_dt)
            total += compiled_flops(
                self._voc_step, self.dec.hift_params, mel, state,
                first=first, finalize=finalize)
            i += 1
        return total


def stream_chunks(decoder: DeviceStreamDecoder, tokens: np.ndarray,
                  fetch_threads: int = 1):
    """True-streaming consumer: dispatch every hop up front (device queue),
    then yield host wav chunks in order while later chunks transfer in the
    background — transfer latency overlaps compute and other transfers.

    Yields float32 (B, samples) arrays per hop.
    """
    import queue
    import threading

    tokens = np.asarray(tokens)
    n = int(tokens.shape[1])
    cap = max(n + decoder.window, decoder.window)
    buf = np.zeros((decoder.batch, cap), np.int32)
    buf[:, :n] = tokens
    token_buf = jnp.asarray(buf)
    state = decoder.init_state()

    segs = []
    for emit_tokens, first, finalize in decoder.schedule(n):
        if emit_tokens <= 0:
            continue
        mel = decoder._flow_step(decoder.dec.flow_params, token_buf,
                                 state.token_offset,
                                 emit_tokens=emit_tokens, finalize=finalize)
        seg, state = decoder._voc_step(decoder.dec.hift_params, mel, state,
                                       first=first, finalize=finalize)
        segs.append(seg)

    q: "queue.Queue" = queue.Queue(maxsize=8)

    def fetcher():
        for s in segs:
            q.put(np.asarray(s, dtype=np.float32))
        q.put(None)

    t = threading.Thread(target=fetcher, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            return
        yield item
