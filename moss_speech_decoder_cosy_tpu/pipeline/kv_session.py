"""Device-resident KV-cached streaming decode.

The windowed session (pipeline/device_session.py) reproduces the reference's
streaming semantics — re-decoding a bounded 40-token window per 5-token hop
(flow_inference.py:194-204), 8x redundant FLOPs.  This session removes the
redundancy: every token is pushed through the flow exactly once, attending
to circular KV rings (models/flow/kv_stream.py).  Per hop, two static-shape
jitted programs run (flow chunk -> mel; hift with mel/source caches ->
wav), with power-of-two lax.scan buckets batching consecutive steady hops
into single dispatches.  Flow and vocoder stay separate XLA programs (the
remote compiler wedges on the fused monolith — BENCH_NOTES.md).

Cost model vs the windowed session (full MOSS size, bf16):
- flow FLOPs per hop drop ~8x (20 new mel frames instead of 160+prompt);
- the price is the KV cache resident in HBM:
  n_timesteps x layers x 2(K,V) x 2(CFG) x ring x inner
  = 10 x 56 x 2 x 2 x 140 x 512 x 2B  ~ 0.3 GB (bf16) per stream — fine
  for single-stream low-latency serving; ``ring_quant=True`` stores the
  rings as int8+scales (~4x smaller, quality measured in BENCH_NOTES)
  for large multi-stream batches, or use the windowed session.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import flax.struct
import jax
import jax.numpy as jnp

from ..models.flow.kv_stream import (KVFlowStep, KVFlowEncodeStep,
                                     KVFlowWaveStep, init_kv_cache,
                                     pe_tables, est_cache_to_flat,
                                     est_cache_from_flat,
                                     extend_rings_for_fused,
                                     shrink_rings_from_fused,
                                     fuse_qkv_params, rotate_rings,
                                     stack_estimator_params,
                                     stack_est_flat, unstack_est_flat,
                                     wave_step_stacked,
                                     group_estimator_params,
                                     group_est_flat, ungroup_est_flat,
                                     wave_step_pallas,
                                     group_encoder_params,
                                     encoder_hop_pallas)
from .device_session import _parallel_fetch, _pcm16_device


@flax.struct.dataclass
class KVVocState:
    mel_cache: jnp.ndarray        # (1, mel_cache_len, n_mel)
    source_cache: jnp.ndarray     # (1, scl, 1)
    speech_cache: jnp.ndarray     # (1, scl)


class KVStreamDecoder:
    """Incremental streaming decoder bound to an AudioDecoder's params."""

    def __init__(self, dec, prompt_token: np.ndarray,
                 prompt_feat: np.ndarray, embedding: np.ndarray,
                 block_size: int, ring_tokens: int = 35,
                 token_cap: int = 2048, batch: int = 1,
                 write_mode: str = "auto", fused: bool = False,
                 stacked: bool = False, kernel="auto",
                 ring_quant: bool = False, enc_kernel: bool = False):
        self.dec = dec
        self.hop = block_size
        self.ring_tokens = ring_tokens
        self.la = dec.lookahead
        self.ratio = dec.ratio
        self.p = int(prompt_token.shape[1])
        self.b = batch
        cfg = dec.flow_cfg
        self.n_mel = cfg.output_size
        self.mel_cache_len = dec.pipe_cfg.mel_cache_len
        self.scl = dec.source_cache_len
        dt = dec.compute_dtype or jnp.float32
        self.dt = dt
        self.est_dt = getattr(dec, "estimator_dtype", None) or dt
        # int8 estimator rings (HBM mitigation for quality-ring serving,
        # models/flow/kv_stream.py::quantize_ring_chunk): concat dataflow
        # + one-hot writes only — the quality configuration trades the
        # fused engine's speed for ~4x smaller est rings vs bf16.
        self._quant = bool(ring_quant)
        assert not (self._quant and fused), \
            "ring_quant requires the concat dataflow (fused=False)"
        assert not (self._quant and stacked)

        def _bcast(a):                 # share one prompt across B streams
            return (jnp.broadcast_to(a, (batch,) + a.shape[1:])
                    if a.shape[0] == 1 and batch > 1 else a)
        self._prompt_tok = _bcast(jnp.asarray(prompt_token, jnp.int32))
        self._prompt_feat = _bcast(jnp.asarray(prompt_feat).astype(dt))
        self._emb = _bcast(jnp.asarray(embedding).astype(dt))
        pe_tok, pe_mel = pe_tables(cfg, token_cap + self.p + 16)
        self._pe_tok = pe_tok
        self._pe_mel = pe_mel
        win = np.hamming(2 * self.scl).astype(np.float32)
        self._fade_in = jnp.asarray(win[: self.scl])
        self._fade_out = jnp.asarray(win[self.scl:])

        # step modules run with the qkv-FUSED param layout (one matmul
        # per attention instead of three; the wavefront scan body is
        # op-dispatch-bound — BENCH_NOTES round 3).  Eager re-pack: one
        # jitted dispatch for the concats, every untouched leaf stays
        # SHARED with dec.flow_params (no second param copy in HBM);
        # cached on the decoder across sessions.
        self._fp = getattr(dec, "_fused_flow_params", None)
        if self._fp is None:
            self._fp = fuse_qkv_params(dec.flow_params)
            dec._fused_flow_params = self._fp

        self._kv = KVFlowStep(cfg)
        self._init_state_jit = jax.jit(self._init_state_impl)
        self._prefill = jax.jit(self._prefill_impl)
        self._hop = jax.jit(self._hop_impl,
                            static_argnames=("emit_tokens", "finalize"))
        self._hop_scan = jax.jit(self._hop_scan_impl,
                                 static_argnames=("n_hops", "emit_tokens"))
        self._voc = jax.jit(self._voc_impl,
                            static_argnames=("first", "finalize"))
        self._voc_scan = jax.jit(self._voc_scan_impl)
        self._bulk = None
        # wavefront (pipelined-ODE) mode: encoder per hop, all ODE steps
        # batched into one estimator forward per iteration.  When the
        # geometry allows (ring a multiple of the hop), est ring writes
        # use the shared-offset in-place DUS scheme (O(chunk) HBM traffic
        # instead of the O(ring) one-hot RMW — BENCH_NOTES round 3).
        self._enc_model = KVFlowEncodeStep(cfg)
        cf = block_size * self.ratio
        # write_mode: "auto" = DUS when the geometry allows; "onehot"
        # forces the one-hot RMW scheme (perf A/B; both are exact)
        assert write_mode in ("auto", "onehot"), write_mode
        self._dus_ok = (write_mode == "auto"
                        and ring_tokens % block_size == 0
                        and not self._quant)
        self._align = (self.p * self.ratio) % cf
        self._wave_model = KVFlowWaveStep(
            cfg, write_mode="dus" if self._dus_ok else "onehot",
            align=self._align if self._dus_ok else 0)
        self._wave_model_onehot = KVFlowWaveStep(cfg)
        # fused write-then-attend wavefront: rings extended to capacity
        # (ring + chunk), chunk K/V written into the ring inside the
        # estimator BEFORE attention (no [ring ++ chunk] concat — the
        # HLO copy audit measured the per-layer concat at 367 MB/iter of
        # writes + 367 MB/iter of XLA copies, bin/analyze_wave_hlo.py)
        self._fused = bool(fused)
        self._wave_model_fused = KVFlowWaveStep(
            cfg, write_mode="dus" if self._dus_ok else "onehot",
            align=self._align if self._dus_ok else 0, fused=True)
        # stacked-layer wavefront: the homogeneous estimator layer groups
        # collapsed into lax.scans over stacked parameter leaves (the
        # scan body is op-dispatch-bound, BENCH_NOTES round 4).  Fused
        # write-then-attend + shared-offset DUS geometry only.
        self._stacked = bool(stacked)
        if self._stacked:
            assert self._fused and self._dus_ok, \
                "stacked wavefront requires fused=True and the DUS " \
                "geometry (ring_tokens % block_size == 0, write_mode auto)"
            self._sp = getattr(dec, "_stacked_est_params", None)
            if self._sp is None:
                self._sp = stack_estimator_params(self._fp,
                                                  cfg.estimator)
                dec._stacked_est_params = self._sp
        else:
            self._sp = None
        # Pallas fused-block wavefront: every homogeneous transformer
        # group of the estimator (+ its preceding resnet) runs as ONE
        # kernel launch (ops/pallas_block.py) — the op-fusion lever the
        # round-4 cost model identified; measured 3.56 vs 4.08 ms/iter
        # for the XLA fused engine at production geometry.  Needs the
        # fused write-then-attend + shared-offset-DUS geometry and
        # 128-lane-aligned head layout.  ``kernel="auto"`` (the default)
        # selects it ON TPU whenever the session geometry supports it —
        # the serving default IS the measured-best engine; pass
        # kernel=True/False to force.  Off-TPU the kernel runs in Pallas
        # interpret mode (exact; the CPU test path uses kernel=True
        # explicitly, auto stays off to keep the suite fast).
        self._interpret = jax.devices()[0].platform != "tpu"
        est_cfg = cfg.estimator
        # ring-capacity tile alignment: Mosaic DMAs the (rows_t, rp, 2d)
        # slab per layer, which requires the rp extent tile-aligned —
        # ring 35 (rp 160) and 75 (rp 320) qualify, ring 70 (rp 300)
        # does not (quality serving on the kernel engine uses ring 75)
        rp_cap = (ring_tokens + block_size) * self.ratio
        kernel_ok = (self._fused and self._dus_ok and not self._stacked
                     and not self._quant and rp_cap % 16 == 0
                     and (2 * est_cfg.num_heads * est_cfg.attention_head_dim)
                     % 128 == 0)
        self._kernel_explicit = kernel is True
        if kernel == "auto":
            kernel = kernel_ok and not self._interpret
        self._kernel = bool(kernel)
        if self._kernel:
            assert not self._stacked, "kernel and stacked are exclusive"
            assert self._fused and self._dus_ok, \
                "pallas-kernel wavefront requires fused=True and the " \
                "DUS geometry (ring_tokens % block_size == 0)"
            assert self._interpret or rp_cap % 16 == 0, \
                f"kernel ring capacity {rp_cap} must be 16-aligned on " \
                "TPU (use e.g. ring 35 or 75 at block 5)"
            self._gp = getattr(dec, "_grouped_est_params", None)
            if self._gp is None:
                self._gp = group_estimator_params(self._fp, cfg.estimator)
                dec._grouped_est_params = self._gp
        else:
            self._gp = None
        # fused-conformer encoder hop (ops/pallas_conformer.py): the two
        # conformer stacks of the wavefront encoder as one kernel launch
        # each — opt-in while its win is being measured (single-stream
        # wavefront only)
        self._enc_kernel = bool(enc_kernel) and self.b == 1
        if self._enc_kernel:
            self._egp = getattr(dec, "_grouped_enc_params", None)
            if self._egp is None:
                self._egp = group_encoder_params(self._fp, cfg.encoder)
                dec._grouped_enc_params = self._egp
        else:
            self._egp = None
        # scan unroll: partially cancels the while-loop's ring-carry
        # ping-pong copies (round-5 addendum 3): kernel engine measured
        # 3.556 -> 3.43 ms/iter at unroll 4 (plateau; u8 equal)
        self._unroll = 4 if self._kernel else 1
        self._enc_hop = jax.jit(self._enc_hop_impl,
                                static_argnames=("emit_tokens",))
        self._wave_scan = jax.jit(self._wave_scan_impl,
                                  static_argnames=("n_iters", "dus",
                                                   "unroll", "fused",
                                                   "stacked", "kernel"))
        # segmented wavefront: the same scan split into fixed-size
        # segments so vocode/pcm/fetch of finished chunks OVERLAP the
        # later segments' scan time (the final fetch is ~90 ms of wire
        # time through the relay — BENCH_NOTES tail attribution).  State
        # buffers are donated: segment boundaries alias the 0.3 GB est
        # rings in place instead of copying.
        self._wave_seg = jax.jit(self._wave_seg_impl,
                                 static_argnames=("n_iters", "dus",
                                                  "fused"),
                                 donate_argnums=(2, 3, 4, 5, 6))
        self._prep_est = jax.jit(self._prep_est_impl)
        self._fin_est = jax.jit(self._fin_est_impl)
        # kernel-stepped variants: extended + GROUPED layout in/out
        self._prep_est_k = jax.jit(
            lambda est: group_est_flat(self._prep_est_impl(est),
                                       self.dec.flow_cfg.estimator))
        self._fin_est_k = jax.jit(
            lambda est, n: self._fin_est_impl(
                ungroup_est_flat(est, self.dec.flow_cfg.estimator), n))
        # stepped wavefront: one jitted iteration with DONATED ring/state
        # buffers (x, mu_w, est, enc, n_tok, w) — lets XLA alias the big
        # KV rings in place instead of double-buffering a scan carry
        # (memory_analysis shows the scan ping-pongs ~345 MiB of rings
        # per iteration on BOTH engines; donation removes the copy at
        # the price of per-iteration dispatch)
        self._wave_step = jax.jit(self._wave_step_impl,
                                  donate_argnums=(2, 3, 4, 5, 6, 7))
        self._wave_step_k = jax.jit(self._wave_step_kernel_impl,
                                    donate_argnums=(2, 3, 4, 5, 6, 7))
        self._est_flatten = jax.jit(est_cache_to_flat)
        self._est_unflatten = jax.jit(est_cache_from_flat,
                                      static_argnames=("s_steps",))
        self._spk = jax.jit(
            lambda p, e: self._enc_model.apply(p, e,
                                               method=self._enc_model.spk))
        # per-session constants of the wavefront: the projected speaker
        # vector (params + embedding are fixed at construction) and the
        # (x, mu) wavefront init built ON DEVICE (the eager host build +
        # upload costs two relay crossings per stream otherwise)
        self._spks_cached = None
        self._wave_init = jax.jit(self._wave_init_impl)

    def _wave_init_impl(self):
        """Device-side (x_wave, mu_wave) init: zeros except step-0 seeded
        with the deterministic CFM noise slice at this session's prompt
        offset (exact same values the sequential KV path uses)."""
        from ..models.flow.cfm import _fixed_noise
        cfg = self.dec.flow_cfg
        s_steps = cfg.cfm.n_timesteps
        cf = self.hop * self.ratio
        sd = (jnp.float32 if cfg.cfm.solver_dtype == "float32"
              else self.dt)
        noise = jnp.asarray(_fixed_noise(cfg.cfm.max_noise_len,
                                         self.n_mel))
        base = self.p * self.ratio
        x0 = jnp.broadcast_to(noise[:, base: base + cf],
                              (self.b, cf, self.n_mel)).astype(sd)
        x_wave = jnp.zeros((s_steps, self.b, cf, self.n_mel),
                           sd).at[0].set(x0)
        mu_wave = jnp.zeros((s_steps, self.b, cf, self.n_mel),
                            self.est_dt)
        return x_wave, mu_wave

    def _enc_hop_impl(self, flow_params, token_buf, enc_cache, n_tok,
                      emit_tokens: int):
        """Encoder-only hop for the wavefront loop (steady chunks)."""
        off = n_tok - self.p
        chunk = jax.lax.dynamic_slice(token_buf, (0, off),
                                      (self.b, emit_tokens))
        ctx = jax.lax.dynamic_slice(token_buf, (0, off + emit_tokens),
                                    (self.b, self.la))
        return self._enc_model.apply(flow_params, chunk, ctx, enc_cache,
                                     n_tok, self._pe_tok, self._pe_mel,
                                     finalize=False)

    # ------------------------------------------------------------------
    def _init_state_impl(self) -> Tuple[dict, KVVocState]:
        cache = init_kv_cache(self.dec.flow_cfg, self.ring_tokens,
                              batch=self.b, dtype=self.dt,
                              est_dtype=self.est_dt,
                              est_quant=self._quant)
        voc = KVVocState(
            mel_cache=jnp.zeros((self.b, self.mel_cache_len, self.n_mel)),
            source_cache=jnp.zeros((self.b, self.scl, 1)),
            speech_cache=jnp.zeros((self.b, self.scl)),
        )
        return cache, voc

    def init_state(self) -> Tuple[dict, KVVocState]:
        # one jitted dispatch for the whole ~115-leaf zero pytree: eager
        # jnp.zeros would issue one device call per leaf, which costs
        # ~160 ms/stream through this environment's dispatch relay
        # (BENCH_NOTES round-3 tail profile)
        return self._init_state_jit()

    def _prefill_impl(self, flow_params, token_buf, cache):
        """Prompt prefill: one chunk of p tokens with the first `la` stream
        tokens as lookahead context; warms every ring, emits nothing."""
        ctx = jax.lax.dynamic_slice(token_buf, (0, 0), (self.b, self.la))
        _, cache = self._kv.apply(flow_params, self._prompt_tok, ctx,
                                  self._prompt_feat, self._emb, cache,
                                  self._pe_tok, self._pe_mel,
                                  finalize=False)
        return cache

    def _hop_impl(self, flow_params, token_buf, cache,
                  emit_tokens: int, finalize: bool):
        """One flow hop: slice the next chunk (+context) from the device
        token buffer at the cache's own position and run the KV step."""
        off = cache["n_tok"] - self.p
        chunk = jax.lax.dynamic_slice(token_buf, (0, off),
                                      (self.b, emit_tokens))
        if finalize:
            ctx = jnp.zeros((self.b, self.la), jnp.int32)
        else:
            ctx = jax.lax.dynamic_slice(token_buf, (0, off + emit_tokens),
                                        (self.b, self.la))
        cond = jnp.zeros((self.b, emit_tokens * self.ratio, self.n_mel),
                         self.dt)
        mel, cache = self._kv.apply(flow_params, chunk, ctx, cond,
                                    self._emb, cache, self._pe_tok,
                                    self._pe_mel, finalize=finalize)
        return mel, cache

    def _hop_scan_impl(self, flow_params, token_buf, cache,
                       n_hops: int, emit_tokens: int):
        """n_hops steady flow hops in one lax.scan dispatch."""

        def body(c, _):
            mel, c = self._hop_impl(flow_params, token_buf, c,
                                    emit_tokens=emit_tokens, finalize=False)
            return c, mel

        cache, mels = jax.lax.scan(body, cache, None, length=n_hops)
        return mels, cache                    # (n_hops, 1, emit*r, n_mel)

    def _voc_impl(self, hift_params, emit_mel, voc: KVVocState,
                  first: bool, finalize: bool):
        """HiFT with mel/source caches + Hamming cross-fade
        (same contract as device_session._voc_step_impl)."""
        d = self.dec
        dt = self.dt
        if first:
            mel_in = emit_mel
            cache_source = jnp.zeros((emit_mel.shape[0], 0, 1), dt)
        else:
            mel_in = jnp.concatenate(
                [voc.mel_cache.astype(emit_mel.dtype), emit_mel], axis=1)
            cache_source = voc.source_cache.astype(dt)
        wav, source = d.hift.apply(hift_params, mel_in.astype(dt),
                                   cache_source, jax.random.PRNGKey(0))
        if not first:
            head = (wav[:, : self.scl] * self._fade_in
                    + voc.speech_cache * self._fade_out)
            wav = jnp.concatenate([head, wav[:, self.scl:]], axis=1)
        if finalize:
            return wav, voc
        emit = wav[:, : wav.shape[1] - self.scl]
        new_voc = KVVocState(
            mel_cache=mel_in[:, mel_in.shape[1] - self.mel_cache_len:]
            .astype(jnp.float32),
            source_cache=source[:, source.shape[1] - self.scl:]
            .astype(jnp.float32),
            speech_cache=wav[:, wav.shape[1] - self.scl:]
            .astype(jnp.float32),
        )
        return emit, new_voc

    def _voc_scan_impl(self, hift_params, mels, voc: KVVocState):
        def body(st, mel):
            seg, st = self._voc_impl(hift_params, mel, st,
                                     first=False, finalize=False)
            return st, seg

        voc, segs = jax.lax.scan(body, voc, mels)
        segs = segs.transpose(1, 0, 2).reshape(segs.shape[1], -1)
        return segs, voc

    # ------------------------------------------------------------------
    def schedule(self, n_tokens: int) -> List[Tuple[int, bool]]:
        """[(emit_tokens, finalize), ...]: steady hops while a full hop +
        lookahead is available, then one finalize tail."""
        plan = []
        off = 0
        while n_tokens - off >= self.hop + self.la:
            plan.append((self.hop, False))
            off += self.hop
        if n_tokens - off > 0:
            plan.append((n_tokens - off, True))
        return plan

    def _flow_mels(self, token_buf, cache, plan):
        """Run the flow side of the whole plan (scan-bucketed), returning
        the concatenated stream mel (1, total_frames, n_mel) f32."""
        mels = []
        i = 0
        while i < len(plan):
            emit_tokens, finalize = plan[i]
            if not finalize:
                run = 0
                while (i + run < len(plan)
                       and plan[i + run] == (emit_tokens, False)):
                    run += 1
                done = 0
                for bucket in (32, 8, 2):
                    while run - done >= bucket:
                        ms, cache = self._hop_scan(
                            self._fp, token_buf, cache,
                            n_hops=bucket, emit_tokens=emit_tokens)
                        mels.append(ms.transpose(1, 0, 2, 3).reshape(
                            self.b, -1, ms.shape[-1]))
                        done += bucket
                for _ in range(run - done):
                    mel, cache = self._hop(self._fp, token_buf,
                                           cache, emit_tokens=emit_tokens,
                                           finalize=False)
                    mels.append(mel)
                i += run
                continue
            mel, cache = self._hop(self._fp, token_buf, cache,
                                   emit_tokens=emit_tokens, finalize=True)
            mels.append(mel)
            i += 1
        return jnp.concatenate(mels, axis=1), cache

    def _wave_scan_impl(self, flow_params, token_buf, x_wave, mu_wave,
                        spks, est, enc_cache, n_iters: int, k_total,
                        base_frames, dus: bool = False, unroll: int = 1,
                        fused: bool = False, stacked: bool = False,
                        sp=None, kernel: bool = False, gp=None):
        """The ENTIRE wavefront loop as one lax.scan dispatch: encoder hop
        under lax.cond while chunks remain, then the batched pipelined-ODE
        iteration.  No per-iteration host traffic — the round-trip relay in
        this environment makes per-hop dispatches the bottleneck
        (BENCH_NOTES.md).  Extra iterations beyond k+S-1 are dead (masked
        writes, garbage exits) so n_iters can be bucketed.

        Note on the ring-write scheme: the O(ring) one-hot read-modify-
        write per iteration was benchmarked against (a) rotated-storage
        dynamic_update_slice writes (with and without enable write-back)
        and (b) a delayed-pending write-before-read variant intended to
        let XLA update the carried rings in place; BOTH measured SLOWER
        end-to-end on this TPU stack (one-hot 6.7 ms/iter vs 7.8-15 —
        XLA copies scan-carried buffers regardless of write order here),
        so the one-hot form stays."""
        hop = self.hop
        cf = hop * self.ratio
        n_mel = self.n_mel
        s_steps = self.dec.flow_cfg.cfm.n_timesteps
        est = est_cache_to_flat(est)       # flat layout across the scan
        rot = None
        if fused:
            # write-then-attend: rings extended to (ring + chunk) capacity,
            # contents re-moduloed (and slot-rotated when the shared-offset
            # DUS scheme is active) in one entry gather
            wave_model = self._wave_model_fused
            rp = est["kv"][0].shape[-2] + cf
            rot_f = ([((s * cf) % rp) for s in range(s_steps)
                      for _ in range(2 * self.b)] if dus
                     else [0] * (s_steps * 2 * self.b))
            est = extend_rings_for_fused(est, base_frames, cf, rot_f)
            if stacked:
                # collapse the per-layer tuple into the stacked-scan
                # layout once per stream (outside the scan)
                est = stack_est_flat(est, self.dec.flow_cfg.estimator)
            elif kernel:
                est = group_est_flat(est, self.dec.flow_cfg.estimator)
        elif dus:
            wave_model = self._wave_model
            r = est["kv"][0].shape[-2]
            rot = [((s * cf) % r) for s in range(s_steps)
                   for _ in range(2 * self.b)]
            est = dict(est,
                       kv=tuple(rotate_rings(a, rot) for a in est["kv"]))
        else:
            wave_model = self._wave_model_onehot

        def body(carry, w):
            x, mu_w, est_c, enc_c, n_tok = carry

            def run_enc(args):
                enc_c, n_tok = args
                if self._enc_kernel:
                    mu, enc2 = encoder_hop_pallas(
                        self._egp, flow_params, self.dec.flow_cfg,
                        *self._slices(token_buf, n_tok, hop), enc_c,
                        n_tok, self._pe_tok, self._pe_mel,
                        interpret=self._interpret)
                else:
                    mu, enc2 = self._enc_model.apply(
                        flow_params, *self._slices(token_buf, n_tok, hop),
                        enc_c, n_tok, self._pe_tok, self._pe_mel,
                        finalize=False)
                return mu, enc2, n_tok + hop

            def skip_enc(args):
                enc_c, n_tok = args
                return (jnp.zeros((self.b, cf, n_mel), self.dt),
                        enc_c, n_tok)

            mu_new, enc_c, n_tok = jax.lax.cond(
                w < k_total, run_enc, skip_enc, (enc_c, n_tok))
            if stacked:
                scfg = self.dec.flow_cfg
                exit_mel, x, mu_w, est_c = wave_step_stacked(
                    sp, scfg.cfm, scfg.estimator, self._align, x, mu_w,
                    mu_new, spks, est_c, w, k_total, base_frames)
            elif kernel:
                scfg = self.dec.flow_cfg
                exit_mel, x, mu_w, est_c = wave_step_pallas(
                    gp, scfg.cfm, scfg.estimator, self._align, x, mu_w,
                    mu_new, spks, est_c, w, k_total, base_frames,
                    interpret=self._interpret)
            else:
                exit_mel, x, mu_w, est_c = wave_model.apply(
                    flow_params, x, mu_w, mu_new, spks, est_c, w, k_total,
                    base_frames)
            return (x, mu_w, est_c, enc_c, n_tok), exit_mel

        carry0 = (x_wave, mu_wave, est, enc_cache,
                  jnp.asarray(self.p, jnp.int32))
        (x, mu_w, est, enc_cache, n_tok), mels = jax.lax.scan(
            body, carry0, jnp.arange(n_iters, dtype=jnp.int32),
            unroll=unroll)
        del x, mu_w
        if fused:
            if stacked:
                est = unstack_est_flat(est, self.dec.flow_cfg.estimator)
            elif kernel:
                est = ungroup_est_flat(est, self.dec.flow_cfg.estimator)
            est = shrink_rings_from_fused(
                est, base_frames + k_total * cf, cf, rot_f)
        elif dus:
            est = dict(est,
                       kv=tuple(rotate_rings(a, rot, inverse=True)
                                for a in est["kv"]))
        return mels, est_cache_from_flat(est, s_steps), enc_cache, n_tok

    def _rot_list(self, r: int):
        """Per-flat-row slot rotations for the shared-offset DUS scheme
        at ring capacity ``r`` (canonical for the concat wavefront,
        ring+chunk for the fused write-then-attend one)."""
        s_steps = self.dec.flow_cfg.cfm.n_timesteps
        cf = self.hop * self.ratio
        return [((s * cf) % r) for s in range(s_steps)
                for _ in range(2 * self.b)]

    def _rot_offsets(self, est_flat):
        return self._rot_list(est_flat["kv"][0].shape[-2])

    def _prep_est_impl(self, est):
        """Canonical est cache -> the wavefront's flat layout, rotated
        for the shared-offset DUS write scheme when active (fused mode:
        extended to ring+chunk capacity with contents re-moduloed)."""
        est = est_cache_to_flat(est)
        cf = self.hop * self.ratio
        if self._fused:
            rp = est["kv"][0].shape[-2] + cf
            rot = (self._rot_list(rp) if self._dus_ok
                   else [0] * len(self._rot_list(rp)))
            return extend_rings_for_fused(est, self.p * self.ratio, cf,
                                          rot)
        if self._dus_ok:
            rot = self._rot_offsets(est)
            est = dict(est,
                       kv=tuple(rotate_rings(a, rot) for a in est["kv"]))
        return est

    def _fin_est_impl(self, est, n_total=None):
        """Inverse of _prep_est (wavefront exit -> canonical layout).
        Fused mode needs ``n_total`` (frames written so far) to re-modulo
        the extended rings back to canonical capacity."""
        cf = self.hop * self.ratio
        if self._fused:
            rp = est["kv"][0].shape[-2]
            rot = (self._rot_list(rp) if self._dus_ok
                   else [0] * len(self._rot_list(rp)))
            est = shrink_rings_from_fused(est, n_total, cf, rot)
        elif self._dus_ok:
            rot = self._rot_offsets(est)
            est = dict(est,
                       kv=tuple(rotate_rings(a, rot, inverse=True)
                                for a in est["kv"]))
        return est_cache_from_flat(est,
                                   self.dec.flow_cfg.cfm.n_timesteps)

    def _wave_seg_impl(self, flow_params, token_buf, x, mu_w, est, enc_c,
                       n_tok, w0, spks, k_total, base_frames,
                       n_iters: int, dus: bool = False,
                       fused: bool = False):
        """n_iters wavefront iterations starting at global iteration
        ``w0`` — the scan body of _wave_scan_impl, but resumable: est
        arrives already flat (and rotated when dus), the carry leaves in
        the same layout for the next segment."""
        hop = self.hop
        cf = hop * self.ratio
        n_mel = self.n_mel
        wave_model = (self._wave_model_fused if fused
                      else self._wave_model if dus
                      else self._wave_model_onehot)

        def body(carry, w):
            x, mu_w, est_c, enc_c, n_tok = carry

            def run_enc(args):
                enc_c, n_tok = args
                mu, enc2 = self._enc_model.apply(
                    flow_params, *self._slices(token_buf, n_tok, hop),
                    enc_c, n_tok, self._pe_tok, self._pe_mel,
                    finalize=False)
                return mu, enc2, n_tok + hop

            def skip_enc(args):
                enc_c, n_tok = args
                return (jnp.zeros((self.b, cf, n_mel), self.dt),
                        enc_c, n_tok)

            mu_new, enc_c, n_tok = jax.lax.cond(
                w < k_total, run_enc, skip_enc, (enc_c, n_tok))
            exit_mel, x, mu_w, est_c = wave_model.apply(
                flow_params, x, mu_w, mu_new, spks, est_c, w, k_total,
                base_frames)
            return (x, mu_w, est_c, enc_c, n_tok), exit_mel

        carry0 = (x, mu_w, est, enc_c, n_tok)
        ws = w0 + jnp.arange(n_iters, dtype=jnp.int32)
        (x, mu_w, est, enc_c, n_tok), mels = jax.lax.scan(
            body, carry0, ws)
        return mels, x, mu_w, est, enc_c, n_tok

    def _wave_step_kernel_impl(self, flow_params, token_buf, x, mu_w,
                               est_g, enc_c, n_tok, w, spks, k_total,
                               base_frames):
        """ONE kernel-engine wavefront iteration with donated state: the
        grouped est rings are aliased in place BOTH by the Pallas kernel
        and across iterations (no scan-carry ping-pong copy)."""
        hop = self.hop
        cf = hop * self.ratio
        n_mel = self.n_mel

        def run_enc(args):
            enc_c, n_tok = args
            mu, enc2 = self._enc_model.apply(
                flow_params, *self._slices(token_buf, n_tok, hop),
                enc_c, n_tok, self._pe_tok, self._pe_mel,
                finalize=False)
            return mu, enc2, n_tok + hop

        def skip_enc(args):
            enc_c, n_tok = args
            return (jnp.zeros((self.b, cf, n_mel), self.dt),
                    enc_c, n_tok)

        mu_new, enc_c, n_tok = jax.lax.cond(
            w < k_total, run_enc, skip_enc, (enc_c, n_tok))
        scfg = self.dec.flow_cfg
        exit_mel, x, mu_w, est_g = wave_step_pallas(
            self._gp, scfg.cfm, scfg.estimator, self._align, x, mu_w,
            mu_new, spks, est_g, w, k_total, base_frames,
            interpret=self._interpret)
        return exit_mel, x, mu_w, est_g, enc_c, n_tok, w + 1

    def _wave_step_impl(self, flow_params, token_buf, x, mu_w, est_c,
                        enc_c, n_tok, w, spks, k_total, base_frames):
        """ONE wavefront iteration (the scan body of _wave_scan_impl) as a
        standalone jit with donated state buffers: per-call dispatch is
        ~0.04 ms on this stack (BENCH_NOTES), and donation lets XLA write
        the KV rings in place instead of copying a scan carry each
        iteration.  ``w`` is threaded as a device scalar so the loop makes
        no host->device uploads."""
        hop = self.hop
        cf = hop * self.ratio
        n_mel = self.n_mel

        def run_enc(args):
            enc_c, n_tok = args
            mu, enc2 = self._enc_model.apply(
                flow_params, *self._slices(token_buf, n_tok, hop),
                enc_c, n_tok, self._pe_tok, self._pe_mel,
                finalize=False)
            return mu, enc2, n_tok + hop

        def skip_enc(args):
            enc_c, n_tok = args
            return (jnp.zeros((self.b, cf, n_mel), self.dt),
                    enc_c, n_tok)

        mu_new, enc_c, n_tok = jax.lax.cond(
            w < k_total, run_enc, skip_enc, (enc_c, n_tok))
        exit_mel, x, mu_w, est_c = self._wave_model_onehot.apply(
            flow_params, x, mu_w, mu_new, spks, est_c, w, k_total,
            base_frames)
        return exit_mel, x, mu_w, est_c, enc_c, n_tok, w + 1

    def _slices(self, token_buf, n_tok, emit_tokens):
        off = n_tok - self.p
        chunk = jax.lax.dynamic_slice(token_buf, (0, off),
                                      (self.b, emit_tokens))
        ctx = jax.lax.dynamic_slice(token_buf, (0, off + emit_tokens),
                                    (self.b, self.la))
        return chunk, ctx

    def _flow_mels_wave(self, token_buf, cache, plan, stepped: bool = False):
        """Wavefront flow: encoder per hop, pipelined ODE (one batched
        estimator forward per iteration; models/flow/kv_stream.py
        CausalConditionalCFMWave).  Exact same math as the sequential
        per-hop KV path.  Returns (mel (1, T, n_mel) f32, cache).

        ``stepped=True`` runs the loop as per-iteration donated-buffer jit
        dispatches instead of one lax.scan (no carry double-buffering, no
        dead bucket-padding iterations)."""
        d = self.dec
        cfg = d.flow_cfg
        s_steps = cfg.cfm.n_timesteps
        steady = [pl for pl in plan if not pl[1]]
        k = len(steady)
        n_mel = self.n_mel
        base_frames = self.p * self.ratio
        # the stepped loop runs the unstacked engine only; fall through
        # silently and it would benchmark/label the wrong engine
        assert not (stepped and self._stacked), \
            "wave_stepped does not support the stacked wavefront"

        if self._spks_cached is None:
            self._spks_cached = self._spk(self._fp, self._emb)
        spks = self._spks_cached
        # x seeded with the deterministic noise, mu zeros in the estimator
        # dtype (scan-stable; the Wave module casts the incoming encoder
        # chunk to match) — both built device-side, no per-stream upload
        x_wave, mu_wave = self._wave_init()

        need = k + s_steps - 1
        if stepped:
            k_dev = jnp.asarray(k, jnp.int32)
            base_dev = jnp.asarray(base_frames, jnp.int32)
            enc_cache = cache["enc"]
            n_tok = jnp.asarray(self.p, jnp.int32)
            w = jnp.zeros((), jnp.int32)
            x, mu_w = x_wave, mu_wave
            chunks = []
            if self._kernel:
                est = self._prep_est_k(cache["est"])   # extend + group
                for i in range(need):
                    exit_mel, x, mu_w, est, enc_cache, n_tok, w = \
                        self._wave_step_k(self._fp, token_buf, x, mu_w,
                                          est, enc_cache, n_tok, w,
                                          spks, k_dev, base_dev)
                    if i >= s_steps - 1:
                        chunks.append(exit_mel)
                mels = [jnp.concatenate(chunks, axis=1)]
                est = self._fin_est_k(
                    est, jnp.asarray((self.p + k * self.hop)
                                     * self.ratio, jnp.int32))
            else:
                est = self._est_flatten(cache["est"])  # once per stream
                for i in range(need):
                    exit_mel, x, mu_w, est, enc_cache, n_tok, w = \
                        self._wave_step(self._fp, token_buf, x, mu_w,
                                        est, enc_cache, n_tok, w, spks,
                                        k_dev, base_dev)
                    if i >= s_steps - 1:
                        chunks.append(exit_mel)
                mels = [jnp.concatenate(chunks, axis=1)]
                est = self._est_unflatten(est, s_steps=s_steps)
        else:
            n_iters = max(16, ((need + 15) // 16) * 16)  # bucketed programs
            mels_all, est, enc_cache, n_tok = self._wave_scan(
                self._fp, token_buf, x_wave, mu_wave, spks,
                cache["est"], cache["enc"], n_iters=n_iters,
                k_total=jnp.asarray(k, jnp.int32),
                base_frames=jnp.asarray(base_frames, jnp.int32),
                dus=self._dus_ok, fused=self._fused,
                stacked=self._stacked, sp=self._sp,
                kernel=self._kernel, gp=self._gp, unroll=self._unroll)
            mels = [mels_all[s_steps - 1: s_steps - 1 + k]
                    .transpose(1, 0, 2, 3).reshape(self.b, -1, n_mel)]

        cache = {"enc": enc_cache, "est": est, "n_tok": n_tok}
        if plan and plan[-1][1]:
            tail, _ = plan[-1]
            mel, cache = self._hop(self._fp, token_buf, cache,
                                   emit_tokens=tail, finalize=True)
            mels.append(mel)
        mel_full = jnp.concatenate(mels, axis=1)
        return mel_full, cache

    def _seg_sizes(self, need: int, seg_iters: int,
                   grow: bool = False) -> List[int]:
        """Segment-size schedule covering ``need`` wavefront iterations.
        Fixed mode: seg_iters chunks with a bucketed tail.  ``grow``:
        a first segment of exactly s_steps iterations (the first chunk
        exits as early as possible), then doubling up to seg_iters —
        the incremental-streaming schedule (first-chunk latency first,
        throughput once the stream is running)."""
        s_steps = self.dec.flow_cfg.cfm.n_timesteps
        q = min(16, seg_iters)             # tail-segment bucket quantum
        sizes = []
        r = need
        if grow:
            first = min(s_steps, seg_iters)
            sizes.append(first)
            r -= first
            nxt = 8
            while r > max(q, nxt):
                sizes.append(nxt)
                r -= nxt
                nxt = min(nxt * 2, seg_iters)
        while r > 0:
            s = seg_iters if r >= seg_iters else q * ((r + q - 1) // q)
            sizes.append(s)
            r -= s
        return sizes

    def _segment_wavs(self, token_buf, cache, plan, sizes):
        """Yield per-segment f32 device wav arrays (the wavefront scan
        run segment by segment with the bulk vocoder's carry tails —
        exactly the one-pass chain, tests/test_kv_stream.py).  Consumes
        ``cache`` (enc leaves are donated); callers must not reuse it."""
        # _wave_seg runs the unstacked fused engine; make the fallback
        # explicit instead of silently benchmarking the wrong engine
        # auto-selected kernel quietly yields to the segment engine (the
        # states are layout-compatible); an EXPLICIT kernel=True request
        # fails loudly instead of benchmarking the wrong engine
        assert not (self._stacked or self._kernel_explicit), \
            "segmented wavefront does not support the stacked/kernel " \
            "engine"
        d = self.dec
        s_steps = d.flow_cfg.cfm.n_timesteps
        cf = self.hop * self.ratio
        C = self.mel_cache_len
        k = sum(1 for pl in plan if not pl[1])
        has_tail = bool(plan and plan[-1][1])
        tail_tok = plan[-1][0] if has_tail else 0
        n_mel = self.n_mel
        if self._spks_cached is None:
            self._spks_cached = self._spk(self._fp, self._emb)
        spks = self._spks_cached
        x, mu_w = self._wave_init()
        est = self._prep_est(cache["est"])
        enc_cache = cache["enc"]
        n_tok = jnp.asarray(self.p, jnp.int32)
        k_dev = jnp.asarray(k, jnp.int32)
        base_dev = jnp.asarray(self.p * self.ratio, jnp.int32)

        if self._bulk is None:
            from .bulk_voc import BulkVocoder
            self._bulk = BulkVocoder(d, cf)
        done_chunks = 0
        s_tail = w_tail = None
        mel_ctx = None
        w0 = 0
        for si, size in enumerate(sizes):
            mels, x, mu_w, est, enc_cache, n_tok = self._wave_seg(
                self._fp, token_buf, x, mu_w, est, enc_cache, n_tok,
                jnp.asarray(w0, jnp.int32), spks, k_dev, base_dev,
                n_iters=size, dus=self._dus_ok, fused=self._fused)
            lo = max(w0, s_steps - 1)
            hi = min(w0 + size, k + s_steps - 1)
            n_new = max(hi - lo, 0)
            last_seg = (si == len(sizes) - 1)
            if n_new == 0 and not last_seg:
                w0 += size
                continue
            seg_mel = (mels[lo - w0: hi - w0]
                       .transpose(1, 0, 2, 3).reshape(self.b, -1, n_mel))
            w0 += size
            tail_mel = None
            tf = 0
            n_hops = n_new                 # steady hops in this segment
            if last_seg:
                if has_tail:
                    n_total = (self.p + k * self.hop) * self.ratio
                    fin_cache = {"enc": enc_cache,
                                 "est": self._fin_est(
                                     est, jnp.asarray(n_total,
                                                      jnp.int32)),
                                 "n_tok": n_tok}
                    tail_mel, _ = self._hop(self._fp, token_buf,
                                            fin_cache,
                                            emit_tokens=tail_tok,
                                            finalize=True)
                    tf = tail_tok * self.ratio
                else:
                    # no finalize chunk: the stream's LAST steady chunk
                    # plays the tail-hop role (emits everything, like
                    # the unsegmented vocode plan)
                    tf = cf
                    n_hops = n_new - 1
            if done_chunks == 0:
                mel_in = (seg_mel if tail_mel is None
                          else jnp.concatenate([seg_mel, tail_mel],
                                               axis=1))
                wav, s_tail, w_tail = self._bulk.vocode_first(
                    d.hift_params, mel_in, n_steady=n_hops - 1,
                    tail_frames=tf, hold=not last_seg)
            else:
                parts = [mel_ctx, seg_mel]
                if tail_mel is not None:
                    parts.append(tail_mel)
                mel_in = jnp.concatenate(parts, axis=1)
                wav, s_tail, w_tail = self._bulk.vocode_cont(
                    d.hift_params, mel_in, s_tail, w_tail,
                    n_steady=n_hops, tail_frames=tf)
            mel_ctx = seg_mel[:, -C:]
            done_chunks += n_new
            yield wav

    def _stream_decode_segmented(self, token_buf, cache, plan,
                                 output: str, seg_iters: int = 32):
        """Wavefront decode in fixed-size scan SEGMENTS with per-segment
        vocode + pcm + threaded fetch: the device queue stays packed
        (seg1-scan, seg1-voc, seg2-scan, ...) so each segment's fetch
        wire time can ride UNDER the next segment's scan instead of after
        the whole stream (measured a wash through this environment's
        relay, which serializes fetches behind queued compute — kept for
        production attaches where D2H DMA overlaps compute)."""
        import threading
        s_steps = self.dec.flow_cfg.cfm.n_timesteps
        k = sum(1 for pl in plan if not pl[1])
        sizes = self._seg_sizes(k + s_steps - 1, seg_iters)
        results: List = [None] * len(sizes)
        threads = []
        for si, wav in enumerate(
                self._segment_wavs(token_buf, cache, plan, sizes)):
            pcm = _pcm16_device(wav) if output == "int16" else wav

            def fetch(i=si, arr=pcm):
                results[i] = _parallel_fetch(arr)

            th = threading.Thread(target=fetch, daemon=True)
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
        out = np.concatenate([r for r in results if r is not None],
                             axis=1)
        return out if output == "int16" else out.astype(np.float32)

    def stream_decode(self, tokens: np.ndarray,
                      output: str = "float32",
                      bulk_voc: bool = True,
                      wavefront: bool = True,
                      wave_stepped: bool = False,
                      segmented: bool = False,
                      seg_iters: int = 32) -> np.ndarray:
        """Full-stream decode: one upload, incremental KV hops (bucketed
        into lax.scan dispatches), one parallel fetch.

        ``bulk_voc`` vocodes the whole hop chain in one batched HiFT pass
        (pipeline/bulk_voc.py) — identical output, far less per-hop op
        overhead; disable to exercise the per-hop path.
        ``wave_stepped`` selects the donated-buffer per-iteration loop for
        the wavefront (measured SLOWER than the scan through this
        environment's dispatch relay — kept as the documented negative
        result, BENCH_NOTES round 3)."""
        tokens = np.asarray(tokens)
        assert tokens.shape[0] == self.b, (tokens.shape, self.b)
        n = int(tokens.shape[1])
        cap = n + self.hop + self.la + 1
        buf = np.zeros((self.b, cap), np.int32)
        buf[:, :n] = tokens
        token_buf = jnp.asarray(buf)
        cache, voc = self.init_state()
        if self.p:
            cache = self._prefill(self._fp, token_buf, cache)
        plan = self.schedule(n)
        if bulk_voc and len(plan) >= 2:
            n_steady = sum(1 for pl in plan if not pl[1])
            if wavefront and n_steady >= 2:
                if segmented and self.b == 1:
                    return self._stream_decode_segmented(
                        token_buf, cache, plan, output,
                        seg_iters=seg_iters)
                mel_full, _ = self._flow_mels_wave(token_buf, cache, plan,
                                                   stepped=wave_stepped)
            else:
                mel_full, _ = self._flow_mels(token_buf, cache, plan)
            if self._bulk is None:
                from .bulk_voc import BulkVocoder
                self._bulk = BulkVocoder(self.dec, self.hop * self.ratio)
            frames = tuple(e * self.ratio for e, _ in plan)
            wav = self._bulk.vocode(self.dec.hift_params, mel_full, frames)
            if output == "int16":
                return _parallel_fetch(_pcm16_device(wav))
            return _parallel_fetch(wav).astype(np.float32)
        segs = []
        i = 0
        first = True
        while i < len(plan):
            emit_tokens, finalize = plan[i]
            if not first and not finalize:
                run = 0
                while (i + run < len(plan)
                       and plan[i + run] == (emit_tokens, False)):
                    run += 1
                if run > 1:
                    for bucket in (32, 8, 2):
                        while run >= bucket:
                            mels, cache = self._hop_scan(
                                self._fp, token_buf, cache,
                                n_hops=bucket, emit_tokens=emit_tokens)
                            seg, voc = self._voc_scan(
                                self.dec.hift_params, mels, voc)
                            segs.append(seg)
                            run -= bucket
                            i += bucket
                    continue
            mel, cache = self._hop(self._fp, token_buf, cache,
                                   emit_tokens=emit_tokens,
                                   finalize=finalize)
            seg, voc = self._voc(self.dec.hift_params, mel, voc,
                                 first=first, finalize=finalize)
            segs.append(seg)
            first = False
            i += 1
        wav = jnp.concatenate(segs, axis=1)
        if output == "int16":
            return _parallel_fetch(_pcm16_device(wav))
        return _parallel_fetch(wav).astype(np.float32)

    def program_flops(self, n_tokens: int) -> float:
        """Total FLOPs of the compiled programs one default
        ``stream_decode(n_tokens)`` executes (wavefront scan + optional
        prefill/finalize hop + bulk vocode) — XLA cost analysis over the
        same dispatch sequence (utils/flops.py).  Run after a warmup pass
        so lower+compile hit the cache.  NOTE: a bucketed wavefront scan
        includes its dead padding iterations, exactly as executed."""
        from ..utils.flops import compiled_flops

        d = self.dec
        cap = n_tokens + self.hop + self.la + 1
        token_buf = jnp.zeros((self.b, cap), jnp.int32)
        cache, _ = self.init_state()
        total = 0.0
        if self.p:
            total += compiled_flops(self._prefill, self._fp, token_buf,
                                    cache)
        plan = self.schedule(n_tokens)
        n_steady = sum(1 for pl in plan if not pl[1])
        assert len(plan) >= 2 and n_steady >= 2, (
            "program_flops mirrors the default wavefront path", plan)
        s_steps = d.flow_cfg.cfm.n_timesteps
        if self._spks_cached is None:
            self._spks_cached = self._spk(self._fp, self._emb)
        x_wave, mu_wave = self._wave_init()
        need = n_steady + s_steps - 1
        n_iters = max(16, ((need + 15) // 16) * 16)
        total += compiled_flops(
            self._wave_scan, self._fp, token_buf, x_wave, mu_wave,
            self._spks_cached, cache["est"], cache["enc"],
            n_iters=n_iters, k_total=jnp.asarray(n_steady, jnp.int32),
            base_frames=jnp.asarray(self.p * self.ratio, jnp.int32),
            dus=self._dus_ok, fused=self._fused, stacked=self._stacked,
            sp=self._sp, kernel=self._kernel, gp=self._gp,
            unroll=self._unroll)
        if plan and plan[-1][1]:
            total += compiled_flops(self._hop, self._fp, token_buf, cache,
                                    emit_tokens=plan[-1][0], finalize=True)
        if self._bulk is None:
            from .bulk_voc import BulkVocoder
            self._bulk = BulkVocoder(d, self.hop * self.ratio)
        frames = tuple(e * self.ratio for e, _ in plan)
        n_frames = sum(frames)
        mel_full = jnp.zeros((self.b, n_frames, self.n_mel), jnp.float32)
        n_st = max(len(frames) - 2, 0)
        tail = frames[-1] if len(frames) > 1 else 0
        first = frames[0] if len(frames) == 1 else self._bulk.F
        if self.b > 1:
            self._bulk.vocode(d.hift_params,
                              jnp.zeros((self.b, n_frames, self.n_mel),
                                        jnp.float32), frames)  # build _vfn
            total += compiled_flops(self._bulk._vfn, d.hift_params,
                                    mel_full, n_st, tail, first)
        else:
            total += compiled_flops(self._bulk._fn, d.hift_params,
                                    mel_full, n_steady=n_st,
                                    tail_frames=tail, first_frames=first)
        return total

    def stream_chunks(self, tokens: np.ndarray, wavefront: bool = False,
                      seg_iters: int = 32):
        """Yield float32 wav chunks (pipelined fetches).

        Default: one chunk per hop (per-hop flow + vocoder dispatches —
        finest granularity).  ``wavefront=True``: the segmented wavefront
        scan with a GROWING segment schedule (first segment = s_steps
        iterations so the first chunk exits as early as the ODE depth
        allows, then doubling up to ``seg_iters``) — chunk sizes grow but
        total decode time drops to the wavefront's (same growing-emission
        idea as the reference v1's stream_scale_factor schedule,
        cli/model.py:129-176, applied to catch-up decoding)."""
        import queue
        import threading

        tokens = np.asarray(tokens)
        n = int(tokens.shape[1])
        cap = n + self.hop + self.la + 1
        buf = np.zeros((self.b, cap), np.int32)
        buf[:, :n] = tokens
        token_buf = jnp.asarray(buf)
        cache, voc = self.init_state()
        if self.p:
            cache = self._prefill(self._fp, token_buf, cache)
        plan = self.schedule(n)
        n_steady = sum(1 for pl in plan if not pl[1])
        if wavefront and self.b == 1 and n_steady >= 2:
            s_steps = self.dec.flow_cfg.cfm.n_timesteps
            sizes = self._seg_sizes(n_steady + s_steps - 1, seg_iters,
                                    grow=True)
            segs = list(self._segment_wavs(token_buf, cache, plan, sizes))
        else:
            segs = []
            first = True
            for emit_tokens, finalize in plan:
                mel, cache = self._hop(self._fp, token_buf,
                                       cache, emit_tokens=emit_tokens,
                                       finalize=finalize)
                seg, voc = self._voc(self.dec.hift_params, mel, voc,
                                     first=first, finalize=finalize)
                segs.append(seg)
                first = False

        q: "queue.Queue" = queue.Queue(maxsize=8)

        def fetcher():
            for s in segs:
                q.put(np.asarray(s, dtype=np.float32))
            q.put(None)

        threading.Thread(target=fetcher, daemon=True).start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def warmup(self, n_tokens: int):
        self.stream_decode(np.zeros((self.b, n_tokens), np.int32))
