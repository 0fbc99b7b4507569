"""Batched bulk vocoding: the whole hop chain in one HiFT forward.

The per-hop vocoder chain (device_session._voc_step_impl /
kv_session._voc_impl) is sequential only through three caches:

- mel cache      = the previous 8 GLOBAL mel frames — pure data, known
                   upfront once the full mel is available;
- source cache   = the previous hop's last ``scl`` excitation samples; the
                   head replacement (generator.py:578-580) is POINTWISE, and
                   ``2*scl <= hop wav length``, so every hop's source TAIL is
                   independent of its own head fix — a shifted gather
                   resolves the whole chain after ONE batched source pass;
- speech cache   = the previous hop's last ``scl`` wav samples for the
                   Hamming cross-fade; the fade only rewrites the HEAD, so
                   tails are again fix-independent and the fades vectorize.

Hence bulk mode: stack all steady hops on the batch axis, run source and
decode once each, then do two shifted head-fix gathers — bit-identical to
the sequential chain (tests/test_kv_stream.py) at a fraction of the
per-hop dispatch/op overhead (each hop is ~100 tiny convs; batching turns
them MXU-bound).  Live streaming keeps the per-hop path; bulk mode serves
offline decode and faster-than-realtime catch-up.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


class BulkVocoder:
    """Vocodes a full mel sequence with the session hop semantics
    (hop emit_frames per chunk, mel_cache_len context, cross-fades)."""

    def __init__(self, dec, emit_frames: int):
        self.dec = dec
        self.F = emit_frames                       # mel frames per hop
        self.C = dec.pipe_cfg.mel_cache_len
        self.scl = dec.source_cache_len
        self.u = dec.hift_cfg.total_upsample
        assert 2 * self.C <= self.F + self.C, \
            "hop too small for independent head fixes"
        win = np.hamming(2 * self.scl).astype(np.float32)
        self._fade_in = jnp.asarray(win[: self.scl])
        self._fade_out = jnp.asarray(win[self.scl:])
        self._fn = jax.jit(self._impl,
                           static_argnames=("n_steady", "tail_frames",
                                            "first_frames", "hold"))
        self._seg_fn = jax.jit(self._seg_impl,
                               static_argnames=("n_steady", "tail_frames"))
        self._vfn = None                   # lazy vmapped multi-stream form

    def _hift_source(self, params, mel):
        return self.dec.hift.apply(params, mel, jax.random.PRNGKey(0),
                                   method=self.dec.hift.source)

    def _hift_decode(self, params, mel, s):
        return self.dec.hift.apply(params, mel, s,
                                   method=self.dec.hift.decode)

    def _impl(self, hift_params, mel: jnp.ndarray, n_steady: int,
              tail_frames: int, first_frames: int = 0,
              hold: bool = False):
        """mel (1, Tm, D) f32, hop plan = [first] + [F]*n_steady + [tail].
        Returns (wav (1, first*u + F*u*n_steady + tail*u), s_tail, w_tail)
        — the carry tails let a later SEGMENT continue the chain
        (``_seg_impl``) bit-identically to one unsegmented pass.
        ``hold=True`` marks a mid-stream segment: the single-hop
        emit-everything shortcut is disabled (the trailing ``scl``
        samples stay withheld for the next segment's cross-fade)."""
        d = self.dec
        dt = d.compute_dtype or jnp.float32
        f, c, scl, u = self.F, self.C, self.scl, self.u
        first = first_frames or f

        mel0 = mel[:, :first].astype(dt)
        s0 = self._hift_source(hift_params, mel0)          # (1, F*u, 1)
        w0 = self._hift_decode(hift_params, mel0, s0)      # (1, F*u)

        if n_steady == 0 and tail_frames == 0:
            if hold:                     # mid-stream single-hop segment
                return (w0[:, : f * u - scl].astype(jnp.float32),
                        s0[:, -scl:], w0[:, -scl:])
            # single-hop plan: the first hop IS the finalize hop — emit
            # everything (no cache tail is withheld)
            return (w0.astype(jnp.float32), s0[:, -scl:], w0[:, -scl:])

        outs = [w0[:, : f * u - scl]]
        last_s_tail = s0[:, -scl:]
        last_w_tail = w0[:, -scl:]

        if n_steady > 0:
            starts = (1 + jnp.arange(n_steady)) * f - c
            idx = starts[:, None] + jnp.arange(f + c)[None, :]
            wins = mel[0][idx].astype(dt)                  # (n, F+C, D)
            (emit, last_s_tail,
             last_w_tail) = self._steady(hift_params, wins,
                                         last_s_tail, last_w_tail)
            outs.append(emit)

        if tail_frames > 0:
            t0 = (1 + n_steady) * f
            mel_t = mel[:, t0 - c: t0 + tail_frames].astype(dt)
            outs.append(self._tail_hop(hift_params, mel_t,
                                       last_s_tail, last_w_tail))

        wav = jnp.concatenate([o.astype(jnp.float32) for o in outs],
                              axis=1)
        return wav, last_s_tail, last_w_tail

    def _steady(self, hift_params, wins, last_s_tail, last_w_tail):
        """Batched steady hops: wins (n, F+C, D) in compute dtype, carry
        tails in. Returns (emit (1, n*F*u), s_tail, w_tail)."""
        f, c, scl, u = self.F, self.C, self.scl, self.u
        ss = self._hift_source(hift_params, wins)      # (n, (F+C)u, 1)
        prev_s = jnp.concatenate([last_s_tail, ss[:-1, -scl:]], axis=0)
        ss = jnp.concatenate([prev_s.astype(ss.dtype), ss[:, scl:]],
                             axis=1)
        ws = self._hift_decode(hift_params, wins, ss)  # (n, (F+C)u)
        prev_w = jnp.concatenate([last_w_tail, ws[:-1, -scl:]], axis=0)
        heads = (ws[:, :scl] * self._fade_in
                 + prev_w * self._fade_out)
        ws_fixed = jnp.concatenate([heads, ws[:, scl:]], axis=1)
        emit = ws_fixed[:, : (f + c) * u - scl]        # F*u per hop
        return emit.reshape(1, -1), ss[-1:, -scl:], ws[-1:, -scl:]

    def _tail_hop(self, hift_params, mel_t, last_s_tail, last_w_tail):
        """Finalize hop over mel (1, C+tail, D): emits everything."""
        scl = self.scl
        s_t = self._hift_source(hift_params, mel_t)
        s_t = jnp.concatenate(
            [last_s_tail.astype(s_t.dtype), s_t[:, scl:]], axis=1)
        w_t = self._hift_decode(hift_params, mel_t, s_t)
        head = (w_t[:, :scl] * self._fade_in
                + last_w_tail * self._fade_out)
        return jnp.concatenate([head, w_t[:, scl:]], axis=1)

    def _seg_impl(self, hift_params, mel: jnp.ndarray, s_tail, w_tail,
                  n_steady: int, tail_frames: int):
        """Continuation segment: mel (1, C + F*n_steady + tail_frames, D)
        with the previous C GLOBAL mel frames prepended, plus the carry
        tails from the previous segment (same dtype discipline as one
        unsegmented `_impl` pass — outputs are bit-identical).  Returns
        (wav (1, F*u*n_steady + tail*u), s_tail, w_tail)."""
        dt = self.dec.compute_dtype or jnp.float32
        f, c = self.F, self.C
        outs = []
        if n_steady > 0:
            starts = jnp.arange(n_steady) * f
            idx = starts[:, None] + jnp.arange(f + c)[None, :]
            wins = mel[0][idx].astype(dt)                  # (n, F+C, D)
            emit, s_tail, w_tail = self._steady(hift_params, wins,
                                                s_tail, w_tail)
            outs.append(emit)
        if tail_frames > 0:
            t0 = c + n_steady * f
            mel_t = mel[:, t0 - c: t0 + tail_frames].astype(dt)
            outs.append(self._tail_hop(hift_params, mel_t, s_tail, w_tail))
        wav = jnp.concatenate([o.astype(jnp.float32) for o in outs],
                              axis=1)
        return wav, s_tail, w_tail

    def vocode(self, hift_params, mel: jnp.ndarray,
               plan: Tuple[int, ...]) -> jnp.ndarray:
        """plan: per-hop emit mel-frame counts, [F, F, ..., F, tail] — or
        a single finalize hop [n] (one plain pass, nothing withheld).
        mel (B, Tm, D): B > 1 vocodes B lockstep streams (vmapped —
        identical per-stream semantics)."""
        assert all(p == self.F for p in plan[:-1]), plan
        n_steady = max(len(plan) - 2, 0)
        tail = plan[-1] if len(plan) > 1 else 0
        first = plan[0] if len(plan) == 1 else self.F
        if mel.shape[0] > 1:
            if self._vfn is None:
                self._vfn = jax.jit(jax.vmap(
                    lambda p, m, n, t, ff: self._impl(p, m[None], n, t,
                                                      ff)[0][0],
                    in_axes=(None, 0, None, None, None)),
                    static_argnums=(2, 3, 4))
            return self._vfn(hift_params, mel, n_steady, tail, first)
        return self._fn(hift_params, mel, n_steady=n_steady,
                        tail_frames=tail, first_frames=first)[0]

    def vocode_first(self, hift_params, mel: jnp.ndarray, n_steady: int,
                     tail_frames: int, hold: bool = False):
        """First SEGMENT of a segmented stream: first hop + n_steady
        steady hops (+ optional finalize tail if this is also the last
        segment; ``hold=True`` when more segments follow).  mel
        (1, F*(1+n_steady)+tail, D).  Returns (wav, s_tail, w_tail) for
        `vocode_cont` to continue."""
        return self._fn(hift_params, mel, n_steady=n_steady,
                        tail_frames=tail_frames, first_frames=self.F,
                        hold=hold)

    def vocode_cont(self, hift_params, mel_ctx: jnp.ndarray, s_tail,
                    w_tail, n_steady: int, tail_frames: int):
        """Continuation segment over mel with the previous C global
        frames prepended: (1, C + F*n_steady + tail, D)."""
        return self._seg_fn(hift_params, mel_ctx, s_tail, w_tail,
                            n_steady=n_steady, tail_frames=tail_frames)
