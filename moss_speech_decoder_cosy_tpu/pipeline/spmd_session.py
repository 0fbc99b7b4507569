"""SPMD multi-stream serving: lane-sharded lockstep KV decode over a
``jax.sharding.Mesh`` (SURVEY §7.1: "shard_map for multi-stream serving,
one stream per device").

The lockstep batched KV wavefront (pipeline/kv_session.py, batch=N) is
embarrassingly parallel over the lane axis: every estimator / encoder /
vocoder op treats a lane (and its CFG double) independently — there is no
cross-lane math anywhere in the decode path.  ``shard_map`` over a 1-D
mesh therefore partitions the WHOLE decode with zero collectives: each
device runs ``batch / n_devices`` streams of the exact single-chip
program on its local shard.  Aggregate throughput scales linearly with
devices; per-stream latency is the single-chip lockstep latency.  The
zero-collective claim is asserted by test (the compiled flow program's
HLO contains no all-reduce / all-gather / collective-permute).

Flow and vocoder stay SEPARATE XLA programs (the remote compiler wedges
on the fused monolith — BENCH_NOTES.md).

Reference role: multi-GPU serving/eval in the reference is process-level
sharding — torchrun RANK file-sharding (benchmark_moss_decoder.py:175-189)
and per-uuid CUDA streams (cosyvoice/cli/model.py:58-65).  Here ONE SPMD
program serves the whole mesh; scale-out is a mesh-shape change, not a
process topology.

Scope: homogeneous fan-out (all streams share one token length and one
hop plan) — the bulk-eval / offline-batch engine.  Heterogeneous arrival
is the continuous batcher's job (pipeline/kv_batcher.py), which can run
one instance per device the same process-level way the reference does.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8: jax.shard_map, check_vma replaces check_rep
    from jax import shard_map as _shard_map

    def shard_map(fn, *, mesh, in_specs, out_specs, check_rep):
        return _shard_map(fn, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


class SPMDKVDecoder:
    """Mesh-sharded lockstep KV decoder.

    ``decode(tokens)`` takes (batch, n_tokens) int32 — one row per
    stream, ``batch`` a multiple of the mesh axis size — and returns the
    decoded waveforms (batch, samples) float32, computed as one
    lane-sharded SPMD flow program plus one SPMD vocoder program.
    """

    def __init__(self, dec, mesh: Mesh, prompt_token=None,
                 prompt_feat=None, embedding=None,
                 block_size: Optional[int] = None,
                 ring_tokens: Optional[int] = None,
                 token_cap: int = 2048, batch: Optional[int] = None,
                 axis: Optional[str] = None,
                 write_mode: str = "auto", fused: bool = True):
        self.dec = dec
        self.mesh = mesh
        self.axis = axis or mesh.axis_names[0]
        n_dev = mesh.shape[self.axis]
        self.b = batch or n_dev
        assert self.b % n_dev == 0, (self.b, n_dev)
        self.b_local = self.b // n_dev
        # the local session: every impl function at local batch, exactly
        # the code a single chip runs (prompts with leading dim 1 are
        # shared across streams by its _bcast, as in kv_stream_decoder)
        self.loc = dec.kv_stream_decoder(
            prompt_token=prompt_token, prompt_feat=prompt_feat,
            embedding=embedding, block_size=block_size,
            ring_tokens=ring_tokens, token_cap=token_cap,
            batch=self.b_local, write_mode=write_mode, fused=fused)
        self.hop = self.loc.hop
        self.la = self.loc.la
        self.ratio = self.loc.ratio
        # replicated operands placed once (params move host->devices a
        # single time instead of per program via GSPMD)
        rep = NamedSharding(mesh, P())
        self._fp = jax.device_put(self.loc._fp, rep)
        self._hp = jax.device_put(dec.hift_params, rep)
        self._tok_sh = NamedSharding(mesh, P(self.axis, None))
        from .bulk_voc import BulkVocoder
        self._bulk = BulkVocoder(dec, self.hop * self.ratio)
        self._flow_progs = {}
        self._voc_progs = {}

    # ------------------------------------------------------------ programs
    # Compiled-program caches live in instance dicts (NOT lru_cache on the
    # bound methods — that keys on self and pins the decoder plus all its
    # device buffers for the process lifetime).
    def _flow_prog(self, k: int, tail: int):
        prog = self._flow_progs.get((k, tail))
        if prog is None:
            prog = self._flow_progs[(k, tail)] = self._build_flow_prog(
                k, tail)
        return prog

    def _voc_prog(self, plan: Tuple[int, ...]):
        prog = self._voc_progs.get(plan)
        if prog is None:
            prog = self._voc_progs[plan] = self._build_voc_prog(plan)
        return prog

    def _build_flow_prog(self, k: int, tail: int):
        """Lane-sharded flow program for a plan of ``k`` steady hops plus
        a ``tail``-token finalize chunk (0 = none).  Local body = the
        single-chip wavefront path (kv_session._flow_mels_wave) at
        b_local streams."""
        loc = self.loc
        s_steps = self.dec.flow_cfg.cfm.n_timesteps
        n_mel = loc.n_mel
        need = k + s_steps - 1
        n_iters = max(16, ((need + 15) // 16) * 16)

        def fn(fp, token_buf):
            from ..models.flow.kv_stream import init_kv_cache
            cache = init_kv_cache(self.dec.flow_cfg, loc.ring_tokens,
                                  batch=self.b_local, dtype=loc.dt,
                                  est_dtype=loc.est_dt)
            if loc.p:
                cache = loc._prefill_impl(fp, token_buf, cache)
            spks = loc._enc_model.apply(fp, loc._emb,
                                        method=loc._enc_model.spk)
            x_wave, mu_wave = loc._wave_init_impl()
            mels_all, est, enc_cache, n_tok = loc._wave_scan_impl(
                fp, token_buf, x_wave, mu_wave, spks,
                cache["est"], cache["enc"], n_iters=n_iters,
                k_total=jnp.asarray(k, jnp.int32),
                base_frames=jnp.asarray(loc.p * loc.ratio, jnp.int32),
                dus=loc._dus_ok, fused=loc._fused,
                kernel=loc._kernel, gp=loc._gp, unroll=loc._unroll)
            mel = (mels_all[s_steps - 1: s_steps - 1 + k]
                   .transpose(1, 0, 2, 3).reshape(self.b_local, -1, n_mel))
            if tail:
                cache = {"enc": enc_cache, "est": est, "n_tok": n_tok}
                tm, _ = loc._hop_impl(fp, token_buf, cache,
                                      emit_tokens=tail, finalize=True)
                mel = jnp.concatenate([mel, tm], axis=1)
            return mel

        sm = shard_map(fn, mesh=self.mesh,
                       in_specs=(P(), P(self.axis, None)),
                       out_specs=P(self.axis, None, None),
                       check_rep=False)
        return jax.jit(sm)

    def _build_voc_prog(self, plan: Tuple[int, ...]):
        """Lane-sharded bulk vocoder for a per-hop mel-frame plan."""
        bulk = self._bulk
        n_steady = max(len(plan) - 2, 0)
        tail = plan[-1] if len(plan) > 1 else 0
        first = plan[0] if len(plan) == 1 else bulk.F

        def one(hp, mel_row):
            wav, _, _ = bulk._impl(hp, mel_row[None], n_steady, tail,
                                   first_frames=first)
            return wav[0]

        def fn(hp, mel):
            return jax.vmap(one, in_axes=(None, 0))(hp, mel)

        sm = shard_map(fn, mesh=self.mesh,
                       in_specs=(P(), P(self.axis, None, None)),
                       out_specs=P(self.axis, None),
                       check_rep=False)
        return jax.jit(sm)

    # ------------------------------------------------------------ decode
    def decode(self, tokens: np.ndarray, output: str = "float32"):
        """tokens (batch, n) -> waveforms (batch, samples).

        All streams share one hop plan (lockstep); per-stream content is
        free.  ``output='int16'`` fetches PCM16 (the wire format)."""
        tokens = np.asarray(tokens)
        assert tokens.shape[0] == self.b, (tokens.shape, self.b)
        n = int(tokens.shape[1])
        plan = self.loc.schedule(n)
        steady = sum(1 for pl in plan if not pl[1])
        assert steady >= 2, "SPMD decoder needs >= 2 steady hops"
        tail = plan[-1][0] if plan and plan[-1][1] else 0
        cap = n + self.hop + self.la + 1
        buf = np.zeros((self.b, cap), np.int32)
        buf[:, :n] = tokens
        token_buf = jax.device_put(buf, self._tok_sh)
        mel = self._flow_prog(steady, tail)(self._fp, token_buf)
        frames = tuple(e * self.ratio for e, _ in plan)
        wav = self._voc_prog(frames)(self._hp, mel)
        if output == "int16":
            from .device_session import _pcm16_device
            return np.asarray(jax.device_get(_pcm16_device(wav)))
        return np.asarray(jax.device_get(wav)).astype(np.float32)

    def program_flops(self, n_tokens: int) -> float:
        """Total FLOPs of the two SPMD programs one ``decode`` of
        ``n_tokens``-token streams executes (flow + vocoder), by XLA cost
        analysis of the compiled (partitioned) modules — the aggregate-MFU
        numerator for the mesh-sharded serving path (utils/flops.py).
        Note: XLA reports the partitioned per-device module's FLOPs; with
        identical lanes per device, whole-mesh FLOPs = this x n_devices
        and per-chip MFU uses this value directly."""
        from ..utils.flops import compiled_flops
        plan = self.loc.schedule(n_tokens)
        steady = sum(1 for pl in plan if not pl[1])
        tail = plan[-1][0] if plan and plan[-1][1] else 0
        cap = n_tokens + self.hop + self.la + 1
        buf = jnp.zeros((self.b, cap), jnp.int32)
        total = compiled_flops(self._flow_prog(steady, tail),
                               self._fp, buf)
        frames = tuple(e * self.ratio for e, _ in plan)
        n_frames = sum(frames)
        mel = jnp.zeros((self.b, n_frames, self.loc.n_mel), jnp.float32)
        total += compiled_flops(self._voc_prog(frames), self._hp, mel)
        return total

    def flow_hlo(self, n_tokens: int) -> str:
        """Optimized HLO of the flow program for a given stream length
        (test hook: asserts the zero-collective claim)."""
        plan = self.loc.schedule(n_tokens)
        steady = sum(1 for pl in plan if not pl[1])
        tail = plan[-1][0] if plan and plan[-1][1] else 0
        cap = n_tokens + self.hop + self.la + 1
        buf = jnp.zeros((self.b, cap), jnp.int32)
        lowered = self._flow_prog(steady, tail).lower(self._fp, buf)
        return lowered.compile().as_text()
