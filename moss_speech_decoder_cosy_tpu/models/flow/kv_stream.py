"""Incremental KV-cached streaming flow path.

The reference's streaming decode re-runs a bounded 40-token window per
5-token hop (flow_inference.py:194-204) — 8x redundant FLOPs.  This module
computes every frame exactly ONCE: each hop pushes only the new chunk
through the encoder and the CFM U-Net, attending to circular KV rings of
the recent past (per conformer layer for the encoder; per U-Net attention
layer AND per ODE step for the estimator, since x_t differs at every Euler
step).  Causal convs carry explicit (k-1)-frame caches (per ODE step in the
estimator).

Semantics: exactly one forward pass with a banded chunk-causal mask
(``ops.masks.banded_chunk_mask``) — chunk c attends to itself plus the
``ring`` frames before it.  This deviates from the reference's windowed
re-decode (where old frames are recomputed each hop under a shifted
window); the deviation is quantified in tests/test_kv_stream.py and the
exact ring==banded-forward equivalence is asserted there.

Key TPU-first facts exploited:
- the estimator's UNetAttention has no positional encoding, and the encoder
  attention's position term is key-indexed (wenet 'rel_pos' flavor, no
  rel-shift) and cached per slot — so softmax is permutation-invariant over
  key slots and the rings can be true circular buffers updated with O(chunk)
  scatters instead of O(ring) shifts;
- positional tables are uploaded once and sliced on device (no per-hop host
  traffic);
- the whole hop is two static-shape jitted programs (flow chunk, vocoder
  chunk) — see pipeline/kv_session.py.

All mirror modules reuse the parameter names of the full modules in
encoder.py / estimator.py / cfm.py / flow.py, with ONE re-pack applied by
``fuse_qkv_params``: the per-layer q/k/v projections are concatenated into
single ``to_qkv`` / ``linear_qkv`` kernels (one matmul instead of three —
the wavefront scan body is op-dispatch-bound at ~2.7 us per HLO op on this
chip, BENCH_NOTES round 3, so op count IS the cost model).  Sessions apply
the transform once at init; any other structural drift still fails loudly
as a missing-parameter error.  K and V share one ring buffer per layer
(feature-concatenated) for the same reason: half the ring writes and carry
leaves.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .cfm import _fixed_noise, t_span_cosine
from .encoder import LinearEmbed, FeedForward
from ...ops.activations import mish, get_activation
from ...ops.attention import masked_softmax, _NEG
from ...ops.convs import Conv1d, CausalConv1d
from ...ops.embeddings import SinusoidalPosEmb, TimestepEmbedding, \
    _abs_pe_table
from ...utils.config import (FlowConfig, EncoderConfig, EstimatorConfig,
                             CFMConfig)


# --------------------------------------------------------------------------
# param re-pack: per-layer q/k/v projections -> one fused qkv matmul
# --------------------------------------------------------------------------

def fuse_qkv_params(params):
    """Re-pack a canonical CausalMaskedDiffWithXvec param tree for the KV
    step modules: every estimator ``attn1.{to_q,to_k,to_v}`` becomes one
    ``to_qkv`` kernel and every encoder ``self_attn.{linear_q,linear_k,
    linear_v}`` one ``linear_qkv`` kernel+bias (zeros where torch had no
    k-bias).  Column-block concatenation only — each output column's dot
    product is unchanged, so the fused matmul is numerically identical.

    Applied once per session (sessions cache the fused tree); converters
    and the full modules keep the canonical torch-compatible layout.

    Untouched leaves are returned BY REFERENCE (they stay shared with the
    input tree — only the concatenated qkv kernels allocate new buffers),
    and all concatenations run as ONE jitted dispatch.  Do not wrap this
    in jax.jit: jit outputs never alias undonated inputs, so a jitted
    call would materialise a second full copy of the flow params."""

    jobs = []          # (container, key, kind, (q_subtree, k, v))

    def walk(d):
        if not isinstance(d, dict):
            return d
        out = {k: walk(v) for k, v in d.items()}
        if {"to_q", "to_k", "to_v"} <= set(out):
            qkv = tuple(out.pop(n) for n in ("to_q", "to_k", "to_v"))
            jobs.append((out, "to_qkv", "attn", qkv))
        if {"linear_q", "linear_k", "linear_v"} <= set(out):
            qkv = tuple(out.pop(n) for n in
                        ("linear_q", "linear_k", "linear_v"))
            jobs.append((out, "linear_qkv", "enc", qkv))
        return out

    out = walk(params)
    if jobs:
        kinds = tuple(j[2] for j in jobs)

        def _fuse(groups):
            res = []
            for kind, (q, k, v) in zip(kinds, groups):
                kern = jnp.concatenate(
                    [q["kernel"], k["kernel"], v["kernel"]], axis=-1)
                if kind == "attn":
                    res.append({"kernel": kern})
                else:
                    dim = q["kernel"].shape[-1]
                    zero = jnp.zeros((dim,), q["kernel"].dtype)
                    bias = jnp.concatenate([q.get("bias", zero),
                                            k.get("bias", zero),
                                            v.get("bias", zero)], axis=-1)
                    res.append({"kernel": kern, "bias": bias})
            return res

        fused = jax.jit(_fuse)([j[3] for j in jobs])
        for (container, key, _, _), leaf in zip(jobs, fused):
            container[key] = leaf
    return out


# --------------------------------------------------------------------------
# ring utilities
# --------------------------------------------------------------------------

def quantize_ring_chunk(chunk: jnp.ndarray):
    """Per-frame symmetric int8 quantization of a K/V chunk (…, C, 2d):
    scale = max|kv| / 127 over the feature dim, stored alongside the
    values — the HBM mitigation for the quality ring configuration
    (estimator rings are ~0.3 GB/stream bf16 at ring 35; int8 halves
    them again, letting ring-70 quality serving fit larger batches)."""
    af = jnp.max(jnp.abs(chunk).astype(jnp.float32), axis=-1,
                 keepdims=True)
    s = af / 127.0
    v = jnp.clip(jnp.round(chunk.astype(jnp.float32)
                           / jnp.maximum(s, 1e-20)), -127, 127)
    return {"v": v.astype(jnp.int8), "s": s}


def dequantize_ring(ring, dtype) -> jnp.ndarray:
    """{"v": int8, "s": f32} -> (…, R, 2d) in ``dtype``."""
    return (ring["v"].astype(jnp.float32) * ring["s"]).astype(dtype)


def ring_leaf_len(leaf) -> int:
    """Ring capacity of a (possibly quantized) est ring leaf."""
    return (leaf["v"] if isinstance(leaf, dict) else leaf).shape[-2]


def write_ring_leaf(write_fn, ring, chunk, *args, **kw):
    """Apply a float ring-write primitive to a plain or int8-quantized
    ring leaf.  Quantized path: the chunk is quantized per frame, then
    values and scales are written with the SAME primitive in f32 —
    integer magnitudes ≤ 127 round-trip f32 exactly, so the one-hot /
    DUS arithmetic stays bit-faithful to the stored int8."""
    if not isinstance(ring, dict):
        return write_fn(ring, chunk, *args, **kw)
    qc = quantize_ring_chunk(chunk)
    v = write_fn(ring["v"].astype(jnp.float32),
                 qc["v"].astype(jnp.float32), *args, **kw)
    s = write_fn(ring["s"], qc["s"], *args, **kw)
    return {"v": jnp.round(v).astype(jnp.int8), "s": s}


def ring_write(ring: jnp.ndarray, chunk: jnp.ndarray,
               n_done: jnp.ndarray) -> jnp.ndarray:
    """Write ``chunk`` into the circular ``ring`` at positions
    ``n_done .. n_done+C (mod R)`` along axis -2.  If the chunk is longer
    than the ring only its tail is written (earlier frames would be
    overwritten anyway).

    Implemented as a one-hot matmul instead of a scatter: TPU scatters
    with computed indices serialize (~3.6 ms measured on the full-size
    rings vs <1 ms for the matmul form), while a {0,1} one-hot contraction
    rides the MXU and is bit-exact (each output row has at most one
    contribution)."""
    r = ring.shape[-2]
    c = chunk.shape[-2]
    m = min(c, r)
    tail = chunk[..., c - m:, :].astype(ring.dtype)
    idx = (n_done + (c - m) + jnp.arange(m)) % r
    oh = jax.nn.one_hot(idx, r, dtype=ring.dtype)          # (m, R)
    keep = 1.0 - jnp.sum(oh, axis=0)                       # (R,)
    contrib = jnp.einsum("...md,mr->...rd", tail, oh)
    return ring * keep[:, None] + contrib


def _ring_mask(ring_len: int, chunk_len: int,
               n_done: jnp.ndarray,
               rot: Optional[jnp.ndarray] = None,
               fused: bool = False) -> jnp.ndarray:
    """(B|1, 1, chunk, ring+chunk) bool attend-mask: ring slots are valid
    only where already written (fewer than ``ring_len`` frames seen so
    far); the current chunk is fully visible (chunk-causal semantics).
    ``n_done`` may be a scalar or a per-sample (B,) vector (wavefront
    batching, where every sample sits at a different stream position).

    ``rot`` (B,) rotates each sample's slot numbering: sample b's frame f
    lives at slot ``(f + rot[b]) % ring_len`` instead of ``f % ring_len``
    (the shared-offset DUS write scheme — see ring_write_dus).

    ``fused``: write-then-attend layout — the current chunk has already
    been written INTO the ring (capacity ring_len = left context + chunk),
    so no chunk columns are appended; callers pass ``n_done`` already
    including the chunk's frames.  Shape (B, 1, chunk, ring_len)."""
    n_done = jnp.asarray(n_done)
    if n_done.ndim == 0:
        n_done = n_done[None]
    b = n_done.shape[0]
    pos = jnp.arange(ring_len)[None, :]
    if rot is not None:
        pos = (pos - rot[:, None]) % ring_len
    ring_ok = pos < n_done[:, None]                             # (B, R)
    if fused:
        return jnp.broadcast_to(ring_ok[:, None, None, :],
                                (b, 1, chunk_len, ring_len))
    key_ok = jnp.concatenate(
        [jnp.broadcast_to(ring_ok, (b, ring_len)),
         jnp.ones((b, chunk_len), bool)], axis=1)
    return jnp.broadcast_to(key_ok[:, None, None, :],
                            (b, 1, chunk_len, ring_len + chunk_len))


def ring_write_batched(ring: jnp.ndarray, chunk: jnp.ndarray,
                       n_done: jnp.ndarray, enable=None) -> jnp.ndarray:
    """ring (B, R, d), chunk (B, C, d), n_done (B,): write each sample's
    chunk at its own circular position (wavefront batching); one ring
    buffer per attention layer (the per-layer pytree keeps each while-
    carry leaf independently aliasable — a stacked (L, ...) buffer forced
    a strided 2.9 MB copy per layer per iteration, ~320 MB/iter measured
    in the optimized TPU HLO).

    ``enable`` (B,) bool masks out writes for invalid wavefront slots.

    One-hot matmul form (see ring_write): per-sample one-hots contract on
    the MXU; disabled samples get an all-zero one-hot, which keeps their
    ring untouched."""
    r = ring.shape[-2]
    c = chunk.shape[-2]
    m = min(c, r)
    tail = chunk[..., c - m:, :].astype(ring.dtype)
    idx = (n_done[:, None] + (c - m) + jnp.arange(m)[None, :]) % r  # (B, m)
    oh = jax.nn.one_hot(idx, r, dtype=ring.dtype)          # (B, m, R)
    if enable is not None:
        oh = oh * enable[:, None, None].astype(ring.dtype)
    keep = 1.0 - jnp.sum(oh, axis=1)                       # (B, R)
    contrib = jnp.einsum("bmd,bmr->brd", tail, oh)
    return ring * keep[:, :, None] + contrib


def ring_write_dus(ring: jnp.ndarray, chunk: jnp.ndarray,
                   offset: jnp.ndarray, enable: jnp.ndarray,
                   align: int) -> jnp.ndarray:
    """Write ``chunk`` (B, C, d) into ``ring`` (B, R, d) at ONE shared
    dynamic ``offset`` along the ring axis — the O(chunk) alternative to
    the O(ring) one-hot RMW (ring * keep + contrib reads and rewrites
    every ring byte; ~620 MB/iteration on the full-size est cache, the
    dominant wavefront cost — BENCH_NOTES round 3).

    Preconditions (enforced by the caller): R % C == 0 and every write
    offset ≡ ``align`` (mod C) — then the wrap, when it happens, always
    splits at the STATIC ``C - align`` boundary, so the write is two
    static-size dynamic_update_slices.  Rows with ``enable`` False keep
    their old content (read-modify of just the C-frame slice).
    """
    b, r, d = ring.shape
    c = chunk.shape[-2]
    m1 = c - align
    en = enable[:, None, None]

    def put(ring, part, off):
        old = jax.lax.dynamic_slice(ring, (0, off, 0),
                                    (b, part.shape[-2], d))
        new = jnp.where(en, part.astype(ring.dtype), old)
        return jax.lax.dynamic_update_slice(ring, new, (0, off, 0))

    ring = put(ring, chunk[..., :m1, :], offset)
    if align:
        ring = put(ring, chunk[..., m1:, :], (offset + m1) % r)
    return ring


def rotate_rings(rings: jnp.ndarray, rot, inverse: bool = False
                 ) -> jnp.ndarray:
    """Roll each batch row's ring axis by its static ``rot`` (list of
    python ints per row) — converts canonical slot numbering
    (frame f -> slot f % R) to the rotated numbering the shared-offset
    DUS scheme uses (slot (f + rot) % R), and back.  ``rings`` is one
    layer's (B, R, d) buffer.  One-time cost at wavefront entry/exit."""
    parts = []
    for i, s in enumerate(rot):
        s = (-s if inverse else s) % rings.shape[-2]
        parts.append(jnp.roll(rings[i], s, axis=-2))
    return jnp.stack(parts, axis=0)


# --------------------------------------------------------------------------
# encoder step modules (mirror encoder.py param names)
# --------------------------------------------------------------------------

class RelPosAttentionStep(nn.Module):
    """RelPositionMultiHeadedAttention over [KV ring ++ current chunk].

    wenet 'rel_pos' flavor only: matrix_bd is key-indexed
    ((q+v)·linear_pos(pe[abs_key_pos])) so the projected position vector is
    cached per ring slot alongside k/v (attention.py:73-78).

    q/k/v run as ONE fused matmul (``linear_qkv``, see fuse_qkv_params)
    and the K/V ring is one feature-concatenated buffer (B, R, 2D) —
    ``ring_kv`` — written once per hop.  ``pos_bias_u/v`` keep the
    canonical names."""

    heads: int
    dim: int
    key_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 ring_kv: jnp.ndarray, ring_pk: jnp.ndarray,
                 mask: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, c, _ = x.shape
        h, dk = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="linear_qkv")(x)
        q = qkv[..., : self.dim]
        kv_c = qkv[..., self.dim:]                      # [k | v] merged
        pk_c = nn.Dense(self.dim, use_bias=False, name="linear_pos")(pos_emb)

        init = nn.initializers.xavier_uniform()
        pos_bias_u = self.param("pos_bias_u", init, (h, dk))
        pos_bias_v = self.param("pos_bias_v", init, (h, dk))

        kvs = jnp.concatenate([ring_kv.astype(kv_c.dtype), kv_c], axis=1)
        keys = kvs[..., : self.dim]
        vals = kvs[..., self.dim:]
        pks = jnp.concatenate([ring_pk.astype(pk_c.dtype), pk_c], axis=1)
        tk = keys.shape[1]

        q = q.reshape(b, c, h, dk)
        q_u = (q + pos_bias_u[None, None]).transpose(0, 2, 1, 3)
        q_v = (q + pos_bias_v[None, None]).transpose(0, 2, 1, 3)
        kt = keys.reshape(b, tk, h, dk).transpose(0, 2, 3, 1)
        pt = pks.reshape(pks.shape[0], tk, h, dk).transpose(0, 2, 3, 1)
        scores = (q_u @ kt + q_v @ pt) / jnp.sqrt(jnp.asarray(dk, x.dtype))
        attn = masked_softmax(scores, mask)
        out = attn @ vals.reshape(b, tk, h, dk).transpose(0, 2, 1, 3)
        out = out.transpose(0, 2, 1, 3).reshape(b, c, self.dim)
        return nn.Dense(self.dim, name="linear_out")(out), kv_c, pk_c


class ConformerLayerStep(nn.Module):
    """ConformerEncoderLayer (encoder.py:118-149) over a chunk + KV ring.
    cnn module unsupported in KV mode (production flow configs disable it)."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, pos_emb, ring_kv, ring_pk, mask):
        c = self.cfg
        assert not c.use_cnn_module, "KV streaming: cnn module unsupported"
        if c.macaron_style:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            x = x + 0.5 * FeedForward(c.linear_units, c.activation,
                                      c.dropout_rate, name="ff_macaron")(h)
        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        a, kv_c, pk_c = RelPosAttentionStep(
            c.attention_heads, c.output_size, c.key_bias,
            name="self_attn")(h, pos_emb, ring_kv, ring_pk, mask)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        ff_scale = 0.5 if c.macaron_style else 1.0
        x = x + ff_scale * FeedForward(c.linear_units, c.activation,
                                       c.dropout_rate, name="feed_forward")(h)
        return x, kv_c, pk_c


class PreLookaheadStep(nn.Module):
    """PreLookaheadLayer (encoder.py:49-70): conv1 consumes the chunk +
    lookahead context (kernel covers [t, t+la], no left state); conv2 is
    causal k3 with a 2-frame cache."""

    channels: int
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(self, x, context, cache):
        h = jnp.concatenate([x, context], axis=1)
        h = Conv1d(self.channels, self.pre_lookahead_len + 1,
                   name="conv1")(h)
        h = jax.nn.leaky_relu(h, 0.01)
        h = jnp.concatenate([cache.astype(h.dtype), h], axis=1)
        new_cache = h[:, -2:]
        h = Conv1d(self.channels, 3, name="conv2")(h)
        return h + x, new_cache


class Upsample1DStep(nn.Module):
    """Upsample1D (encoder.py:152-163): nearest x`stride` + left-pad conv,
    cache = last 2*stride post-repeat inputs."""

    channels: int
    stride: int

    @nn.compact
    def __call__(self, x, cache):
        x = jnp.repeat(x, self.stride, axis=1)
        xp = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
        new_cache = xp[:, -2 * self.stride:]
        return Conv1d(self.channels, 2 * self.stride + 1,
                      name="conv")(xp), new_cache


class UpsampleConformerEncoderStep(nn.Module):
    """One chunk through the UpsampleConformerEncoder with KV rings.

    cache keys: pre (B, 2, D) conv2 state; kv (Nb, B, Rt, 2D) merged K/V
    and pk (Nb, 1, Rt, D) token-rate rings; up_conv (B, 2*stride, D);
    ukv (Nu, B, Rm, 2D), upk (Nu, 1, Rm, D) mel-rate rings."""

    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray],
                 cache: Dict[str, jnp.ndarray], n_tok: jnp.ndarray,
                 pe_tok: jnp.ndarray, pe_mel: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        c = self.cfg
        assert c.pos_enc_layer_type == "rel_pos", \
            "KV streaming needs the key-indexed wenet rel_pos flavor"
        b, ct, _ = x.shape
        s = c.upsample_stride
        la = c.pre_lookahead_len
        embed = LinearEmbed(c.output_size, c.dropout_rate, name="embed")
        x = embed(x)
        if context is None:
            ctx = jnp.zeros((b, la, c.output_size), x.dtype)
        else:
            ctx = embed(context)

        pos = jax.lax.dynamic_slice(
            pe_tok, (n_tok, 0), (ct, pe_tok.shape[1]))[None].astype(x.dtype)

        x, new_pre = PreLookaheadStep(
            c.output_size, la, name="pre_lookahead_layer")(
                x, ctx, cache["pre"])

        rt = cache["kv"].shape[-2]
        mask = _ring_mask(rt, ct, n_tok)
        kvs, pks = [], []
        for i in range(c.num_blocks):
            x, kv_c, pk_c = ConformerLayerStep(
                c, name=f"encoders_{i}")(x, pos, cache["kv"][i],
                                         cache["pk"][i], mask)
            kvs.append(kv_c)
            pks.append(pk_c)
        new_kv = ring_write(cache["kv"], jnp.stack(kvs), n_tok)
        new_pk = ring_write(cache["pk"], jnp.stack(pks), n_tok)

        x, new_up_conv = Upsample1DStep(c.output_size, s, name="up_layer")(
            x, cache["up_conv"])

        cm = ct * s
        n_mel = n_tok * s
        x = LinearEmbed(c.output_size, c.dropout_rate, name="up_embed")(x)
        pos_up = jax.lax.dynamic_slice(
            pe_mel, (n_mel, 0), (cm, pe_mel.shape[1]))[None].astype(x.dtype)
        rm = cache["ukv"].shape[-2]
        mask_up = _ring_mask(rm, cm, n_mel)
        ukvs, upks = [], []
        for i in range(c.num_up_blocks):
            x, kv_c, pk_c = ConformerLayerStep(
                c, name=f"up_encoders_{i}")(x, pos_up, cache["ukv"][i],
                                            cache["upk"][i], mask_up)
            ukvs.append(kv_c)
            upks.append(pk_c)
        new_cache = {
            "pre": new_pre.astype(cache["pre"].dtype),
            "kv": new_kv, "pk": new_pk,
            "up_conv": new_up_conv.astype(cache["up_conv"].dtype),
            "ukv": ring_write(cache["ukv"], jnp.stack(ukvs), n_mel),
            "upk": ring_write(cache["upk"], jnp.stack(upks), n_mel),
        }
        x = nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)
        return x, new_cache


# --------------------------------------------------------------------------
# estimator step modules (mirror estimator.py param names)
# --------------------------------------------------------------------------

class CausalBlock1DStep(nn.Module):
    """CausalBlock1D (estimator.py:29-38) with an explicit conv cache."""

    dim_out: int

    @nn.compact
    def __call__(self, x, conv_cache):
        h, new_cache = CausalConv1d(self.dim_out, 3, name="conv")(
            x, conv_cache.astype(x.dtype))
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(h)
        return mish(h), new_cache


class CausalResnetBlock1DStep(nn.Module):
    """CausalResnetBlock1D (estimator.py:59-74), cached convs."""

    dim_out: int

    @nn.compact
    def __call__(self, x, t_emb, caches):
        h, c1 = CausalBlock1DStep(self.dim_out, name="block1")(
            x, caches["block1"])
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(t_emb))[:, None, :]
        h, c2 = CausalBlock1DStep(self.dim_out, name="block2")(
            h, caches["block2"])
        res = Conv1d(self.dim_out, 1, name="res_conv")(x)
        return h + res, {"block1": c1, "block2": c2}


class UNetAttentionStep(nn.Module):
    """UNetAttention (attention.py:89-129) over [KV ring ++ chunk].  No
    positional term -> key slots are order-free, rings are circular.

    q/k/v run as ONE fused matmul (``to_qkv``, see fuse_qkv_params) whose
    k/v halves are ALREADY the feature-concatenated chunk for the merged
    (B, R, 2*inner) ``ring_kv`` buffer — one ring write per layer instead
    of two, and half the while-carry leaves.

    Two dataflows, same math:
    - concat (``write=None``): keys/vals = [ring ++ chunk]; returns the
      merged chunk KV for the caller to write into the ring afterwards.
    - fused write-then-attend (``write`` dict): the chunk KV is written
      INTO the ring (capacity = left context + chunk) FIRST, then
      attention reads the ring directly.  This removes the per-layer
      (B, R+C, ·) concat materialization — measured 367 MB/iter of
      writes plus 367 MB/iter of XLA copies on the full-size wavefront
      (bin/analyze_wave_hlo.py) — and leaves the ring with the single
      DUS-update chain XLA aliases in place inside loop carries (the LLM
      KV-cache decode pattern).  Returns the UPDATED ring instead of the
      chunk KV.  Bit-exact vs concat when the ring dtype equals the
      compute dtype (all supported serving recipes keep them equal)."""

    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, ring_kv, mask, write=None):
        b, c, dim = x.shape
        inner = self.heads * self.head_dim
        qkv = nn.Dense(3 * inner, use_bias=False, name="to_qkv")(x)
        q = qkv[..., :inner]
        kv_c = qkv[..., inner:]                          # [k | v] merged
        if isinstance(ring_kv, dict):                    # int8 ring
            assert write is None, \
                "quantized rings support the concat dataflow only"
            kvs = jnp.concatenate(
                [dequantize_ring(ring_kv, kv_c.dtype), kv_c], axis=1)
            ret = kv_c
        elif write is None:
            kvs = jnp.concatenate([ring_kv.astype(kv_c.dtype), kv_c], axis=1)
            ret = kv_c
        elif write["mode"] == "dus":
            ret = ring_write_dus(ring_kv, kv_c, write["offset"],
                                 write["enable"], write["align"])
            kvs = ret.astype(kv_c.dtype)
        else:
            ret = ring_write_batched(ring_kv, kv_c, write["nd"],
                                     enable=write["enable"])
            kvs = ret.astype(kv_c.dtype)
        out = attend_stored(q, kvs, mask, self.heads, self.head_dim)
        return nn.Dense(dim, name="to_out")(out), ret


def attend_stored(q: jnp.ndarray, kvs: jnp.ndarray, mask: jnp.ndarray,
                  heads: int, head_dim: int) -> jnp.ndarray:
    """Layout-native attention: contract against the K/V ring IN ITS
    STORED (B, TK, 2*inner) layout and transpose only the SMALL
    tensors (q, attn, out).  The head-split reshape is free (heads
    live inside the lane dim); the head axis becomes a dot_general
    BATCH dim.  The textbook keys.transpose/vals.transpose form made
    XLA materialize a layout copy of BOTH 6.5 MB ring halves plus a
    k/v split fusion EVERY layer EVERY wavefront iteration —
    profiled at ~1.1 ms/iter of the 3.7 ms body (BENCH_NOTES round
    4); this form is bit-exact vs it (same contraction order).

    q (B, C, inner), kvs (B, TK, 2*inner) merged [k | v] along features,
    mask (B|1, 1, C, TK) bool -> (B, C, inner)."""
    b, c, inner = q.shape
    h, dk = heads, head_dim
    tk = kvs.shape[1]
    kv4 = kvs.reshape(b, tk, 2 * h, dk)
    keys4 = kv4[:, :, :h]                            # (B, TK, H, DK)
    vals4 = kv4[:, :, h:]
    q4 = q.reshape(b, c, h, dk)
    # scores_T[b,h,tk,c] = sum_dk keys4[b,tk,h,dk] * q4[b,c,h,dk]
    scores_t = jax.lax.dot_general(
        keys4, q4, dimension_numbers=(((3,), (3,)), ((0, 2), (0, 2))))
    scores_t = scores_t * (dk ** -0.5)
    mask_t = mask.swapaxes(-1, -2)                   # (B, 1, TK, C)
    scores_t = jnp.where(mask_t, scores_t, jnp.asarray(_NEG,
                                                       scores_t.dtype))
    attn_t = jax.nn.softmax(scores_t, axis=-2)
    attn_t = jnp.where(mask_t, attn_t, 0.0)
    # out[b,h,dk,c] = sum_tk vals4[b,tk,h,dk] * attn_t[b,h,tk,c]
    out = jax.lax.dot_general(
        vals4, attn_t, dimension_numbers=(((1,), (2,)), ((0, 2), (0, 1))))
    return out.transpose(0, 3, 1, 2).reshape(b, c, inner)


class TransformerBlockStep(nn.Module):
    """BasicTransformerBlock (estimator.py:77-100) with a KV ring."""

    dim: int
    num_heads: int
    head_dim: int
    act_fn: str = "gelu"
    ff_mult: int = 4

    @nn.compact
    def __call__(self, x, ring_kv, mask, write=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        a, kv_c = UNetAttentionStep(self.num_heads, self.head_dim,
                                    name="attn1")(h, ring_kv, mask, write)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        ff = nn.Dense(self.dim * self.ff_mult, name="ff_proj")(h)
        ff = get_activation(self.act_fn)(ff)
        x = x + nn.Dense(self.dim, name="ff_out")(ff)
        return x, kv_c


def estimator_conv_cache_names(cfg: EstimatorConfig):
    """Static walk order of the estimator's causal-conv caches."""
    names = [("down_res_0", "block1"), ("down_res_0", "block2"),
             ("down_conv_0", None)]
    for i in range(cfg.num_mid_blocks):
        names += [(f"mid_res_{i}", "block1"), (f"mid_res_{i}", "block2")]
    names += [("up_res_0", "block1"), ("up_res_0", "block2"),
              ("up_conv_0", None), ("final_block", None)]
    return names


class EstimatorStep(nn.Module):
    """One chunk through CausalConditionalDecoder (estimator.py:123-245) —
    single-level causal configs (the MOSS / CosyVoice2 production shapes).

    rings: {"kv": tuple of L (B2, Rf, 2*inner) merged K/V arrays} with L
    attention layers in walk order — one buffer per layer so XLA can
    alias each ring independently in loop carries (a stacked (L, ...)
    buffer forced per-layer strided slice copies); convs: {name:
    (B2, 2, ch_in)} keyed by ``estimator_conv_cache_names``.  Returns
    (out, chunk_kvs, new_convs) with chunk_kvs a tuple of L
    (B2, C, 2*inner) arrays — the CFM step owns the ring writes.

    ``write`` (fused write-then-attend, see UNetAttentionStep): rings
    arrive with capacity Rf = left context + chunk, each layer writes its
    chunk KV into its ring BEFORE attending, and the returned tuple is
    the UPDATED rings instead of the chunk KV."""

    cfg: EstimatorConfig

    @nn.compact
    def __call__(self, x, mu, t, spks, cond, rings, convs, n_done,
                 rot=None, write=None):
        c = self.cfg
        assert c.causal and len(c.channels) == 1, \
            "KV streaming supports the single-level causal U-Net"
        assert not c.use_flash_attention
        ch = c.channels[0]
        t_emb = SinusoidalPosEmb(c.in_channels, name="time_embeddings")(t)
        t_emb = TimestepEmbedding(ch * 4, name="time_mlp")(
            t_emb.astype(x.dtype))

        spks_b = jnp.broadcast_to(spks[:, None, :],
                                  (x.shape[0], x.shape[1], spks.shape[-1]))
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)
        cf = h.shape[1]
        rf = ring_leaf_len(rings["kv"][0])
        if write is None:
            mask = _ring_mask(rf, cf, n_done, rot)
        else:
            mask = _ring_mask(rf, cf, n_done + cf, rot, fused=True)

        new_convs = {}
        chunk_kvs = []
        li = 0

        def tf(h, name):
            nonlocal li
            h, kv_c = TransformerBlockStep(
                h.shape[-1], c.num_heads, c.attention_head_dim, c.act_fn,
                name=name)(h, rings["kv"][li], mask, write)
            chunk_kvs.append(kv_c)
            li += 1
            return h

        h, new_convs["down_res_0"] = CausalResnetBlock1DStep(
            ch, name="down_res_0")(h, t_emb, convs["down_res_0"])
        for j in range(c.n_blocks):
            h = tf(h, f"down_tf_0_{j}")
        skip = h
        h, new_convs["down_conv_0"] = CausalConv1d(
            ch, 3, name="down_conv_0")(
                h, convs["down_conv_0"].astype(h.dtype))

        for i in range(c.num_mid_blocks):
            h, new_convs[f"mid_res_{i}"] = CausalResnetBlock1DStep(
                ch, name=f"mid_res_{i}")(h, t_emb, convs[f"mid_res_{i}"])
            for j in range(c.n_blocks):
                h = tf(h, f"mid_tf_{i}_{j}")

        h = jnp.concatenate([h, skip], axis=-1)
        h, new_convs["up_res_0"] = CausalResnetBlock1DStep(
            ch, name="up_res_0")(h, t_emb, convs["up_res_0"])
        for j in range(c.n_blocks):
            h = tf(h, f"up_tf_0_{j}")
        h, new_convs["up_conv_0"] = CausalConv1d(
            ch, 3, name="up_conv_0")(h, convs["up_conv_0"].astype(h.dtype))

        h, new_convs["final_block"] = CausalBlock1DStep(
            ch, name="final_block")(h, convs["final_block"])
        out = Conv1d(c.out_channels, 1, name="final_proj")(h)
        return out, tuple(chunk_kvs), new_convs


class CausalConditionalCFMStep(nn.Module):
    """CFM Euler solve for one chunk (cfm.py:43-98), per-ODE-step KV rings.

    cache: {"kv": tuple of L (S, 2B, Rf, 2*inner) merged K/V arrays,
    "convs": {name: (S, 2B, 2, ch)}} — leading axis S = n_timesteps on
    every leaf, consumed/produced by the nn.scan."""

    cfg: CFMConfig
    estimator_cfg: EstimatorConfig

    def setup(self):
        self.estimator = EstimatorStep(self.estimator_cfg, name="estimator")

    def __call__(self, mu, spks, cond, cache, n_done,
                 temperature: float = 1.0):
        c = self.cfg
        b, cf, d = mu.shape
        sd = jnp.float32 if c.solver_dtype == "float32" else mu.dtype
        noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))
        z = jax.lax.dynamic_slice(noise, (0, n_done, 0), (1, cf, d))
        z = jnp.broadcast_to(z, (b, cf, d)).astype(sd) * temperature

        if c.t_scheduler == "cosine":
            t_span = t_span_cosine(c.n_timesteps)
        else:
            t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
        t_cur = jnp.asarray(t_span[:-1], sd)
        dts = jnp.asarray(np.diff(t_span), sd)

        mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

        def body(mdl, carry, xs):
            t_i, dt_i, kv_s, convs_s = xs
            cd = (jnp.dtype(mdl.cfg.estimator_dtype)
                  if mdl.cfg.estimator_dtype else mu_in.dtype)
            x_in = jnp.concatenate([carry, carry], axis=0).astype(cd)
            t_in = jnp.full((2 * b,), t_i, cd)
            dphi, ckv, new_convs = mdl.estimator(
                x_in, mu_in.astype(cd), t_in, spks_in.astype(cd),
                cond_in.astype(cd), {"kv": kv_s}, convs_s, n_done)
            dphi = dphi.astype(carry.dtype)
            rate = jnp.asarray(mdl.cfg.inference_cfg_rate, carry.dtype)
            dphi = (1.0 + rate) * dphi[:b] - rate * dphi[b:]
            new_kv = tuple(write_ring_leaf(ring_write, r_, c_, n_done)
                           for r_, c_ in zip(kv_s, ckv))
            new_convs = jax.tree.map(
                lambda old, new: new.astype(old.dtype), convs_s, new_convs)
            return carry + dt_i * dphi, (new_kv, new_convs)

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        x, (new_kv, new_convs) = scan(
            self, z, (t_cur, dts, cache["kv"], cache["convs"]))
        return x.astype(jnp.float32), {"kv": new_kv, "convs": new_convs}


# --------------------------------------------------------------------------
# flow-level step (mirrors flow.py param names)
# --------------------------------------------------------------------------

class KVFlowStep(nn.Module):
    """One streaming chunk: tokens (+lookahead context) -> mel, carrying the
    full KV cache.  Applied with the SAME params as CausalMaskedDiffWithXvec.

    cache = {"enc": encoder cache, "est": estimator cache,
             "n_tok": () i32 tokens consumed so far}."""

    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size,
                                               name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoderStep(c.encoder, name="encoder")
        self.encoder_proj = nn.Dense(c.output_size, name="encoder_proj")
        self.decoder = CausalConditionalCFMStep(c.cfm, c.estimator,
                                                name="decoder")

    def __call__(self, token_chunk: jnp.ndarray,
                 context: Optional[jnp.ndarray],
                 cond_chunk: jnp.ndarray, embedding: jnp.ndarray,
                 cache, pe_tok: jnp.ndarray, pe_mel: jnp.ndarray,
                 finalize: bool = False):
        """token_chunk (B, Ct) i32; context (B, la) i32 lookahead tokens
        (ignored when ``finalize``); cond_chunk (B, Ct*r, n_mel) — the
        prompt mel during prefill, zeros after; embedding (B, spk_dim).

        Returns (mel (B, Ct*r, n_mel) f32, new cache)."""
        c = self.cfg
        n_tok = cache["n_tok"]
        x = self.input_embedding(jnp.maximum(token_chunk, 0))
        ctx = None
        if not finalize:
            ctx = self.input_embedding(jnp.maximum(context, 0))
        h, enc_cache = self.encoder(x, ctx, cache["enc"], n_tok,
                                    pe_tok, pe_mel)
        mu = self.encoder_proj(h)

        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        spks = self.spk_embed_affine_layer(
            embedding / jnp.maximum(norm, 1e-12))

        r = c.token_mel_ratio
        mel, est_cache = self.decoder(mu, spks, cond_chunk.astype(mu.dtype),
                                      cache["est"], n_tok * r)
        new_cache = {"enc": enc_cache, "est": est_cache,
                     "n_tok": n_tok + token_chunk.shape[1]}
        return mel, new_cache


class KVFlowEncodeStep(nn.Module):
    """Encoder half of a KV hop: tokens (+context) -> mu chunk.  Same param
    names as CausalMaskedDiffWithXvec (flow.py) — used by the wavefront
    session, which runs the encoder per hop but pipelines the ODE."""

    cfg: FlowConfig

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size,
                                               name="spk_embed_affine_layer")
        self.encoder = UpsampleConformerEncoderStep(c.encoder, name="encoder")
        self.encoder_proj = nn.Dense(c.output_size, name="encoder_proj")

    def spk(self, embedding: jnp.ndarray) -> jnp.ndarray:
        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        return self.spk_embed_affine_layer(
            embedding / jnp.maximum(norm, 1e-12))

    def __call__(self, token_chunk, context, enc_cache, n_tok,
                 pe_tok, pe_mel, finalize: bool = False):
        x = self.input_embedding(jnp.maximum(token_chunk, 0))
        ctx = None
        if not finalize:
            ctx = self.input_embedding(jnp.maximum(context, 0))
        h, enc_cache = self.encoder(x, ctx, enc_cache, n_tok,
                                    pe_tok, pe_mel)
        return self.encoder_proj(h), enc_cache


class CausalConditionalCFMWave(nn.Module):
    """ONE wavefront iteration of the pipelined ODE.

    The per-hop KV step (CausalConditionalCFMStep) runs the 10 Euler steps
    sequentially on a 20-frame chunk — thousands of tiny ops, overhead-
    bound on TPU (~10 ms/hop measured).  The wavefront keeps S chunks in
    flight, chunk h at ODE step s with h+s = iteration index, so ALL steps
    batch into one estimator forward (batch = S x CFG): identical math,
    ~S x fewer op dispatches, MXU-sized matmuls.

    Correctness invariant: chunk h at step s+1 needs ring[s+1] to contain
    chunks <= h-1 at step s+1; chunk h-1 wrote that at the previous
    iteration (h-1 + (s+1) = h+s).  Slots outside the valid range (ramp-up
    / drain) compute garbage but their ring/conv writes are masked out.

    est cache layout matches CausalConditionalCFMStep exactly, so prefill
    and the finalize tail can run through the sequential step with the
    same state."""

    cfg: CFMConfig
    estimator_cfg: EstimatorConfig
    # "dus": shared-offset in-place ring writes under per-slot rotated
    # slot numbering (O(chunk) traffic; requires ring % chunk == 0 and
    # rings rotated at wavefront entry, see rotate_rings).  "onehot":
    # position-free RMW (works for any geometry; O(ring) traffic).
    write_mode: str = "onehot"
    align: int = 0                      # (prompt_frames % chunk_frames)
    # fused write-then-attend: rings arrive EXTENDED to capacity
    # (left context + chunk) and each estimator layer writes its chunk
    # K/V into its ring before attending (no [ring ++ chunk] concat —
    # see UNetAttentionStep).  Requires extend_rings_for_fused at
    # wavefront entry / shrink_rings_from_fused at exit.
    fused: bool = False

    def setup(self):
        self.estimator = EstimatorStep(self.estimator_cfg, name="estimator")

    def __call__(self, x_wave, mu_wave, mu_new, spks, est_cache, w,
                 k_total, base_frames):
        """x_wave/mu_wave: (S, B, Cf, n_mel) — slot s holds the chunk that
        has completed s Euler steps; mu_new (B, Cf, n_mel): the encoder
        output of chunk w, entering slot 0 this iteration; spks (B, n_mel);
        est_cache as in init_kv_cache; w: () iteration index; k_total: ()
        number of steady chunks this stream; base_frames: () frames before
        chunk 0.

        Returns (exit_mel (B, Cf, n_mel) f32 — valid when
        S-1 <= w < S-1+k_total —, x_shifted, mu_shifted, new est cache)."""
        c = self.cfg
        s_steps, b, cf, d = x_wave.shape
        # estimator compute dtype: the config override (hybrid bf16-encoder/
        # f32-estimator recipe) wins; mu_wave arrives in this dtype from
        # kv_session (the carry dtype must be scan-stable)
        cd = (jnp.dtype(c.estimator_dtype) if c.estimator_dtype
              else mu_wave.dtype)
        mu_wave = jnp.concatenate(
            [mu_new[None].astype(cd), mu_wave[:-1].astype(cd)], axis=0)
        if c.t_scheduler == "cosine":
            t_span = t_span_cosine(c.n_timesteps)
        else:
            t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
        # solver-dtype island: x_wave may be f32 while the estimator runs cd
        t_cur = jnp.asarray(t_span[:-1], x_wave.dtype)       # (S,)
        dts = jnp.asarray(np.diff(t_span), x_wave.dtype)

        h_idx = w - jnp.arange(s_steps)                      # chunk per slot
        valid = (h_idx >= 0) & (h_idx < k_total)             # (S,)
        n_dones = base_frames + jnp.maximum(h_idx, 0) * cf   # (S,)

        # CFG doubling per slot -> flat batch (S*2b)
        def flat(a):                                         # (S,B,C,D)
            a2 = jnp.stack([a, jnp.zeros_like(a)], axis=1)   # (S,2,B,C,D)
            return a2.reshape(s_steps * 2 * b, cf, d)

        mu_in = flat(mu_wave)
        cond_in = jnp.zeros_like(mu_in)
        x_in = jnp.stack([x_wave, x_wave], axis=1).reshape(
            s_steps * 2 * b, cf, d).astype(cd)
        spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        spks_in = jnp.tile(spks_in, (s_steps, 1)).astype(cd)
        t_in = jnp.repeat(t_cur, 2 * b).astype(cd)
        nd_in = jnp.repeat(n_dones, 2 * b)

        # est_cache arrives in the FLAT wavefront layout ({"kv": tuple
        # of L (S*2B, R, 2d) arrays, "convs": {name: (S*2B, 2, ch)}}, see
        # est_cache_to_flat).  Per-layer buffers: a stacked (L, ...)
        # carry forced XLA into a strided 2.9 MB copy per layer per
        # iteration (~320 MB/iter in the optimized TPU HLO); separate
        # leaves slice nothing and alias in place across the scan.
        flat_rings = {"kv": est_cache["kv"]}
        flat_convs = est_cache["convs"]
        r = ring_leaf_len(flat_rings["kv"][0])
        rot = None
        if self.write_mode == "dus":
            rot_slots = np.array([(s * cf) % r for s in range(s_steps)],
                                 np.int32)
            rot = jnp.asarray(np.repeat(rot_slots, 2 * b))

        en = jnp.repeat(valid, 2 * b)
        write = None
        if self.fused:
            if self.write_mode == "dus":
                write = {"mode": "dus",
                         "offset": (base_frames + w * cf) % r,
                         "align": self.align, "enable": en}
            else:
                write = {"mode": "onehot", "nd": nd_in, "enable": en}

        dphi, ckv, new_convs = self.estimator(
            x_in, mu_in, t_in, spks_in, cond_in, flat_rings, flat_convs,
            nd_in, rot, write)

        rate = jnp.asarray(c.inference_cfg_rate, x_wave.dtype)
        dphi = dphi.reshape(s_steps, 2, b, cf, d).astype(x_wave.dtype)
        dphi = (1.0 + rate) * dphi[:, 0] - rate * dphi[:, 1]
        x_next = x_wave + dts[:, None, None, None] * dphi    # (S,B,C,D)

        # masked ring/conv writes (fused mode: the estimator already
        # wrote the rings layer by layer — ckv ARE the updated rings)
        if self.fused:
            new_kv = ckv
        elif self.write_mode == "dus":
            # every slot's rotated write offset coincides at
            # (base + w*cf) % r — one static-size in-place DUS per layer
            offset = (base_frames + w * cf) % r
            new_kv = tuple(ring_write_dus(r_, c_, offset, en, self.align)
                           for r_, c_ in zip(flat_rings["kv"], ckv))
        else:
            new_kv = tuple(
                write_ring_leaf(ring_write_batched, r_, c_, nd_in,
                                enable=en)
                for r_, c_ in zip(flat_rings["kv"], ckv))
        new_convs = jax.tree.map(
            lambda old, new: jnp.where(en[:, None, None],
                                       new.astype(old.dtype), old),
            flat_convs, new_convs)

        # slot shift: exiting chunk leaves slot S-1; a fresh chunk enters
        # slot 0 with its deterministic noise
        exit_mel = x_next[-1].astype(jnp.float32)
        n_enter = base_frames + jnp.clip(w + 1, 0, None) * cf
        noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))
        z = jax.lax.dynamic_slice(
            noise, (0, jnp.minimum(n_enter, noise.shape[1] - cf), 0),
            (1, cf, d))
        z = jnp.broadcast_to(z, (b, cf, d)).astype(x_wave.dtype)
        x_shift = jnp.concatenate([z[None], x_next[:-1]], axis=0)
        return exit_mel, x_shift, mu_wave, {"kv": new_kv,
                                            "convs": new_convs}


class CausalConditionalCFMWaveLanes(nn.Module):
    """Per-lane (continuous-batching) variant of CausalConditionalCFMWave.

    CausalConditionalCFMWave advances ONE stream: iteration w holds chunk
    w-s at ODE slot s for every batch row (lockstep).  Here each LANE is an
    independent stream at its own position: lane l has entered ``w[l]``
    chunks, advances only while ``w[l] < avail_iters[l]`` (new encoder
    chunks available, or drain after finish), and stalls frozen otherwise
    (rings unwritten, x/mu unshifted, counter unmoved).  Because the
    estimator's attention has no positional term and every flat batch row
    (s, cfg, lane) attends only within its own ring rows, lanes at
    arbitrary positions batch into ONE estimator forward — the audio
    analogue of continuous LLM batching (serving/lm_server.py).

    Geometry per call:
      x_wave/mu_wave (S, lanes, Cf, d); mu_buf (lanes, cap, Cf, d) device-
      resident encoder outputs, chunk w of lane l at mu_buf[l, w % cap];
      w/avail_iters/k_total/base_frames (lanes,) i32.  est cache in the
      flat per-layer layout, rows ordered (s, cfg, lane).  Ring writes are
      one-hot RMW only (per-lane offsets never coincide, so the shared-
      offset DUS scheme does not apply).

    ``fused``: write-then-attend dataflow (see UNetAttentionStep) — rings
    arrive EXTENDED to capacity (ring + chunk, canonical slot numbering
    frame f -> slot f % rp) and each estimator layer one-hot-writes its
    chunk K/V into its ring BEFORE attending; stalled/invalid rows keep
    their rings untouched via the enable mask.  Admission must extend a
    lane's canonical rings (extend_rings_for_fused, rot=0) and the
    finalize slice-out must shrink them back (shrink_rings_from_fused).

    Returns (exit_mel (lanes, Cf, d) f32, exit_valid (lanes,) bool,
    x_shift, mu_shift, new est cache, w+advance)."""

    cfg: CFMConfig
    estimator_cfg: EstimatorConfig
    fused: bool = False

    def setup(self):
        self.estimator = EstimatorStep(self.estimator_cfg, name="estimator")

    def __call__(self, x_wave, mu_wave, mu_buf, spks, est_cache, w,
                 avail_iters, k_total, base_frames):
        c = self.cfg
        s_steps, lanes, cf, d = x_wave.shape
        cap = mu_buf.shape[1]
        cd = (jnp.dtype(c.estimator_dtype) if c.estimator_dtype
              else mu_wave.dtype)

        advance = w < avail_iters                            # (lanes,)
        mu_new = mu_buf[jnp.arange(lanes), jnp.clip(w, 0, None) % cap]
        mu_wave = jnp.where(
            advance[None, :, None, None],
            jnp.concatenate([mu_new[None].astype(cd),
                             mu_wave[:-1].astype(cd)], axis=0),
            mu_wave.astype(cd))

        if c.t_scheduler == "cosine":
            t_span = t_span_cosine(c.n_timesteps)
        else:
            t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
        t_cur = jnp.asarray(t_span[:-1], x_wave.dtype)       # (S,)
        dts = jnp.asarray(np.diff(t_span), x_wave.dtype)

        h_idx = w[None, :] - jnp.arange(s_steps)[:, None]    # (S, lanes)
        valid = (h_idx >= 0) & (h_idx < k_total[None, :]) & advance[None, :]
        n_dones = base_frames[None, :] + jnp.maximum(h_idx, 0) * cf

        def flat(a):                                         # (S,lanes,C,D)
            a2 = jnp.stack([a, jnp.zeros_like(a)], axis=1)   # (S,2,lanes,..)
            return a2.reshape(s_steps * 2 * lanes, cf, d)

        mu_in = flat(mu_wave)
        cond_in = jnp.zeros_like(mu_in)
        x_in = jnp.stack([x_wave, x_wave], axis=1).reshape(
            s_steps * 2 * lanes, cf, d).astype(cd)
        spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        spks_in = jnp.tile(spks_in, (s_steps, 1)).astype(cd)
        t_in = jnp.repeat(t_cur, 2 * lanes).astype(cd)
        nd_in = jnp.tile(n_dones[:, None, :], (1, 2, 1)).reshape(-1)

        flat_rings = {"kv": est_cache["kv"]}
        flat_convs = est_cache["convs"]

        en = jnp.tile(valid[:, None, :], (1, 2, 1)).reshape(-1)
        write = ({"mode": "onehot", "nd": nd_in, "enable": en}
                 if self.fused else None)

        dphi, ckv, new_convs = self.estimator(
            x_in, mu_in, t_in, spks_in, cond_in, flat_rings, flat_convs,
            nd_in, write=write)

        rate = jnp.asarray(c.inference_cfg_rate, x_wave.dtype)
        dphi = dphi.reshape(s_steps, 2, lanes, cf, d).astype(x_wave.dtype)
        dphi = (1.0 + rate) * dphi[:, 0] - rate * dphi[:, 1]
        x_next = x_wave + dts[:, None, None, None] * dphi    # (S,lanes,C,D)

        if self.fused:
            new_kv = ckv         # the estimator already wrote the rings
        else:
            new_kv = tuple(
                write_ring_leaf(ring_write_batched, r_, c_, nd_in,
                                enable=en)
                for r_, c_ in zip(flat_rings["kv"], ckv))
        new_convs = jax.tree.map(
            lambda old, new: jnp.where(en[:, None, None],
                                       new.astype(old.dtype), old),
            flat_convs, new_convs)

        exit_mel = x_next[-1].astype(jnp.float32)            # (lanes, C, D)
        exit_valid = valid[-1]                               # (lanes,)

        # fresh noise chunk enters slot 0 next tick (per-lane offset)
        noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))[0]
        n_enter = base_frames + jnp.clip(w + 1, 0, None) * cf
        n_enter = jnp.minimum(n_enter, noise.shape[0] - cf)
        z = jax.vmap(lambda off: jax.lax.dynamic_slice(
            noise, (off, 0), (cf, d)))(n_enter).astype(x_wave.dtype)
        x_shift = jnp.where(
            advance[None, :, None, None],
            jnp.concatenate([z[None], x_next[:-1]], axis=0), x_wave)
        return (exit_mel, exit_valid, x_shift, mu_wave,
                {"kv": new_kv, "convs": new_convs},
                w + advance.astype(w.dtype))


class KVLaneWaveStep(nn.Module):
    """Param-tree wrapper: CausalConditionalCFMWaveLanes under
    ``decoder/estimator`` (same params as the full flow module)."""

    cfg: FlowConfig
    fused: bool = False

    def setup(self):
        self.decoder = CausalConditionalCFMWaveLanes(
            self.cfg.cfm, self.cfg.estimator, fused=self.fused,
            name="decoder")

    def __call__(self, *args, **kwargs):
        return self.decoder(*args, **kwargs)


def est_cache_to_flat(est: Dict) -> Dict:
    """Canonical est cache {"kv": tuple of L (S, B2, R, 2d) arrays,
    "convs": {name: (S, B2, 2, ch)}} -> the wavefront's flat layout
    {"kv": tuple of L (S*B2, R, 2d) arrays, "convs":
    {name: (S*B2, 2, ch)}}.

    With per-layer buffers this is a pure reshape on every leaf (row
    order s*B2 + b, matching the wavefront's CFG-doubled flat batch) —
    no transpose traffic at all."""
    def ring(a):
        return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])
    convs = jax.tree.map(ring, est["convs"])
    return {"kv": tuple(jax.tree.map(ring, a) for a in est["kv"]),
            "convs": convs}


def _fused_regather(est: Dict, slots_out: int, idx, ok) -> Dict:
    """Shared gather core of extend/shrink: per-row re-modulo of ring
    contents.  idx (rows, slots_out) i32 source slots, ok bool validity
    (invalid -> zeros).  conv caches pass through unchanged.

    Implemented as a {0,1} one-hot matmul shared across all L layers —
    TPU gathers with computed indices serialize (measured ~20 ms per
    full-size ring leaf, x224 leaves = seconds per stream), while the
    one-hot contraction rides the MXU and is bit-exact (each output row
    has at most one contribution)."""
    r_in = est["kv"][0].shape[-2]
    perm = jax.nn.one_hot(idx, r_in, dtype=jnp.bfloat16)  # (rows, out, in)
    perm = perm * ok[..., None].astype(perm.dtype)

    def go(a):
        return jnp.einsum("bor,brd->bod", perm.astype(a.dtype), a)

    return {"kv": tuple(go(a) for a in est["kv"]),
            "convs": est["convs"]}


def extend_rings_for_fused(est_flat: Dict, n_frames, cf: int,
                           rot) -> Dict:
    """Canonical-flat est cache ({"kv": tuple of L (rows, R, 2d)}) ->
    the fused write-then-attend layout: capacity R + cf, per-row rotated
    slot numbering (frame f at slot (f + rot[row]) % (R + cf)).  Content-
    aware: the last min(n_frames, R) frames are re-moduloed from the
    canonical rings (slot f % R); everything else zeros.  ``n_frames``
    (may be traced) is the number of frames written so far (wavefront
    entry = prompt frames); ``rot`` a (rows,) array/list.  One-time
    gather per stream."""
    r = est_flat["kv"][0].shape[-2]
    rp = r + cf
    rows = est_flat["kv"][0].shape[0]
    n = jnp.asarray(n_frames, jnp.int32)
    rot = jnp.broadcast_to(jnp.asarray(rot, jnp.int32), (rows,))
    sp = jnp.arange(rp, dtype=jnp.int32)[None, :]            # dest slots
    # frame at dest slot sp: largest f < n with (f + rot) == sp (mod rp)
    f = (n - 1) - ((n - 1 - (sp - rot[:, None])) % rp)       # (rows, rp)
    ok = f >= jnp.maximum(n - r, 0)
    idx = jnp.where(ok, f % r, 0)
    return _fused_regather(est_flat, rp, idx, ok)


def shrink_rings_from_fused(est_ext: Dict, n_frames, cf: int,
                            rot) -> Dict:
    """Inverse of extend_rings_for_fused at wavefront exit: the last
    min(n_frames, R) frames (``n_frames`` = total frames written, may be
    traced) move back to canonical-flat capacity-R slots (frame f at
    slot f % R) for the sequential finalize/prefill paths."""
    rp = est_ext["kv"][0].shape[-2]
    r = rp - cf
    rows = est_ext["kv"][0].shape[0]
    n = jnp.asarray(n_frames, jnp.int32)
    rot = jnp.broadcast_to(jnp.asarray(rot, jnp.int32), (rows,))
    s = jnp.arange(r, dtype=jnp.int32)[None, :]              # dest slots
    f = (n - 1) - ((n - 1 - s) % r)                          # (rows, r)
    ok = f >= jnp.maximum(n - r, 0)
    idx = jnp.where(ok, (f + rot[:, None]) % rp, 0)
    return _fused_regather(est_ext, r, idx, ok)


def est_cache_from_flat(flat: Dict, s_steps: int) -> Dict:
    """Inverse of est_cache_to_flat (wavefront exit -> canonical layout
    for the sequential prefill/finalize paths)."""
    def ring(a):
        return a.reshape((s_steps, a.shape[0] // s_steps) + a.shape[1:])
    convs = jax.tree.map(ring, flat["convs"])
    return {"kv": tuple(jax.tree.map(ring, a) for a in flat["kv"]),
            "convs": convs}


class KVFlowWaveStep(nn.Module):
    """Param-tree wrapper so CausalConditionalCFMWave sits under
    ``decoder/estimator`` like the full flow module."""

    cfg: FlowConfig
    write_mode: str = "onehot"
    align: int = 0
    fused: bool = False

    def setup(self):
        self.decoder = CausalConditionalCFMWave(self.cfg.cfm,
                                                self.cfg.estimator,
                                                write_mode=self.write_mode,
                                                align=self.align,
                                                fused=self.fused,
                                                name="decoder")

    def __call__(self, *args, **kwargs):
        return self.decoder(*args, **kwargs)


def init_kv_cache(cfg: FlowConfig, ring_tokens: int, batch: int = 1,
                  dtype=jnp.float32, est_dtype=None,
                  est_quant: bool = False):
    """Zero KV cache pytree for a ``ring_tokens``-token left context.

    ``est_dtype`` overrides the estimator rings'/conv caches' dtype (the
    estimator-f32 serving recipe keeps its KV exact while the encoder
    side stays bf16).  ``est_quant`` stores the estimator K/V rings as
    per-frame int8 + f32 scales (quantize_ring_chunk) — the HBM
    mitigation for big-ring quality serving; concat dataflow only."""
    e = cfg.encoder
    s = e.upsample_stride
    d = e.output_size
    rt = ring_tokens
    rm = ring_tokens * s
    enc = {
        "pre": jnp.zeros((batch, 2, d), dtype),
        "kv": jnp.zeros((e.num_blocks, batch, rt, 2 * d), dtype),
        "pk": jnp.zeros((e.num_blocks, 1, rt, d), dtype),
        "up_conv": jnp.zeros((batch, 2 * s, d), dtype),
        "ukv": jnp.zeros((e.num_up_blocks, batch, rm, 2 * d), dtype),
        "upk": jnp.zeros((e.num_up_blocks, 1, rm, d), dtype),
    }
    est_cfg = cfg.estimator
    if est_dtype is not None:
        dtype = est_dtype
    ch = est_cfg.channels[0]
    inner = est_cfg.num_heads * est_cfg.attention_head_dim
    n_attn = est_cfg.n_blocks * (2 + est_cfg.num_mid_blocks)
    steps = cfg.cfm.n_timesteps
    b2 = 2 * batch
    rf = ring_tokens * cfg.token_mel_ratio
    convs = {}
    for name, sub in estimator_conv_cache_names(est_cfg):
        cin = ch
        if name == "down_res_0" and sub == "block1":
            cin = est_cfg.in_channels
        elif name == "up_res_0" and sub == "block1":
            cin = 2 * ch
        arr = jnp.zeros((steps, b2, 2, cin), dtype)
        if sub is None:
            convs[name] = arr
        else:
            convs.setdefault(name, {})[sub] = arr
    if est_quant:
        kv = tuple({"v": jnp.zeros((steps, b2, rf, 2 * inner), jnp.int8),
                    "s": jnp.zeros((steps, b2, rf, 1), jnp.float32)}
                   for _ in range(n_attn))
    else:
        kv = tuple(jnp.zeros((steps, b2, rf, 2 * inner), dtype)
                   for _ in range(n_attn))
    est = {"kv": kv, "convs": convs}
    return {"enc": enc, "est": est, "n_tok": jnp.zeros((), jnp.int32)}


def est_cache_bytes(est) -> int:
    """HBM bytes of an est cache pytree (rings + conv caches + scales) —
    the admission-budget unit for serving/audio_batcher.py's spill
    policy and the max-batch table in BENCH_NOTES."""
    return sum(int(leaf.size) * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(est))


def pe_tables(cfg: FlowConfig, max_tokens: int):
    """(pe_tok (max_tokens, D), pe_mel (max_tokens*stride, D)) — uploaded
    once per session and sliced on device (wenet 'rel_pos' tables)."""
    d = cfg.encoder.output_size
    s = cfg.encoder.upsample_stride
    return (jnp.asarray(_abs_pe_table(d, max_tokens)),
            jnp.asarray(_abs_pe_table(d, max_tokens * s)))


# --------------------------------------------------------------------------
# stacked-layer wavefront: collapse the homogeneous estimator layers into
# lax.scans over stacked parameter leaves
# --------------------------------------------------------------------------
#
# The wavefront scan body is op-dispatch-bound (~2000 small HLO ops/iter
# across 56 tiny 256-channel transformer layers at ~2.7 us/op — BENCH_NOTES
# rounds 3-4; MFU 1.2%, i.e. the wall is dispatch, not FLOPs).  The layers
# within each U-Net group are HOMOGENEOUS (same shapes, different weights):
# down = n_blocks transformer blocks, mid = num_mid_blocks x (resnet +
# n_blocks transformers), up = n_blocks transformers — the role of the hot
# loop in the reference's flow/decoder.py:294-494.  Stacking each group's
# parameters on a leading axis and running ONE lax.scan per group replaces
# O(layers) dispatched ops with O(1) compiled loop bodies.
#
# Ring buffers: the group's rings live in ONE stacked (L, rows, Rf, 2d)
# buffer threaded through the scan as a CARRY.  Writes stay O(chunk): the
# fused write-then-attend DUS write is composed DIRECTLY on the stacked
# buffer at a dynamic (layer, 0, offset, 0) start (_ring_put_at) — the
# classic LLM KV-cache decode pattern XLA aliases in place — instead of
# slicing the slab out and writing it back (which would be an O(ring) copy
# per layer).  Attention then reads the layer's slab after the write.
#
# Scope: the fused write-then-attend + shared-offset DUS configuration
# (the production serving geometry: ring % chunk == 0).  Math is
# IDENTICAL to EstimatorStep/CausalConditionalCFMWave — the same flax
# modules are applied per layer with parameters sliced from the stacked
# leaves, so exactness vs the unstacked wavefront is pinned bit-for-bit
# in tests/test_kv_stream.py.


def stack_estimator_params(fp: Dict, cfg: EstimatorConfig) -> Dict:
    """Stacked-leaf estimator param tree for estimator_step_stacked.

    ``fp``: the (qkv-fused) full flow param dict.  The homogeneous
    transformer layers are stacked — down/up tf: (n_blocks, ...), mid
    resnets: (m, ...), mid tf: (m, n_blocks, ...) — while every other
    leaf stays SHARED with ``fp`` (no copy).  The stacked tf leaves are
    a one-time device-side duplication (~the estimator's attention/FF
    weights); the per-layer tree remains the canonical source for the
    sequential prefill/finalize paths."""
    est = fp["params"]["decoder"]["estimator"]
    n, m = cfg.n_blocks, cfg.num_mid_blocks

    def stk(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    sp = {k: est[k] for k in ("time_mlp", "down_res_0", "down_conv_0",
                              "up_res_0", "up_conv_0", "final_block",
                              "final_proj")}
    sp["down_tf"] = stk([est[f"down_tf_0_{j}"] for j in range(n)])
    sp["up_tf"] = stk([est[f"up_tf_0_{j}"] for j in range(n)])
    sp["mid_res"] = stk([est[f"mid_res_{i}"] for i in range(m)])
    sp["mid_tf"] = stk([stk([est[f"mid_tf_{i}_{j}"] for j in range(n)])
                        for i in range(m)])
    return sp


def stack_est_flat(est_flat: Dict, cfg: EstimatorConfig) -> Dict:
    """Fused-flat est cache ({"kv": tuple of 2n + m*n (rows, Rf, 2d)})
    -> the stacked-scan layout: kv {"down": (n, rows, Rf, 2d), "mid":
    (m, n, rows, Rf, 2d), "up": (n, ...)}; the m mid resnet conv caches
    stacked under one "mid_res" key.  One-time per wavefront entry."""
    n, m = cfg.n_blocks, cfg.num_mid_blocks
    kv = est_flat["kv"]
    down = jnp.stack(kv[:n])
    mid = jnp.stack([jnp.stack(kv[n + i * n: n + (i + 1) * n])
                     for i in range(m)])
    up = jnp.stack(kv[n + m * n:])
    convs = dict(est_flat["convs"])
    mids = [convs.pop(f"mid_res_{i}") for i in range(m)]
    convs["mid_res"] = {k2: jnp.stack([md[k2] for md in mids])
                        for k2 in ("block1", "block2")}
    return {"kv": {"down": down, "mid": mid, "up": up}, "convs": convs}


def unstack_est_flat(est_s: Dict, cfg: EstimatorConfig) -> Dict:
    """Inverse of stack_est_flat (wavefront exit -> fused-flat layout)."""
    n, m = cfg.n_blocks, cfg.num_mid_blocks
    kv_s = est_s["kv"]
    kv = ([kv_s["down"][j] for j in range(n)]
          + [kv_s["mid"][i, j] for i in range(m) for j in range(n)]
          + [kv_s["up"][j] for j in range(n)])
    convs = dict(est_s["convs"])
    mid_res = convs.pop("mid_res")
    for i in range(m):
        convs[f"mid_res_{i}"] = {k2: mid_res[k2][i]
                                 for k2 in ("block1", "block2")}
    return {"kv": tuple(kv), "convs": convs}


def _ring_put_at(rings: jnp.ndarray, chunk: jnp.ndarray, lead,
                 offset, enable: jnp.ndarray, align: int) -> jnp.ndarray:
    """ring_write_dus semantics composed directly on a STACKED ring
    buffer: write ``chunk`` (rows, C, d) into ``rings[lead]`` at the
    shared dynamic ``offset`` along the ring axis, touching only chunk
    bytes (dynamic_update_slice at a dynamic leading index — no slab
    slice-out/write-back copy).  Same preconditions as ring_write_dus."""
    b, cl, dd = chunk.shape
    r = rings.shape[-2]
    en = enable[:, None, None]
    nl = len(lead)

    def put(rings, part, off):
        starts = tuple(lead) + (0, off, 0)
        sizes = (1,) * nl + (b, part.shape[-2], dd)
        old = jax.lax.dynamic_slice(rings, starts, sizes)
        new = jnp.where(en, part.astype(rings.dtype),
                        old.reshape(b, part.shape[-2], dd))
        return jax.lax.dynamic_update_slice(rings, new.reshape(sizes),
                                            starts)

    m1 = cl - align
    rings = put(rings, chunk[..., :m1, :], offset)
    if align:
        rings = put(rings, chunk[..., m1:, :], (offset + m1) % r)
    return rings


def _tf_block_stacked(p: Dict, x, rings, lead, mask, offset, enable,
                      align: int, heads: int, head_dim: int, act: str):
    """TransformerBlockStep's exact math with parameters ``p`` sliced
    from the stacked leaves and the fused DUS write-then-attend composed
    on the stacked ring buffer at leading index ``lead``."""
    dim = x.shape[-1]
    inner = heads * head_dim
    h = nn.LayerNorm(epsilon=1e-5).apply({"params": p["norm1"]}, x)
    qkv = nn.Dense(3 * inner, use_bias=False).apply(
        {"params": p["attn1"]["to_qkv"]}, h)
    q = qkv[..., :inner]
    kv_c = qkv[..., inner:]                              # [k | v] merged
    rings = _ring_put_at(rings, kv_c, lead, offset, enable, align)
    b2, rf, d2 = rings.shape[-3:]
    slab = jax.lax.dynamic_slice(
        rings, tuple(lead) + (0, 0, 0),
        (1,) * len(lead) + (b2, rf, d2)).reshape(b2, rf, d2)
    a = attend_stored(q, slab.astype(kv_c.dtype), mask, heads, head_dim)
    x = x + nn.Dense(dim).apply({"params": p["attn1"]["to_out"]}, a)
    h = nn.LayerNorm(epsilon=1e-5).apply({"params": p["norm3"]}, x)
    ff = nn.Dense(dim * 4).apply({"params": p["ff_proj"]}, h)
    ff = get_activation(act)(ff)
    x = x + nn.Dense(dim).apply({"params": p["ff_out"]}, ff)
    return x, rings


def _tf_scan(tf_p: Dict, x, rings, mask, offset, enable, align: int,
             heads: int, head_dim: int, act: str):
    """One lax.scan over a stacked group of transformer blocks; the
    group's rings are ONE stacked carry updated in place."""
    ll = rings.shape[0]

    def body(carry, xs):
        x, rings = carry
        p, l = xs
        x, rings = _tf_block_stacked(p, x, rings, (l,), mask, offset,
                                     enable, align, heads, head_dim, act)
        return (x, rings), None

    (x, rings), _ = jax.lax.scan(
        body, (x, rings), (tf_p, jnp.arange(ll, dtype=jnp.int32)))
    return x, rings


def estimator_step_stacked(sp: Dict, c: EstimatorConfig, x, mu, t, spks,
                           cond, kv_s: Dict, convs: Dict, n_done, rot,
                           offset, enable, align: int):
    """EstimatorStep's exact math (single-level causal U-Net,
    estimator.py:123-245) with the three homogeneous transformer groups
    collapsed into lax.scans over stacked parameter leaves — fused
    write-then-attend, shared-offset DUS writes only."""
    assert c.causal and len(c.channels) == 1
    assert not c.use_flash_attention
    ch = c.channels[0]
    heads, hd, act = c.num_heads, c.attention_head_dim, c.act_fn
    t_emb = SinusoidalPosEmb(c.in_channels).apply({}, t)
    t_emb = TimestepEmbedding(ch * 4).apply({"params": sp["time_mlp"]},
                                            t_emb.astype(x.dtype))
    spks_b = jnp.broadcast_to(spks[:, None, :],
                              (x.shape[0], x.shape[1], spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)
    cf = h.shape[1]
    rf = kv_s["down"].shape[-2]
    mask = _ring_mask(rf, cf, n_done + cf, rot, fused=True)

    res = CausalResnetBlock1DStep(ch)
    cc3 = CausalConv1d(ch, 3)

    new_convs = {}
    h, new_convs["down_res_0"] = res.apply(
        {"params": sp["down_res_0"]}, h, t_emb, convs["down_res_0"])
    h, kv_down = _tf_scan(sp["down_tf"], h, kv_s["down"], mask, offset,
                          enable, align, heads, hd, act)
    skip = h
    h, new_convs["down_conv_0"] = cc3.apply(
        {"params": sp["down_conv_0"]}, h,
        convs["down_conv_0"].astype(h.dtype))

    def mid_body(carry, xs):
        h, rings = carry
        res_p, tf_p, cc, i = xs
        h, ncc = res.apply({"params": res_p}, h, t_emb, cc)
        for j in range(c.n_blocks):
            pj = jax.tree.map(lambda a: a[j], tf_p)
            h, rings = _tf_block_stacked(pj, h, rings, (i, j), mask,
                                         offset, enable, align, heads,
                                         hd, act)
        return (h, rings), ncc

    (h, kv_mid), mid_ncc = jax.lax.scan(
        mid_body, (h, kv_s["mid"]),
        (sp["mid_res"], sp["mid_tf"], convs["mid_res"],
         jnp.arange(c.num_mid_blocks, dtype=jnp.int32)))
    new_convs["mid_res"] = mid_ncc

    h = jnp.concatenate([h, skip], axis=-1)
    h, new_convs["up_res_0"] = res.apply(
        {"params": sp["up_res_0"]}, h, t_emb, convs["up_res_0"])
    h, kv_up = _tf_scan(sp["up_tf"], h, kv_s["up"], mask, offset,
                        enable, align, heads, hd, act)
    h, new_convs["up_conv_0"] = cc3.apply(
        {"params": sp["up_conv_0"]}, h,
        convs["up_conv_0"].astype(h.dtype))
    h, new_convs["final_block"] = CausalBlock1DStep(ch).apply(
        {"params": sp["final_block"]}, h, convs["final_block"])
    out = Conv1d(c.out_channels, 1).apply({"params": sp["final_proj"]}, h)
    return out, {"down": kv_down, "mid": kv_mid, "up": kv_up}, new_convs


def wave_step_stacked(sp: Dict, cfm_cfg: CFMConfig,
                      est_cfg: EstimatorConfig, align: int,
                      x_wave, mu_wave, mu_new, spks, est_cache: Dict,
                      w, k_total, base_frames):
    """CausalConditionalCFMWave.__call__ (fused write-then-attend +
    shared-offset DUS) as a pure function over the stacked-layer
    estimator — identical math, O(layers) fewer dispatched ops.
    ``est_cache`` in the stack_est_flat layout."""
    c = cfm_cfg
    s_steps, b, cf, d = x_wave.shape
    cd = (jnp.dtype(c.estimator_dtype) if c.estimator_dtype
          else mu_wave.dtype)
    mu_wave = jnp.concatenate(
        [mu_new[None].astype(cd), mu_wave[:-1].astype(cd)], axis=0)
    if c.t_scheduler == "cosine":
        t_span = t_span_cosine(c.n_timesteps)
    else:
        t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
    t_cur = jnp.asarray(t_span[:-1], x_wave.dtype)
    dts = jnp.asarray(np.diff(t_span), x_wave.dtype)

    h_idx = w - jnp.arange(s_steps)
    valid = (h_idx >= 0) & (h_idx < k_total)
    n_dones = base_frames + jnp.maximum(h_idx, 0) * cf

    def flat(a):
        a2 = jnp.stack([a, jnp.zeros_like(a)], axis=1)
        return a2.reshape(s_steps * 2 * b, cf, d)

    mu_in = flat(mu_wave)
    cond_in = jnp.zeros_like(mu_in)
    x_in = jnp.stack([x_wave, x_wave], axis=1).reshape(
        s_steps * 2 * b, cf, d).astype(cd)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    spks_in = jnp.tile(spks_in, (s_steps, 1)).astype(cd)
    t_in = jnp.repeat(t_cur, 2 * b).astype(cd)
    nd_in = jnp.repeat(n_dones, 2 * b)

    rp = est_cache["kv"]["down"].shape[-2]
    rot_slots = np.array([(s * cf) % rp for s in range(s_steps)], np.int32)
    rot = jnp.asarray(np.repeat(rot_slots, 2 * b))
    en = jnp.repeat(valid, 2 * b)
    offset = (base_frames + w * cf) % rp

    dphi, new_kv, new_convs = estimator_step_stacked(
        sp, est_cfg, x_in, mu_in, t_in, spks_in, cond_in,
        est_cache["kv"], est_cache["convs"], nd_in, rot, offset, en,
        align)

    rate = jnp.asarray(c.inference_cfg_rate, x_wave.dtype)
    dphi = dphi.reshape(s_steps, 2, b, cf, d).astype(x_wave.dtype)
    dphi = (1.0 + rate) * dphi[:, 0] - rate * dphi[:, 1]
    x_next = x_wave + dts[:, None, None, None] * dphi

    # conv caches: en (rows,) lands on axis -3 of both the (rows, 2, ch)
    # and the stacked (m, rows, 2, ch) leaves, so one broadcast masks both
    new_convs = jax.tree.map(
        lambda old, new: jnp.where(en[:, None, None],
                                   new.astype(old.dtype), old),
        est_cache["convs"], new_convs)

    exit_mel = x_next[-1].astype(jnp.float32)
    n_enter = base_frames + jnp.clip(w + 1, 0, None) * cf
    noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))
    z = jax.lax.dynamic_slice(
        noise, (0, jnp.minimum(n_enter, noise.shape[1] - cf), 0),
        (1, cf, d))
    z = jnp.broadcast_to(z, (b, cf, d)).astype(x_wave.dtype)
    x_shift = jnp.concatenate([z[None], x_next[:-1]], axis=0)
    return exit_mel, x_shift, mu_wave, {"kv": new_kv, "convs": new_convs}


# --------------------------------------------------------------------------
# Pallas fused-block wavefront: each homogeneous transformer group runs as
# ONE kernel launch (ops/pallas_block.py) instead of ~35 XLA ops per layer
# --------------------------------------------------------------------------
#
# Layout: per-GROUP stacked ring buffers — down (n, rows, Rp, 2d), one
# (n, rows, Rp, 2d) buffer PER mid block (a tuple of m, so no per-group
# dynamic-slice slab copies — the stacked (m, n, ...) layout's 313 MB/iter
# failure mode, BENCH_NOTES round 4), up (n, ...).  Parameters likewise:
# group_estimator_params re-packs the stacked leaves with mid as a tuple.
# Scope: the fused write-then-attend + shared-offset DUS geometry (the
# production serving shape: ring % chunk == 0), ring dtype == compute
# dtype.  The glue (resnets, skip concat, final blocks, CFG combine)
# stays in XLA — it is ~1/4 of the op count; the kernel removes the rest.


def group_estimator_params(fp: Dict, cfg: EstimatorConfig) -> Dict:
    """stack_estimator_params with the mid transformer groups kept as a
    TUPLE of per-block stacked subtrees (kernel layout)."""
    sp = stack_estimator_params(fp, cfg)
    est = fp["params"]["decoder"]["estimator"]
    n, m = cfg.n_blocks, cfg.num_mid_blocks

    def stk(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    sp["mid_tf"] = tuple(
        stk([est[f"mid_tf_{i}_{j}"] for j in range(n)]) for i in range(m))
    return sp


def group_est_flat(est_flat: Dict, cfg: EstimatorConfig) -> Dict:
    """Fused-flat est cache ({"kv": tuple of 2n + m*n (rows, Rp, 2d)})
    -> the kernel layout: kv {"down": (n, rows, Rp, 2d), "mid": tuple of
    m (n, rows, Rp, 2d), "up": (n, ...)}; the m mid resnet conv caches
    stacked under one "mid_res" key (as in stack_est_flat)."""
    n, m = cfg.n_blocks, cfg.num_mid_blocks
    kv = est_flat["kv"]
    convs = dict(est_flat["convs"])
    mids = [convs.pop(f"mid_res_{i}") for i in range(m)]
    convs["mid_res"] = {k2: jnp.stack([md[k2] for md in mids])
                        for k2 in ("block1", "block2")}
    return {"kv": {"down": jnp.stack(kv[:n]),
                   "mid": tuple(jnp.stack(kv[n + i * n: n + (i + 1) * n])
                                for i in range(m)),
                   "up": jnp.stack(kv[n + m * n:])},
            "convs": convs}


def ungroup_est_flat(est_g: Dict, cfg: EstimatorConfig) -> Dict:
    """Inverse of group_est_flat (wavefront exit -> fused-flat layout)."""
    n, m = cfg.n_blocks, cfg.num_mid_blocks
    kv_g = est_g["kv"]
    kv = ([kv_g["down"][j] for j in range(n)]
          + [kv_g["mid"][i][j] for i in range(m) for j in range(n)]
          + [kv_g["up"][j] for j in range(n)])
    convs = dict(est_g["convs"])
    mid_res = convs.pop("mid_res")
    for i in range(m):
        convs[f"mid_res_{i}"] = {k2: mid_res[k2][i]
                                 for k2 in ("block1", "block2")}
    return {"kv": tuple(kv), "convs": convs}


def estimator_step_pallas(sp: Dict, c: EstimatorConfig, x, mu, t, spks,
                          cond, kv_g: Dict, convs: Dict, nd_mask, rot,
                          offset, enable, align: int,
                          shared: bool = True,
                          interpret: bool = False):
    """EstimatorStep's math (single-level causal U-Net,
    estimator.py:123-245) with each homogeneous transformer group
    executed by the fused Pallas kernel (ops/pallas_block.py).  ``rot``
    and ``nd_mask = n_done + chunk`` are per-row (rows,) i32 — the
    kernel rebuilds ``_ring_mask(..., fused=True)`` from them."""
    from ...ops.pallas_block import fused_tf_group
    assert c.causal and len(c.channels) == 1
    assert not c.use_flash_attention
    ch = c.channels[0]
    heads, hd, act = c.num_heads, c.attention_head_dim, c.act_fn
    t_emb = SinusoidalPosEmb(c.in_channels).apply({}, t)
    t_emb = TimestepEmbedding(ch * 4).apply({"params": sp["time_mlp"]},
                                            t_emb.astype(x.dtype))
    mt = mish(t_emb)[:, None, :]   # (rows, 1, 4ch): leading-dim
    # slicing only (a 2D (rows, 4ch) operand would need 8-aligned
    # sublane row offsets inside the kernel)
    spks_b = jnp.broadcast_to(spks[:, None, :],
                              (x.shape[0], x.shape[1], spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)

    cc3 = CausalConv1d(ch, 3)

    def rn_group(p, rp_, cc, h, rings):
        """resnet + tf group in ONE kernel launch; returns the updated
        (h, rings) and the resnet conv caches {'block1','block2'}."""
        h, rings, c1, c2 = fused_tf_group(
            p, rp_, mt, cc["block1"], cc["block2"], h, rings, nd_mask,
            rot, enable, offset, align=align, heads=heads, head_dim=hd,
            act_fn=act, shared_offset=shared, interpret=interpret)
        return h, rings, {"block1": c1, "block2": c2}

    new_convs = {}
    h, kv_down, new_convs["down_res_0"] = rn_group(
        sp["down_tf"], sp["down_res_0"], convs["down_res_0"],
        h, kv_g["down"])
    skip = h
    h, new_convs["down_conv_0"] = cc3.apply(
        {"params": sp["down_conv_0"]}, h,
        convs["down_conv_0"].astype(h.dtype))

    kv_mid = []
    mid_ncc = []
    for i in range(c.num_mid_blocks):
        res_p = jax.tree.map(lambda a: a[i], sp["mid_res"])
        h, rings_i, ncc = rn_group(
            sp["mid_tf"][i], res_p,
            jax.tree.map(lambda a: a[i], convs["mid_res"]),
            h, kv_g["mid"][i])
        mid_ncc.append(ncc)
        kv_mid.append(rings_i)
    new_convs["mid_res"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                        *mid_ncc)

    h = jnp.concatenate([h, skip], axis=-1)
    h, kv_up, new_convs["up_res_0"] = rn_group(
        sp["up_tf"], sp["up_res_0"], convs["up_res_0"], h, kv_g["up"])
    h, new_convs["up_conv_0"] = cc3.apply(
        {"params": sp["up_conv_0"]}, h,
        convs["up_conv_0"].astype(h.dtype))
    h, new_convs["final_block"] = CausalBlock1DStep(ch).apply(
        {"params": sp["final_block"]}, h, convs["final_block"])
    out = Conv1d(c.out_channels, 1).apply({"params": sp["final_proj"]}, h)
    return out, {"down": kv_down, "mid": tuple(kv_mid), "up": kv_up}, \
        new_convs


def wave_step_pallas(sp: Dict, cfm_cfg: CFMConfig,
                     est_cfg: EstimatorConfig, align: int,
                     x_wave, mu_wave, mu_new, spks, est_cache: Dict,
                     w, k_total, base_frames, interpret: bool = False):
    """CausalConditionalCFMWave.__call__ (fused write-then-attend +
    shared-offset DUS) with the Pallas fused-block estimator — identical
    math, one kernel launch per transformer group.  ``est_cache`` in the
    group_est_flat layout."""
    c = cfm_cfg
    s_steps, b, cf, d = x_wave.shape
    cd = (jnp.dtype(c.estimator_dtype) if c.estimator_dtype
          else mu_wave.dtype)
    mu_wave = jnp.concatenate(
        [mu_new[None].astype(cd), mu_wave[:-1].astype(cd)], axis=0)
    if c.t_scheduler == "cosine":
        t_span = t_span_cosine(c.n_timesteps)
    else:
        t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
    t_cur = jnp.asarray(t_span[:-1], x_wave.dtype)
    dts = jnp.asarray(np.diff(t_span), x_wave.dtype)

    h_idx = w - jnp.arange(s_steps)
    valid = (h_idx >= 0) & (h_idx < k_total)
    n_dones = base_frames + jnp.maximum(h_idx, 0) * cf

    def flat(a):
        a2 = jnp.stack([a, jnp.zeros_like(a)], axis=1)
        return a2.reshape(s_steps * 2 * b, cf, d)

    mu_in = flat(mu_wave)
    cond_in = jnp.zeros_like(mu_in)
    x_in = jnp.stack([x_wave, x_wave], axis=1).reshape(
        s_steps * 2 * b, cf, d).astype(cd)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    spks_in = jnp.tile(spks_in, (s_steps, 1)).astype(cd)
    t_in = jnp.repeat(t_cur, 2 * b).astype(cd)
    nd_in = jnp.repeat(n_dones, 2 * b)

    rp = est_cache["kv"]["down"].shape[-2]
    rot_slots = np.array([(s * cf) % rp for s in range(s_steps)], np.int32)
    rot = jnp.asarray(np.repeat(rot_slots, 2 * b))
    en = jnp.repeat(valid, 2 * b)
    offset = (base_frames + w * cf) % rp

    dphi, new_kv, new_convs = estimator_step_pallas(
        sp, est_cfg, x_in, mu_in, t_in, spks_in, cond_in,
        est_cache["kv"], est_cache["convs"], nd_in + cf, rot, offset, en,
        align, interpret=interpret)

    rate = jnp.asarray(c.inference_cfg_rate, x_wave.dtype)
    dphi = dphi.reshape(s_steps, 2, b, cf, d).astype(x_wave.dtype)
    dphi = (1.0 + rate) * dphi[:, 0] - rate * dphi[:, 1]
    x_next = x_wave + dts[:, None, None, None] * dphi

    new_convs = jax.tree.map(
        lambda old, new: jnp.where(en[:, None, None],
                                   new.astype(old.dtype), old),
        est_cache["convs"], new_convs)

    exit_mel = x_next[-1].astype(jnp.float32)
    n_enter = base_frames + jnp.clip(w + 1, 0, None) * cf
    noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))
    z = jax.lax.dynamic_slice(
        noise, (0, jnp.minimum(n_enter, noise.shape[1] - cf), 0),
        (1, cf, d))
    z = jnp.broadcast_to(z, (b, cf, d)).astype(x_wave.dtype)
    x_shift = jnp.concatenate([z[None], x_next[:-1]], axis=0)
    return exit_mel, x_shift, mu_wave, {"kv": new_kv, "convs": new_convs}


def wave_lanes_step_pallas(gp: Dict, cfm_cfg: CFMConfig,
                           est_cfg: EstimatorConfig,
                           x_wave, mu_wave, mu_buf, spks,
                           est_cache: Dict, w, avail_iters, k_total,
                           base_frames, interpret: bool = False):
    """CausalConditionalCFMWaveLanes.__call__ (fused write-then-attend,
    per-lane arbitrary offsets) with the Pallas fused-block estimator —
    identical math, one kernel launch per resnet+transformer group.  The
    kernel's per-row write mode derives each row's chunk offset from its
    nd scalar (shared_offset=False), so lanes at arbitrary stream
    positions batch exactly as in the XLA lanes engine.  ``est_cache``
    in the group_est_flat layout."""
    c = cfm_cfg
    s_steps, lanes, cf, d = x_wave.shape
    cap = mu_buf.shape[1]
    cd = (jnp.dtype(c.estimator_dtype) if c.estimator_dtype
          else mu_wave.dtype)

    advance = w < avail_iters                            # (lanes,)
    mu_new = mu_buf[jnp.arange(lanes), jnp.clip(w, 0, None) % cap]
    mu_wave = jnp.where(
        advance[None, :, None, None],
        jnp.concatenate([mu_new[None].astype(cd),
                         mu_wave[:-1].astype(cd)], axis=0),
        mu_wave.astype(cd))

    if c.t_scheduler == "cosine":
        t_span = t_span_cosine(c.n_timesteps)
    else:
        t_span = np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
    t_cur = jnp.asarray(t_span[:-1], x_wave.dtype)
    dts = jnp.asarray(np.diff(t_span), x_wave.dtype)

    h_idx = w[None, :] - jnp.arange(s_steps)[:, None]    # (S, lanes)
    valid = (h_idx >= 0) & (h_idx < k_total[None, :]) & advance[None, :]
    n_dones = base_frames[None, :] + jnp.maximum(h_idx, 0) * cf

    def flat(a):
        a2 = jnp.stack([a, jnp.zeros_like(a)], axis=1)
        return a2.reshape(s_steps * 2 * lanes, cf, d)

    mu_in = flat(mu_wave)
    cond_in = jnp.zeros_like(mu_in)
    x_in = jnp.stack([x_wave, x_wave], axis=1).reshape(
        s_steps * 2 * lanes, cf, d).astype(cd)
    spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    spks_in = jnp.tile(spks_in, (s_steps, 1)).astype(cd)
    t_in = jnp.repeat(t_cur, 2 * lanes).astype(cd)
    nd_in = jnp.tile(n_dones[:, None, :], (1, 2, 1)).reshape(-1)
    en = jnp.tile(valid[:, None, :], (1, 2, 1)).reshape(-1)
    rows = s_steps * 2 * lanes
    rot = jnp.zeros((rows,), jnp.int32)

    dphi, new_kv, new_convs = estimator_step_pallas(
        gp, est_cfg, x_in, mu_in, t_in, spks_in, cond_in,
        est_cache["kv"], est_cache["convs"], nd_in + cf, rot,
        jnp.zeros((), jnp.int32), en, 0, shared=False,
        interpret=interpret)

    rate = jnp.asarray(c.inference_cfg_rate, x_wave.dtype)
    dphi = dphi.reshape(s_steps, 2, lanes, cf, d).astype(x_wave.dtype)
    dphi = (1.0 + rate) * dphi[:, 0] - rate * dphi[:, 1]
    x_next = x_wave + dts[:, None, None, None] * dphi

    new_convs = jax.tree.map(
        lambda old, new: jnp.where(en[:, None, None],
                                   new.astype(old.dtype), old),
        est_cache["convs"], new_convs)

    exit_mel = x_next[-1].astype(jnp.float32)
    exit_valid = valid[-1]

    noise = jnp.asarray(_fixed_noise(c.max_noise_len, d))[0]
    n_enter = base_frames + jnp.clip(w + 1, 0, None) * cf
    n_enter = jnp.minimum(n_enter, noise.shape[0] - cf)
    z = jax.vmap(lambda off: jax.lax.dynamic_slice(
        noise, (off, 0), (cf, d)))(n_enter).astype(x_wave.dtype)
    x_shift = jnp.where(
        advance[None, :, None, None],
        jnp.concatenate([z[None], x_next[:-1]], axis=0), x_wave)
    return (exit_mel, exit_valid, x_shift, mu_wave,
            {"kv": new_kv, "convs": new_convs},
            w + advance.astype(w.dtype))


# --------------------------------------------------------------------------
# Pallas fused-conformer encoder hop (ops/pallas_conformer.py): the two
# homogeneous conformer stacks of the wavefront's encoder each run as ONE
# kernel launch; embeds / pre-lookahead / upsample glue stays in XLA
# --------------------------------------------------------------------------


def group_encoder_params(fp: Dict, cfg: EncoderConfig) -> Dict:
    """Stacked-leaf conformer groups for fused_conformer_group (leading
    L axis per leaf; mirrors group_estimator_params).  ``fp``: the
    (qkv-fused) full flow param dict."""
    enc = fp["params"]["encoder"]

    def stk(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    return {"blocks": stk([enc[f"encoders_{i}"]
                           for i in range(cfg.num_blocks)]),
            "up_blocks": stk([enc[f"up_encoders_{i}"]
                              for i in range(cfg.num_up_blocks)])}


def encoder_hop_pallas(egp: Dict, flow_params, cfg: FlowConfig,
                       token_chunk, context, cache: Dict, n_tok,
                       pe_tok, pe_mel, interpret: bool = False):
    """KVFlowEncodeStep.__call__ (embed -> UpsampleConformerEncoderStep
    -> encoder_proj) with the two conformer stacks executed by the fused
    Pallas kernel.  Single-stream (B = 1) wavefront encoder only; math
    mirrors the flax modules op for op (exactness tolerance-pinned)."""
    from ...ops.pallas_conformer import fused_conformer_group
    c = cfg.encoder
    assert not c.macaron_style and not c.use_cnn_module
    assert c.pos_enc_layer_type == "rel_pos"
    p = flow_params["params"]
    heads = c.attention_heads
    hd = c.output_size // heads
    s = c.upsample_stride
    la = c.pre_lookahead_len
    ct = token_chunk.shape[1]

    emb_tbl = p["input_embedding"]["embedding"]
    x = jnp.take(emb_tbl, jnp.maximum(token_chunk, 0), axis=0)
    ctx = jnp.take(emb_tbl, jnp.maximum(context, 0), axis=0)
    enc = p["encoder"]
    embed = LinearEmbed(c.output_size, c.dropout_rate)
    x = embed.apply({"params": enc["embed"]}, x)
    ctx = embed.apply({"params": enc["embed"]}, ctx)
    pos = jax.lax.dynamic_slice(
        pe_tok, (n_tok, 0), (ct, pe_tok.shape[1]))[None].astype(x.dtype)
    x, new_pre = PreLookaheadStep(
        c.output_size, la).apply({"params": enc["pre_lookahead_layer"]},
                                 x, ctx, cache["pre"])
    x, new_kv, new_pk = fused_conformer_group(
        egp["blocks"], x, pos, cache["kv"], cache["pk"], n_tok,
        heads=heads, head_dim=hd, act_fn=c.activation,
        interpret=interpret)

    x, new_up_conv = Upsample1DStep(
        c.output_size, s).apply({"params": enc["up_layer"]},
                                x, cache["up_conv"])
    cm = ct * s
    n_mel = n_tok * s
    x = LinearEmbed(c.output_size, c.dropout_rate).apply(
        {"params": enc["up_embed"]}, x)
    pos_up = jax.lax.dynamic_slice(
        pe_mel, (n_mel, 0), (cm, pe_mel.shape[1]))[None].astype(x.dtype)
    x, new_ukv, new_upk = fused_conformer_group(
        egp["up_blocks"], x, pos_up, cache["ukv"], cache["upk"], n_mel,
        heads=heads, head_dim=hd, act_fn=c.activation,
        interpret=interpret)
    x = nn.LayerNorm(epsilon=1e-5).apply(
        {"params": enc["after_norm"]}, x)
    mu = nn.Dense(cfg.output_size).apply(
        {"params": p["encoder_proj"]}, x)
    new_cache = {"pre": new_pre.astype(cache["pre"].dtype),
                 "kv": new_kv, "pk": new_pk,
                 "up_conv": new_up_conv.astype(cache["up_conv"].dtype),
                 "ukv": new_ukv, "upk": new_upk}
    return mu, new_cache
