"""Fused conformer-layer-group Pallas kernel for the KV-stream encoder.

After the estimator kernel (ops/pallas_block.py) collapsed the wavefront's
hot loop, ~1.5 ms/iter of XLA glue remains, dominated by the encoder hop:
10 ConformerLayerStep layers (~27 ops each — the chunked-streaming role of
the reference's UpsampleConformerEncoder, upsample_encoder.py:105-321;
block math `ConformerLayerStep` in models/flow/kv_stream.py).  This kernel
runs a GROUP of L homogeneous conformer layers as ONE program:

    per layer:  LayerNorm -> fused qkv matmul -> wenet rel-pos attention
    over [KV ring ++ chunk] (key-indexed position term, cached projected
    positions in a parallel pk ring) -> out-proj -> LayerNorm ->
    feed-forward -> chunk K/V + pk written into the layer's ring

Differences from the estimator kernel, driven by the encoder's geometry
(B = 1, chunk 5-20 frames, ring 35-140 slots, D = 512 — everything is
VMEM-small):
- rings arrive as ordinary per-layer VMEM blocks through the Pallas
  pipeline (70-560 KB each; no manual DMA) and are ALIASED input->output;
  the chunk write happens at VALUE level — a {0,1} one-hot matmul +
  iota select on the whole ring value, offset-agnostic and bit-exact —
  then the block is stored back whole.
- the concat dataflow is kept (the encoder rings use canonical slot
  numbering, frame f -> slot f % R): keys = [ring ++ chunk], and the
  attend mask is one iota expression, slot valid iff
  ``slot < n_tok  or  slot >= R`` (chunk columns always visible) —
  exactly ``_ring_mask(R, C, n_tok)``.
- the position term: scores = ((q+u)·k^T + (q+v)·p^T) / sqrt(dk) with
  the per-slot projected position vectors read from the pk ring
  (wenet 'rel_pos' flavor, no rel-shift — attention.py:73-78 role).

Numerics mirror `ConformerLayerStep`/`RelPosAttentionStep` op for op
(LayerNorm eps 1e-12 with f32 stats, masked_softmax fill/zero semantics,
f32 MXU accumulators rounded to the compute dtype); exactness vs the XLA
encoder is pinned by tolerance in tests (CPU interpret is ~1e-8 on f32).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _NEG
from .pallas_block import _ln, _activation


def _dot2(x2, w, out_dtype):
    return jnp.dot(x2, w, preferred_element_type=jnp.float32
                   ).astype(out_dtype)


def _kernel(s_ref,                                      # [n_tok]
            x_in, pe,
            nms, nmb, qkvk, qkvb, posk, pbu, pbv, outk, outb,
            nfs, nfb, w1k, w1b, w2k, w2b,
            kv_in, pk_in,
            x_out, kv_out, pk_out,
            x_scr,
            *, heads: int, head_dim: int, act_fn: str, n_layers: int):
    l = pl.program_id(0)
    dt_ = x_scr.dtype
    cf = x_scr.shape[1]
    d = x_scr.shape[2]
    inner = heads * head_dim
    rt = kv_in.shape[2]
    tk = rt + cf
    n_tok = s_ref[0]

    @pl.when(l == 0)
    def _():
        x_scr[...] = x_in[...]

    x = x_scr[0]                                        # (C, D)
    h = _ln(x, nms[0, 0], nmb[0, 0], eps=1e-12)
    qkv = _dot2(h, qkvk[0], dt_) + qkvb[0, 0]           # (C, 3D)
    q = qkv[:, :inner]
    kv_c = qkv[:, inner:]                               # (C, 2D)
    pk_c = _dot2(pe[0], posk[0], dt_)                   # (C, D)

    ring_kv = kv_in[0, 0].astype(dt_)                   # (rt, 2D)
    ring_pk = pk_in[0, 0].astype(dt_)                   # (rt, D)
    k_all = jnp.concatenate([ring_kv[:, :inner], kv_c[:, :inner]], axis=0)
    v_all = jnp.concatenate([ring_kv[:, inner:], kv_c[:, inner:]], axis=0)
    p_all = jnp.concatenate([ring_pk, pk_c], axis=0)    # (Tk, D)

    # mask: ring slot valid iff written (slot < n_tok); chunk always
    slot = jax.lax.broadcasted_iota(jnp.int32, (cf, tk), 1)
    valid = (slot < n_tok) | (slot >= rt)               # (C, Tk)
    neg = jnp.asarray(_NEG, dt_)

    dk = head_dim
    scale = 1.0 / (dk ** 0.5)
    q_u = q + pbu[0, 0]                                 # (C, D) flat heads
    q_v = q + pbv[0, 0]
    dn = (((1,), (1,)), ((), ()))          # contract dk, no transpose
    outs = []
    for hi in range(heads):
        sl = slice(hi * dk, (hi + 1) * dk)
        s1 = jax.lax.dot_general(q_u[:, sl], k_all[:, sl], dn,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt_)
        s2 = jax.lax.dot_general(q_v[:, sl], p_all[:, sl], dn,
                                 preferred_element_type=jnp.float32
                                 ).astype(dt_)
        s_h = (s1 + s2) * scale                         # (C, Tk)
        s_h = jnp.where(valid, s_h, neg)
        a_h = jax.nn.softmax(s_h, axis=-1)
        a_h = jnp.where(valid, a_h, 0.0)
        outs.append(jax.lax.dot_general(                # (C, dk)
            a_h, v_all[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt_))
    a = jnp.concatenate(outs, axis=-1)                  # (C, D)
    x = x + _dot2(a, outk[0], dt_) + outb[0, 0]
    h = _ln(x, nfs[0, 0], nfb[0, 0], eps=1e-12)
    ff = _activation(act_fn)(_dot2(h, w1k[0], dt_) + w1b[0, 0])
    x = x + _dot2(ff, w2k[0], dt_) + w2b[0, 0]
    x_scr[0] = x

    @pl.when(l == n_layers - 1)
    def _():
        x_out[...] = x_scr[...]

    # ring writes (canonical slots, frame f -> slot f % rt): one-hot
    # gather of the chunk per slot + iota select, offset-agnostic
    off = n_tok % rt
    slot_c = jax.lax.broadcasted_iota(jnp.int32, (rt, cf), 0)
    frame_c = jax.lax.broadcasted_iota(jnp.int32, (rt, cf), 1)
    oh = (((slot_c - off) % rt) == frame_c).astype(dt_)  # (rt, C)
    m = min(cf, rt)
    in_chunk = jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    in_chunk = ((in_chunk - off) % rt) < m
    kv_new = jnp.where(
        in_chunk, _dot2(oh, kv_c, kv_in.dtype), kv_in[0, 0])
    pk_new = jnp.where(
        in_chunk, _dot2(oh, pk_c, pk_in.dtype), pk_in[0, 0])
    kv_out[0, 0] = kv_new
    pk_out[0, 0] = pk_new


def fused_conformer_group(p: Dict, x: jnp.ndarray, pos_emb: jnp.ndarray,
                          ring_kv: jnp.ndarray, ring_pk: jnp.ndarray,
                          n_tok, *, heads: int, head_dim: int,
                          act_fn: str, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run a stacked group of conformer layers through the fused kernel.

    p: param subtree stacked on a leading L axis (norm_mha /
    self_attn.{linear_qkv,linear_pos,pos_bias_u,pos_bias_v,linear_out} /
    norm_ff / feed_forward.{w_1,w_2});
    x (1, C, D); pos_emb (1, C, D); ring_kv (L, 1, Rt, 2D) and ring_pk
    (L, 1, Rt, D) — returned UPDATED (aliased in place); n_tok () i32.

    Returns (x_out, ring_kv_out, ring_pk_out).  B = 1 (the wavefront's
    encoder runs single-stream); chunk length must not exceed Rt."""
    L = ring_kv.shape[0]
    b, cf, d = x.shape
    assert b == 1 and ring_kv.shape[1] == 1
    inner = heads * head_dim
    assert inner == d, (inner, d)

    full = lambda *shape: pl.BlockSpec(                  # noqa: E731
        shape, lambda l, s: (0,) * len(shape),
        memory_space=pltpu.VMEM)

    def wspec(leaf):
        return pl.BlockSpec(
            (1,) + leaf.shape[1:],
            lambda l, s: (l,) + (0,) * (leaf.ndim - 1),
            memory_space=pltpu.VMEM)

    v3 = lambda a: a.reshape(a.shape[0], 1, a.shape[-1])  # noqa: E731
    at = p["self_attn"]
    weights = (v3(p["norm_mha"]["scale"]), v3(p["norm_mha"]["bias"]),
               at["linear_qkv"]["kernel"], v3(at["linear_qkv"]["bias"]),
               at["linear_pos"]["kernel"],
               v3(at["pos_bias_u"].reshape(L, inner)),
               v3(at["pos_bias_v"].reshape(L, inner)),
               at["linear_out"]["kernel"], v3(at["linear_out"]["bias"]),
               v3(p["norm_ff"]["scale"]), v3(p["norm_ff"]["bias"]),
               p["feed_forward"]["w_1"]["kernel"],
               v3(p["feed_forward"]["w_1"]["bias"]),
               p["feed_forward"]["w_2"]["kernel"],
               v3(p["feed_forward"]["w_2"]["bias"]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[full(1, cf, d), full(1, cf, d)]
        + [wspec(w) for w in weights]
        + [wspec(ring_kv), wspec(ring_pk)],
        out_specs=(full(1, cf, d), wspec(ring_kv), wspec(ring_pk)),
        scratch_shapes=[pltpu.VMEM((1, cf, d), x.dtype)],
    )
    kern = functools.partial(_kernel, heads=heads, head_dim=head_dim,
                             act_fn=act_fn, n_layers=L)
    rt = ring_kv.shape[2]
    flops = L * (2 * cf * d * (3 * d + d + d + 4 * d + 4 * d)
                 + 2 * 3 * cf * (rt + cf) * d
                 + 2 * rt * cf * (3 * d))
    cost = pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(2 * (ring_kv.size * ring_kv.dtype.itemsize
                                + ring_pk.size * ring_pk.dtype.itemsize)
                           + sum(int(w.size) * w.dtype.itemsize
                                 for w in weights)),
        transcendentals=int(L * cf * (rt + cf) * heads))
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        cost_estimate=cost,
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(ring_kv.shape, ring_kv.dtype),
                   jax.ShapeDtypeStruct(ring_pk.shape, ring_pk.dtype)),
        # operands: scalars=0, x=1, pe=2, weights 3..17, kv=18, pk=19
        input_output_aliases={18: 1, 19: 2},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    scal = jnp.asarray(n_tok, jnp.int32).reshape(1)
    return fn(scal, x, pos_emb, *weights, ring_kv, ring_pk)
