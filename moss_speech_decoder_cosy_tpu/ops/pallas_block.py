"""Fused transformer-block-group Pallas kernel for the KV wavefront.

The wavefront scan body is per-op EXECUTION-overhead bound: 56 tiny
256-channel transformer layers dispatch ~35 XLA ops each per iteration
(~2.7 us/op on this chip — BENCH_NOTES rounds 3-4; MFU ~1.5%, i.e. the
wall is overhead, not FLOPs).  Round 4 falsified the control-flow lever
(a lax.scan over stacked layer params reduces code size, not executed op
count, and ADDS a slab-copy) — the remaining lever is op FUSION.  This
kernel executes an entire GROUP of L homogeneous ``BasicTransformerBlock``
layers (the hot loop of the reference's causal U-Net estimator,
/root/reference/GLM_modules/cosyvoice/flow/decoder.py:294-494; block math
``TransformerBlockStep`` in models/flow/kv_stream.py) as ONE program:

    l == 0 prologue: the group's preceding CausalResnetBlock1DStep
    per layer:  LayerNorm -> fused qkv matmul -> chunk K/V written into
    the layer's ring slab -> banded-mask attention read from the
    VMEM-resident slab -> out-proj -> LayerNorm -> feed-forward

replacing ~50 op launches per resnet+group with one kernel launch.

Dataflow facts:
- grid = (L, row_tiles), row-major: layer l outer, row tile rt inner.
  The activation ``x`` lives in a VMEM scratch that persists across grid
  steps (loaded from the input block at l == 0, flushed to the output at
  l == L-1) — layers are sequential, rows are independent.
- weights arrive as per-layer blocks through the Pallas pipeline (the
  BlockSpec index map advances only with l, so each layer's ~2 MB of
  weights is fetched once and double-buffered ahead of compute).
- rings stay in HBM (``pltpu.HBM``) and are ALIASED input->output: per
  (l, rt) step the row tile's (rows_t, rp, 2d) slab is DMA'd to VMEM
  (the load is issued before the qkv matmul and waited after it, hiding
  most of its latency), the chunk K/V is written into the slab, and the
  slab is DMA'd back whole (Mosaic constrains DMA slice extents to the
  (8, 128) tiling; unwritten slots carry their just-loaded values, so
  the full write is value-identical to a chunk-only DUS).
- the chunk write: shared-offset (lockstep) mode dispatches over the
  rp//cf STATIC offset candidates (Mosaic accepts static stores at any
  sublane alignment; DYNAMIC sublane offsets must be provably 8-aligned
  and chunk offsets sit on the C-frame grid); per-row mode (the
  continuous-batching lanes, ``shared_offset=False``) uses a bit-exact
  {0,1} one-hot matmul + select per row.
- the banded mask is rebuilt in-kernel from the per-row (n_done, rot)
  scalars: ring slot ``s`` of row ``r`` is valid iff
  ``(s - rot[r]) % rp < nd[r]`` — exactly ``_ring_mask(..., fused=True)``.
- attention runs as head-PAIRED row-batched matmuls: adjacent heads'
  K/V lanes are contiguous, so a (.., 2dk = 128) contraction against a
  block-diagonal Q computes both heads' scores in one full-k MXU pass
  (the zero off-blocks add exact f32 zeros — sums bit-identical to the
  per-head form), and one A|V contraction yields both heads' outputs in
  its diagonal blocks — halving the MXU pass count of the padding-bound
  per-head form; contraction order and accumulate-then-round dtype
  semantics match ``attend_stored``.

Numerics: the math mirrors ``TransformerBlockStep`` op for op (flax
LayerNorm's f32 stats + fast variance, same masked-softmax fill, same
reduction orders, f32 MXU accumulators rounded to the compute dtype).
Mosaic has no erf, so exact-GELU uses a 1.5e-7 rational erf; exactness
vs the unfused engine is pinned by tolerance in tests/test_kv_stream.py
(CPU interpret mode measures ~1e-8 on f32).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .activations import get_activation
from .attention import _NEG


def _ln(x, scale, bias, eps=1e-5):
    """flax nn.LayerNorm (use_fast_variance, force_float32_reductions):
    f32 stats, var clipped at 0, output cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (xf - mean) * mul + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7):
    Mosaic has no erf/erfc primitive, so the exact-GELU activation is
    rebuilt from exp (which it has).  The approximation error is below
    bf16 resolution; f32-mode deviation vs XLA's erfc is pinned by the
    kernel-vs-unfused tolerance test."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _activation(name: str):
    """In-kernel activation: exact GELU via _erf (f32 island, like
    jax.nn.gelu(approximate=False)); everything else from the shared
    registry (relu/silu/tanh/mish lower fine)."""
    if name == "gelu":
        def gelu(x):
            xf = x.astype(jnp.float32)
            y = 0.5 * xf * (1.0 + _erf(xf * (2.0 ** -0.5)))
            return y.astype(x.dtype)
        return gelu
    if name in ("swish", "silu"):
        # Mosaic's bf16 logistic trips a vector.broadcast verifier; the
        # f32 island is within a ULP of the XLA bf16 path
        def silu(x):
            xf = x.astype(jnp.float32)
            return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
        return silu
    return get_activation(name)


def _dot(x, w):
    """nn.Dense matmul on a (..., rows, d_in) operand: flatten leading
    dims, 2D dot with an f32 accumulator rounded back to the operand
    dtype — the same accumulate-then-round the XLA bf16 path performs
    (Mosaic requires the 32-bit accumulator explicitly)."""
    lead = x.shape[:-1]
    y = jnp.dot(x.reshape(-1, x.shape[-1]), w,
                preferred_element_type=jnp.float32)
    return y.reshape(lead + (w.shape[-1],)).astype(x.dtype)


def _mish(x):
    """ops.activations.mish (x * tanh(softplus(x))) as an f32 island —
    Mosaic lacks some bf16 comparisons softplus' stable form uses; the
    f32 compute is within a ULP of the XLA bf16 path (tolerance-pinned,
    exact in the f32/CPU test path)."""
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def _conv3(xf, k3):
    """Causal k=3 conv on the cache-prepended (rows_t, C+2, cin) operand
    as three shifted f32-accumulated matmuls (single final round, like
    the XLA conv)."""
    rows_t, cfp2, cin = xf.shape
    cfl = cfp2 - 2
    acc = None
    for k in range(3):
        part = jnp.dot(xf[:, k:k + cfl].reshape(-1, cin), k3[k],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.reshape(rows_t, cfl, k3.shape[-1])


def _kernel(s_ref,                                     # scalar prefetch
            x_in, mt,
            rb1k, rb1b, rb1ls, rb1lb, rmlpk, rmlpb,
            rb2k, rb2b, rb2ls, rb2lb, rresk, rresb,
            cc1_in, cc2_in,
            n1s, n1b, qkvk, outk, outb, n3s, n3b,
            ffpk, ffpb, ffok, ffob, ring_in,
            x_out, ring_out, cc1_out, cc2_out,
            x_scr, slab, attn_scr, sem_ld, sem_wb,
            *, rows: int, rows_t: int, align: int, heads: int,
            head_dim: int, act_fn: str, n_layers: int,
            offsets: tuple):
    # s_ref layout: [offset, nd[0..rows), rot[0..rows), enable[0..rows)]
    l = pl.program_id(0)
    rt = pl.program_id(1)
    r0 = rt * rows_t
    rp = slab.shape[1]
    d2 = slab.shape[2]
    inner = heads * head_dim
    cf = x_scr.shape[1]
    m1 = cf - align
    off = s_ref[0]

    # ring slab load first — its DMA rides under the qkv matmul
    ld = pltpu.make_async_copy(ring_in.at[l, pl.ds(r0, rows_t)], slab,
                               sem_ld)
    ld.start()

    # l == 0 prologue: the group's preceding CausalResnetBlock1DStep
    # (conv3 -> LN -> mish -> +time-proj -> conv3 -> LN -> mish, plus the
    # 1x1 residual), absorbing its ~18 XLA ops into the kernel.  Conv
    # caches round-trip as dedicated in/out operands; the caller applies
    # the enable mask to them (as for every conv cache).
    @pl.when(l == 0)
    def _():
        xi = x_in[pl.ds(r0, rows_t)]                   # (rows_t, C, cin)
        dt = xi.dtype
        xf = jnp.concatenate([cc1_in[pl.ds(r0, rows_t)].astype(dt), xi],
                             axis=1)
        cc1_out[pl.ds(r0, rows_t)] = xf[:, cf:cf + 2]
        hh = _conv3(xf, rb1k[...]).astype(dt) + rb1b[...]
        hh = _mish(_ln(hh, rb1ls[0, 0], rb1lb[0, 0]))
        proj = _dot(mt[pl.ds(r0, rows_t)], rmlpk[...]) + rmlpb[...]
        hh = hh + proj                       # (rows_t, 1, ch) broadcast
        hf = jnp.concatenate([cc2_in[pl.ds(r0, rows_t)].astype(dt), hh],
                             axis=1)
        cc2_out[pl.ds(r0, rows_t)] = hf[:, cf:cf + 2]
        h2 = _conv3(hf, rb2k[...]).astype(dt) + rb2b[...]
        h2 = _mish(_ln(h2, rb2ls[0, 0], rb2lb[0, 0]))
        res = _dot(xi, rresk[0]) + rresb[...]
        x_scr[pl.ds(r0, rows_t)] = h2 + res

    x_t = x_scr[pl.ds(r0, rows_t)]                     # (rows_t, C, ch)
    h = _ln(x_t, n1s[0, 0], n1b[0, 0])
    qkv = _dot(h, qkvk[0])                             # (rows_t, C, 3i)
    q = qkv[..., :inner]
    kv_c = qkv[..., inner:]                            # (rows_t, C, 2i)

    ld.wait()

    # chunk write into the slab.  Shared-offset (lockstep) mode: write
    # offsets live on the cf-grid (rp % cf == 0 and off ≡ align mod cf
    # in the DUS geometry), so the write dispatches over the rp//cf
    # STATIC offset candidates — Mosaic supports static stores at any
    # sublane alignment — executed only for the matching offset and
    # enabled rows.  Per-row mode (continuous-batching lanes: every row
    # sits at its own arbitrary stream position): a {0,1} one-hot matmul
    # + select per row — bit-exact (one contribution per slot), MXU-
    # friendly, offset-agnostic.  Disabled rows keep their loaded bytes.
    if offsets is not None:
        for r in range(rows_t):
            en_r = s_ref[1 + 2 * rows + r0 + r] != 0
            kv_r = kv_c[r].astype(slab.dtype)          # (C, d2)
            for off_j in offsets:
                p1 = min(cf, rp - off_j)               # frames pre-wrap

                @pl.when((off == off_j) & en_r)
                def _(r=r, off_j=off_j, p1=p1, kv_r=kv_r):
                    slab[r, off_j:off_j + p1] = kv_r[:p1]
                    if p1 < cf:
                        slab[r, 0:cf - p1] = kv_r[p1:]
    else:
        slot_c = jax.lax.broadcasted_iota(jnp.int32, (rp, cf), 0)
        frame_c = jax.lax.broadcasted_iota(jnp.int32, (rp, cf), 1)
        slot_d = jax.lax.broadcasted_iota(jnp.int32, (rp, d2), 0)
        for r in range(rows_t):
            en_r = s_ref[1 + 2 * rows + r0 + r] != 0
            off_r = (s_ref[1 + r0 + r] - cf) % rp      # nd_mask - cf
            kv_r = kv_c[r].astype(slab.dtype)          # (C, d2)
            oh = (((slot_c - off_r) % rp) == frame_c).astype(slab.dtype)
            contrib = jnp.dot(oh, kv_r,
                              preferred_element_type=jnp.float32
                              ).astype(slab.dtype)     # (rp, d2)
            in_chunk = ((slot_d - off_r) % rp) < cf
            slab[r] = jnp.where(in_chunk & en_r, contrib, slab[r])
    # write-back.  Shared-offset mode: 16-ALIGNED windows covering the
    # chunk parts (Mosaic accepts tile-aligned dynamic DMA offsets and
    # extents; unwritten window slots carry their just-loaded values, so
    # the window write is value-identical to a chunk-only DUS) — at the
    # production geometry this writes 48 of 160 slots per layer instead
    # of the whole slab.  Per-row (lanes) mode: full slab.
    def win(n):
        return ((n + 15) // 16 + 1) * 16

    use_windows = (offsets is not None and win(m1) < rp
                   and (align == 0 or win(align) < rp))
    wbs = []
    if use_windows:
        parts = [(m1, off)]
        if align:
            parts.append((align, (off + m1) % rp))
        for i, (plen, poff) in enumerate(parts):
            w = win(plen)
            off0 = jnp.minimum((poff // 16) * 16, rp - w)
            off0 = pl.multiple_of(off0, 16)
            cp = pltpu.make_async_copy(
                slab.at[:, pl.ds(off0, w)],
                ring_out.at[l, pl.ds(r0, rows_t), pl.ds(off0, w)],
                sem_wb.at[i])
            cp.start()
            wbs.append(cp)
    else:
        cp = pltpu.make_async_copy(
            slab, ring_out.at[l, pl.ds(r0, rows_t)], sem_wb.at[0])
        cp.start()
        wbs.append(cp)

    # banded-mask attention in attend_stored's contraction order, one
    # row-batched matmul pair per head (Mosaic supports a single batch
    # dim).  The 3D bool mask is built by stacking per-row f32 masks on
    # the LEADING dim and comparing — Mosaic rejects trailing-unit bool
    # reshapes, leading-dim stacks and elementwise compares are fine.
    dk = head_dim
    scale = dk ** -0.5
    neg = jnp.asarray(_NEG, q.dtype)
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (rp, cf), 0)
    mrows = []
    for r in range(rows_t):
        nd_r = s_ref[1 + r0 + r]
        rot_r = s_ref[1 + rows + r0 + r]
        valid_r = ((pos2 - rot_r) % rp) < nd_r         # (rp, C)
        mrows.append(valid_r.astype(jnp.float32))
    vb3f = jnp.stack(mrows)                            # (rows_t, rp, C)
    vb3 = vb3f > 0.5

    def one_head(hi):
        k_h = slab[:, :, hi * dk:(hi + 1) * dk].astype(q.dtype)
        v_h = slab[:, :, (heads + hi) * dk:(heads + hi + 1) * dk]
        v_h = v_h.astype(q.dtype)
        q_h = q[..., hi * dk:(hi + 1) * dk]            # (rows_t, C, dk)
        s_h = jax.lax.dot_general(                     # (rows_t, rp, C)
            k_h, q_h, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q.dtype)
        s_h = s_h * scale
        s_h = jnp.where(vb3, s_h, neg)
        a_h = jax.nn.softmax(s_h, axis=1)
        a_h = jnp.where(vb3, a_h, 0.0)
        return jax.lax.dot_general(                    # (rows_t, C, dk)
            a_h, v_h, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(q.dtype)

    # head-PAIRED matmuls: adjacent heads' K/V lanes are contiguous, so a
    # (.., 2dk=128) contraction against a block-diagonal Q computes both
    # heads' scores in ONE full-k MXU pass (the zero off-blocks add exact
    # f32 zeros — bit-identical sums), and one A|V contraction yields
    # both heads' outputs in its diagonal C x dk blocks — halving the
    # MXU pass count of the padding-bound per-head form.  The diagonal
    # blocks land in the attn scratch (tpu.concatenate rejects offset
    # slices; masked stores accept them).
    if heads % 2 == 0 and 2 * dk <= 256:
        qT = q.transpose(0, 2, 1)                      # (rows_t, i, C)
        d_io = jax.lax.broadcasted_iota(jnp.int32, (2 * dk, cf), 0)
        topf = (d_io < dk).astype(q.dtype)
        botf = (d_io >= dk).astype(q.dtype)
        vb6 = jnp.concatenate([vb3f, vb3f], axis=-1) > 0.5
        for hp in range(heads // 2):
            ko = 2 * hp * dk
            k2 = slab[:, :, ko:ko + 2 * dk].astype(q.dtype)
            v2 = slab[:, :, inner + ko:inner + ko + 2 * dk].astype(q.dtype)
            qt2 = qT[:, ko:ko + 2 * dk, :]             # (rows_t, 2dk, C)
            qbd = jnp.concatenate([qt2 * topf, qt2 * botf], axis=-1)
            s2 = jax.lax.dot_general(                  # (rows_t, rp, 2C)
                k2, qbd, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(q.dtype)
            s2 = s2 * scale
            s2 = jnp.where(vb6, s2, neg)
            a2 = jax.nn.softmax(s2, axis=1)
            a2 = jnp.where(vb6, a2, 0.0)
            o2 = jax.lax.dot_general(                  # (rows_t, 2C, 2dk)
                a2, v2, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32).astype(q.dtype)
            attn_scr[:, :, ko:ko + dk] = o2[:, :cf, :dk]
            attn_scr[:, :, ko + dk:ko + 2 * dk] = o2[:, cf:, dk:]
        a = attn_scr[...]                              # (rows_t, C, i)
    else:
        a = jnp.concatenate([one_head(hi) for hi in range(heads)],
                            axis=-1)                   # (rows_t, C, i)

    x1 = x_t + _dot(a, outk[0]) + outb[0, 0]
    h2 = _ln(x1, n3s[0, 0], n3b[0, 0])
    ff = _activation(act_fn)(_dot(h2, ffpk[0]) + ffpb[0, 0])
    x2 = x1 + _dot(ff, ffok[0]) + ffob[0, 0]

    x_scr[pl.ds(r0, rows_t)] = x2

    @pl.when(l == n_layers - 1)
    def _():
        x_out[pl.ds(r0, rows_t)] = x2

    for cp in wbs:
        cp.wait()


def _pick_rows_t(rows: int, rp: int, d2: int, itemsize: int,
                 budget: int = 4 * 1024 * 1024) -> int:
    """Largest divisor of ``rows`` whose ring slab fits the VMEM budget."""
    for rt in range(rows, 0, -1):
        if rows % rt == 0 and rt * rp * d2 * itemsize <= budget:
            return rt
    return 1


def fused_tf_group(p: Dict, rp_: Dict, mt: jnp.ndarray, cc1: jnp.ndarray,
                   cc2: jnp.ndarray, x: jnp.ndarray, rings: jnp.ndarray,
                   nd_mask: jnp.ndarray, rot: jnp.ndarray,
                   enable: jnp.ndarray, offset: jnp.ndarray, *,
                   align: int, heads: int, head_dim: int, act_fn: str,
                   shared_offset: bool = True,
                   interpret: bool = False):
    """Run one resnet + a stacked group of transformer blocks through the
    fused kernel.

    p: transformer param subtree with every leaf stacked on a leading L
       axis (norm1/attn1.to_qkv/attn1.to_out/norm3/ff_proj/ff_out);
    rp_: the preceding CausalResnetBlock1DStep's params (block1/block2
       CausalConv1d+LN, mlp Dense, res_conv 1x1);
    mt (rows, 1, 4ch) = mish(t_emb); cc1/cc2 the resnet conv caches
    (rows, 2, cin)/(rows, 2, ch);
    x (rows, C, cin); rings (L, rows, rp, 2*inner) — returned UPDATED
    (aliased in place); nd_mask/rot (rows,) i32; enable (rows,) bool;
    offset () i32 shared DUS write offset (ignored when
    ``shared_offset=False`` — lanes mode derives each row's write
    offset from its nd scalar); align = prompt_frames % C.

    Returns (x_out (rows, C, ch), rings_out, cc1_new, cc2_new) — cc
    outputs are UNMASKED; the caller applies the enable mask.  Requires
    the fused write-then-attend + shared-offset DUS geometry and ring
    dtype == compute dtype."""
    L, rows, rp, d2 = rings.shape
    _, cf, cin = x.shape
    ch = p["norm1"]["scale"].shape[-1]
    inner = heads * head_dim
    assert d2 == 2 * inner, (d2, inner)
    assert rings.dtype == x.dtype, (rings.dtype, x.dtype)
    rows_t = _pick_rows_t(rows, rp, d2, rings.dtype.itemsize)

    i32 = jnp.int32
    scal = jnp.concatenate([
        jnp.asarray(offset, i32).reshape(1),
        jnp.asarray(nd_mask, i32).reshape(rows),
        jnp.asarray(rot, i32).reshape(rows),
        jnp.asarray(enable, i32).reshape(rows)])

    full = lambda *shape: pl.BlockSpec(                   # noqa: E731
        shape, lambda l, rt, s: (0,) * len(shape),
        memory_space=pltpu.VMEM)

    def wspec(leaf):
        return pl.BlockSpec(
            (1,) + leaf.shape[1:],
            lambda l, rt, s: (l,) + (0,) * (leaf.ndim - 1),
            memory_space=pltpu.VMEM)

    # (L, d) vectors get a unit middle dim so their (1, 1, d) blocks meet
    # the Mosaic last-two-dims tiling rule
    v3 = lambda a: a.reshape(a.shape[0], 1, a.shape[1])   # noqa: E731
    v2 = lambda a: a.reshape(1, a.shape[-1])              # noqa: E731
    weights = (v3(p["norm1"]["scale"]), v3(p["norm1"]["bias"]),
               p["attn1"]["to_qkv"]["kernel"],
               p["attn1"]["to_out"]["kernel"],
               v3(p["attn1"]["to_out"]["bias"]),
               v3(p["norm3"]["scale"]), v3(p["norm3"]["bias"]),
               p["ff_proj"]["kernel"], v3(p["ff_proj"]["bias"]),
               p["ff_out"]["kernel"], v3(p["ff_out"]["bias"]))
    rweights = (rp_["block1"]["conv"]["conv"]["kernel"],
                v2(rp_["block1"]["conv"]["conv"]["bias"]),
                v3(rp_["block1"]["norm"]["scale"][None]),
                v3(rp_["block1"]["norm"]["bias"][None]),
                rp_["mlp"]["kernel"], v2(rp_["mlp"]["bias"]),
                rp_["block2"]["conv"]["conv"]["kernel"],
                v2(rp_["block2"]["conv"]["conv"]["bias"]),
                v3(rp_["block2"]["norm"]["scale"][None]),
                v3(rp_["block2"]["norm"]["bias"][None]),
                rp_["res_conv"]["kernel"], v2(rp_["res_conv"]["bias"]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, rows // rows_t),
        in_specs=[full(rows, cf, cin), full(*mt.shape)]
        + [full(*w.shape) for w in rweights]
        + [full(*cc1.shape), full(*cc2.shape)]
        + [wspec(w) for w in weights]
        + [pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(full(rows, cf, ch),
                   pl.BlockSpec(memory_space=pltpu.HBM),
                   full(*cc1.shape), full(*cc2.shape)),
        scratch_shapes=[
            pltpu.VMEM((rows, cf, ch), x.dtype),
            pltpu.VMEM((rows_t, rp, d2), rings.dtype),
            pltpu.VMEM((rows_t, cf, inner), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if shared_offset:
        # lockstep DUS geometry: static-offset-candidate chunk stores
        assert rp % cf == 0, (rp, cf)
        offsets = tuple((align + j * cf) % rp for j in range(rp // cf))
    else:
        # continuous-batching lanes: per-row offsets from the nd scalars
        offsets = None
    kern = functools.partial(
        _kernel, rows=rows, rows_t=rows_t, align=align, heads=heads,
        head_dim=head_dim, act_fn=act_fn, n_layers=L, offsets=offsets)
    # analytic cost estimate: XLA's cost analysis cannot see inside a
    # custom call, so program_flops / MFU (utils/flops.py) would
    # undercount the kernel engine without this.  Counts the FLOPs as
    # EXECUTED (incl. the 2x block-diagonal padding of the paired
    # attention and the resnet prologue).
    flops = (2 * rows * cf * (3 * cin * ch + 3 * ch * ch + cin * ch)
             + 2 * rows * 4 * ch * ch
             + L * 2 * rows * cf * (3 * ch * inner + inner * ch
                                    + 8 * ch * ch)
             + L * 8 * rows * rp * cf * inner)
    wbytes = sum(int(w.size) * w.dtype.itemsize
                 for w in weights + rweights)
    rbytes = int(rings.size) * rings.dtype.itemsize
    cost = pl.CostEstimate(
        flops=int(flops),
        bytes_accessed=int(2 * rbytes + wbytes),
        transcendentals=int(2 * L * rows * cf * 4 * ch))
    fn = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        cost_estimate=cost,
        out_shape=(jax.ShapeDtypeStruct((rows, cf, ch), x.dtype),
                   jax.ShapeDtypeStruct(rings.shape, rings.dtype),
                   jax.ShapeDtypeStruct(cc1.shape, cc1.dtype),
                   jax.ShapeDtypeStruct(cc2.shape, cc2.dtype)),
        # operand indices include the scalar-prefetch arg: scalars=0,
        # x=1, mt=2, resnet weights 3..14, cc 15..16, tf weights 17..27,
        # rings=28 -> aliased to output 1
        input_output_aliases={28: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    return fn(scal, x, mt, *rweights, cc1, cc2, *weights, rings)
