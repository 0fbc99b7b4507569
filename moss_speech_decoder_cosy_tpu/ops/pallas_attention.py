"""Pallas TPU flash attention with chunk-causal masking.

The flow estimator runs self-attention over mel frames at every of the
10x2 CFG Euler steps; for long offline decodes (30 s -> 1500+ frames) XLA's
naive attention materializes (B, H, T, T) score tensors per layer.  This
kernel computes attention block-wise in VMEM (flash-attention style, online
softmax) with the chunk-causal mask applied ANALYTICALLY from positions —
no mask tensor exists anywhere: query q attends key k iff
``k < t  and  (chunk == 0 or k//chunk <= q//chunk)`` — exactly
ops.masks.chunk_attention_mask(full-valid, chunk, -1).  KV blocks entirely
in the future are skipped, so chunked attention is ~O(T * visible).

Interface: ``flash_chunk_attention(q, k, v, chunk_size)`` with q/k/v
(B, H, T, dk).  ``interpret=True`` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1.0e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *,
                 t_actual: int, blk_q: int, blk_kv: int, chunk: int,
                 scale: float):
    """Grid: (B*H, T_pad//blk_q, T_pad//blk_kv) — KV blocks iterate in the
    innermost grid dim so pallas double-buffers their DMA automatically.
    Scratch (m, l, acc) carries the online softmax across KV steps."""
    qi = pl.program_id(1)
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    # with the chunk-causal mask, KV blocks fully in the future contribute
    # nothing — skip their compute (their DMA is pipelined anyway)
    if chunk > 0:
        last_q = qi * blk_q + blk_q - 1
        visible = j * blk_kv <= (last_q // chunk + 1) * chunk - 1
    else:
        visible = j >= 0

    @pl.when(visible)
    def _():
        q = q_ref[:] * scale
        s = jnp.dot(q, k_ref[:].T, preferred_element_type=jnp.float32)
        q_pos = qi * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_kv), 0)
        k_pos = j * blk_kv + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_kv), 1)
        allow = k_pos < t_actual
        if chunk > 0:
            allow = allow & ((k_pos // chunk) <= (q_pos // chunk))
        s = jnp.where(allow, s, _NEG)
        m_prev = m_s[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[:] = m_new
        l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[:] = acc_s[:] * alpha + jnp.dot(
            p.astype(v_ref.dtype), v_ref[:],
            preferred_element_type=jnp.float32)

    @pl.when(j == n_kv - 1)
    def _():
        o_ref[:] = (acc_s[:] / jnp.maximum(l_s[:], 1e-20)).astype(
            o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("chunk_size", "blk_q", "blk_kv",
                                    "interpret", "valid_len"))
def flash_chunk_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          chunk_size: int = 0, blk_q: int = 512,
                          blk_kv: int = 512, interpret: bool = False,
                          valid_len: int | None = None) -> jnp.ndarray:
    """q/k/v: (B, H, T, dk) -> (B, H, T, dk); chunk_size=0 -> full attn.

    ``valid_len``: true sequence length when T is already padded by the
    caller (keys >= valid_len are masked; padding once outside avoids
    per-call pad/reshape copies)."""
    b, h, t, dk = q.shape
    scale = 1.0 / np.sqrt(dk)
    blk = max(blk_q, blk_kv)
    t_pad = ((t + blk - 1) // blk) * blk

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
                       ).reshape(b * h, t_pad, dk)

    kernel = functools.partial(
        _attn_kernel, t_actual=valid_len if valid_len is not None else t,
        blk_q=blk_q, blk_kv=blk_kv,
        chunk=chunk_size, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // blk_q, t_pad // blk_kv),
        in_specs=[
            pl.BlockSpec((None, blk_q, dk), lambda i, qi, j: (i, qi, 0)),
            pl.BlockSpec((None, blk_kv, dk), lambda i, qi, j: (i, j, 0)),
            pl.BlockSpec((None, blk_kv, dk), lambda i, qi, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, dk),
                               lambda i, qi, j: (i, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dk), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, dk), jnp.float32),
        ],
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out.reshape(b, h, t_pad, dk)[:, :, :t]


def _attn_kernel_fl(q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s, *,
                    t_actual: int, blk_q: int, blk_kv: int, chunk: int,
                    heads: int, dk: int, scale: float):
    """Feature-last flash kernel: blocks carry the FULL (H*dk) feature
    axis (Mosaic wants the last two block dims (8,128)-divisible or full,
    which a per-head dk=64 block violates); heads iterate as static
    in-kernel slices sharing one position mask."""
    qi = pl.program_id(1)
    j = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

    if chunk > 0:
        last_q = qi * blk_q + blk_q - 1
        visible = j * blk_kv <= (last_q // chunk + 1) * chunk - 1
    else:
        visible = j >= 0

    @pl.when(visible)
    def _():
        q_pos = qi * blk_q + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_kv), 0)
        k_pos = j * blk_kv + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_kv), 1)
        allow = k_pos < t_actual
        if chunk > 0:
            allow = allow & ((k_pos // chunk) <= (q_pos // chunk))
        for h in range(heads):
            sl = slice(h * dk, (h + 1) * dk)
            qh = q_ref[:, sl] * scale
            s = jnp.dot(qh, k_ref[:, sl].T,
                        preferred_element_type=jnp.float32)
            s = jnp.where(allow, s, _NEG)
            m_prev = m_s[:, h:h + 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            m_s[:, h:h + 1] = m_new
            l_s[:, h:h + 1] = l_s[:, h:h + 1] * alpha \
                + jnp.sum(p, axis=-1, keepdims=True)
            acc_s[:, sl] = acc_s[:, sl] * alpha + jnp.dot(
                p.astype(v_ref.dtype), v_ref[:, sl],
                preferred_element_type=jnp.float32)

    @pl.when(j == n_kv - 1)
    def _():
        for h in range(heads):
            sl = slice(h * dk, (h + 1) * dk)
            l = jnp.maximum(l_s[:, h:h + 1], 1e-20)
            o_ref[:, sl] = (acc_s[:, sl] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("heads", "chunk_size", "blk_q",
                                    "blk_kv", "interpret", "valid_len"))
def flash_chunk_attention_fl(q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray, heads: int,
                             chunk_size: int = 0, blk_q: int = 256,
                             blk_kv: int = 256, interpret: bool = False,
                             valid_len: int | None = None) -> jnp.ndarray:
    """Feature-last entry: q/k/v (B, T, H*dk) -> (B, T, H*dk).

    The (B,H,T,dk) entry forces two transposes per call that XLA
    materializes (BENCH_NOTES round-1: they ate the raw kernel's 3-4.5x
    win end-to-end).  Here the head axis stays inside the feature axis —
    zero layout copies around every attention layer."""
    b, t, hd = q.shape
    assert hd % heads == 0
    dk = hd // heads
    scale = 1.0 / np.sqrt(dk)
    blk = max(blk_q, blk_kv)
    t_pad = ((t + blk - 1) // blk) * blk

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0))) \
            if t_pad != t else x

    kernel = functools.partial(
        _attn_kernel_fl, t_actual=valid_len if valid_len is not None else t,
        blk_q=blk_q, blk_kv=blk_kv, chunk=chunk_size, heads=heads, dk=dk,
        scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b, t_pad // blk_q, t_pad // blk_kv),
        in_specs=[
            pl.BlockSpec((None, blk_q, hd), lambda i, qi, j: (i, qi, 0)),
            pl.BlockSpec((None, blk_kv, hd), lambda i, qi, j: (i, j, 0)),
            pl.BlockSpec((None, blk_kv, hd), lambda i, qi, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, hd),
                               lambda i, qi, j: (i, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, heads), jnp.float32),
            pltpu.VMEM((blk_q, heads), jnp.float32),
            pltpu.VMEM((blk_q, hd), jnp.float32),
        ],
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out[:, :t]


def xla_chunk_attention(q, k, v, chunk_size: int = 0) -> jnp.ndarray:
    """Reference XLA path (numerical golden for the kernel tests)."""
    b, h, t, dk = q.shape
    s = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(dk)
    if chunk_size > 0:
        pos = jnp.arange(t)
        allow = (pos[None, :] // chunk_size) <= (pos[:, None] // chunk_size)
        s = jnp.where(allow[None, None], s, _NEG)
    a = jax.nn.softmax(s, axis=-1)
    return a @ v
