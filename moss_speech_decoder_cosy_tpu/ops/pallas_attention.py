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

_NEG = -1.0e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_actual: int, t_pad: int,
                 blk_q: int, blk_kv: int, chunk: int, scale: float):
    """Grid: (B*H, T_pad // blk_q).  Refs: q/o (blk_q, dk),
    k/v (T_pad, dk)."""
    qi = pl.program_id(1)
    q = q_ref[:] * scale

    m0 = jnp.full((blk_q, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    acc0 = jnp.zeros((blk_q, q.shape[-1]), jnp.float32)

    q_pos = qi * blk_q + jax.lax.broadcasted_iota(
        jnp.int32, (blk_q, blk_kv), 0)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(j * blk_kv, blk_kv), :]
        v = v_ref[pl.ds(j * blk_kv, blk_kv), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        k_pos = j * blk_kv + jax.lax.broadcasted_iota(
            jnp.int32, (blk_q, blk_kv), 1)
        allow = k_pos < t_actual
        if chunk > 0:
            allow = allow & ((k_pos // chunk) <= (q_pos // chunk))
        s = jnp.where(allow, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    if chunk > 0:
        # skip kv blocks strictly after this query block's chunk window
        last_q = qi * blk_q + blk_q - 1
        visible_end = jnp.minimum((last_q // chunk + 1) * chunk, t_pad)
        n_kv = pl.cdiv(visible_end, blk_kv)
    else:
        n_kv = t_pad // blk_kv
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("chunk_size", "blk_q", "blk_kv",
                                    "interpret"))
def flash_chunk_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          chunk_size: int = 0, blk_q: int = 128,
                          blk_kv: int = 128,
                          interpret: bool = False) -> jnp.ndarray:
    """q/k/v: (B, H, T, dk) -> (B, H, T, dk); chunk_size=0 -> full attn."""
    b, h, t, dk = q.shape
    scale = 1.0 / np.sqrt(dk)
    t_pad = ((t + max(blk_q, blk_kv) - 1)
             // max(blk_q, blk_kv)) * max(blk_q, blk_kv)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, t_pad - t), (0, 0))
                       ).reshape(b * h, t_pad, dk)

    kernel = functools.partial(
        _attn_kernel, t_actual=t, t_pad=t_pad, blk_q=blk_q, blk_kv=blk_kv,
        chunk=chunk_size, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, t_pad // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, dk), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, t_pad, dk), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, t_pad, dk), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, dk), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, dk), q.dtype),
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return out.reshape(b, h, t_pad, dk)[:, :, :t]


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
