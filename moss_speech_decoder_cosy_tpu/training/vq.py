"""VQ codebook training: EMA updates + dead-code restart.

Rebuilds the reference's in-forward codebook maintenance
(speech_tokenizer/modeling_whisper.py:1391-1465) as explicit functional
state updates:

- EMA counts/weights with Laplace smoothing, decay 0.99
- commit loss (scale 10 x coefficient 0.25) and straight-through estimator
- dead-code restart every ``quantize_restart_interval`` steps, re-seeding
  entries whose EMA count fell under 0.1 * decay^interval with live hidden
  states

Cross-replica reduction uses ``jax.lax.psum`` over a named axis — the SPMD
equivalent of the reference's torch.distributed all_reduce/all_gather
(modeling_whisper.py:1401-1451).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from ..tokenizer.config import WhisperVQConfig


@flax.struct.dataclass
class VQTrainState:
    codebook: jnp.ndarray      # (V, D)
    ema_count: jnp.ndarray     # (V,)
    ema_weight: jnp.ndarray    # (V, D)
    steps: jnp.ndarray         # () int32


def init_vq_state(codebook: jnp.ndarray) -> VQTrainState:
    return VQTrainState(
        codebook=codebook,
        ema_count=jnp.ones((codebook.shape[0],), jnp.float32),
        ema_weight=jnp.asarray(codebook, jnp.float32),
        steps=jnp.zeros((), jnp.int32))


def quantize(hidden: jnp.ndarray, codebook: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> (quantized, ids), nearest codebook entry by L2."""
    h2 = jnp.sum(hidden * hidden, axis=-1, keepdims=True)
    c2 = jnp.sum(codebook * codebook, axis=-1)
    dist = h2 + c2[None, None] - 2.0 * jnp.einsum("btd,vd->btv", hidden,
                                                  codebook)
    ids = jnp.argmin(dist, axis=-1)
    return jnp.take(codebook, ids, axis=0), ids


def straight_through(hidden: jnp.ndarray,
                     quantized: jnp.ndarray) -> jnp.ndarray:
    """hidden + (quantized - hidden).detach() (modeling_whisper.py:1457)."""
    return hidden + jax.lax.stop_gradient(quantized - hidden)


def commit_loss(hidden: jnp.ndarray, quantized: jnp.ndarray,
                valid: jnp.ndarray, cfg: WhisperVQConfig) -> jnp.ndarray:
    m = valid.astype(hidden.dtype)
    per = jnp.mean((hidden - jax.lax.stop_gradient(quantized)) ** 2, axis=-1)
    loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)
    return cfg.quantize_loss_scale * cfg.quantize_commit_coefficient * loss


def ema_update(state: VQTrainState, hidden: jnp.ndarray, ids: jnp.ndarray,
               valid: jnp.ndarray, cfg: WhisperVQConfig,
               rng: Optional[jax.Array] = None,
               axis_name: Optional[str] = None) -> VQTrainState:
    """One EMA step (+ periodic dead-code restart when ``rng`` given)."""
    v = cfg.quantize_vocab_size
    decay = cfg.quantize_ema_decay
    hidden = jax.lax.stop_gradient(hidden.astype(jnp.float32))
    mask = valid.reshape(-1).astype(jnp.float32)
    flat = hidden.reshape(-1, hidden.shape[-1])
    enc = jax.nn.one_hot(ids.reshape(-1), v, dtype=jnp.float32)
    enc = enc * mask[:, None]
    n = jnp.sum(enc, axis=0)
    dw = enc.T @ flat
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        dw = jax.lax.psum(dw, axis_name)

    ema_count = state.ema_count * decay + (1.0 - decay) * n
    total = jnp.sum(ema_count)
    ema_count = (ema_count + 1e-5) / (total + v * 1e-5) * total
    ema_weight = state.ema_weight * decay + (1.0 - decay) * dw
    codebook = ema_weight / ema_count[:, None]
    steps = state.steps + 1
    new = VQTrainState(codebook=codebook, ema_count=ema_count,
                       ema_weight=ema_weight, steps=steps)

    if rng is None or cfg.quantize_restart_interval is None:
        return new
    do_restart = (steps % cfg.quantize_restart_interval) == 0
    return jax.lax.cond(
        do_restart,
        lambda s: _restart_dead_codes(s, flat, mask, cfg, rng),
        lambda s: s, new)


def _restart_dead_codes(state: VQTrainState, flat: jnp.ndarray,
                        mask: jnp.ndarray, cfg: WhisperVQConfig,
                        rng: jax.Array) -> VQTrainState:
    """Re-seed entries with ema_count below 0.1*decay^interval from live
    hidden states (modeling_whisper.py:1419-1454).  Sampling is from the
    local shard; under pjit the same rng on every replica picks the same
    positions of the (replicated-after-psum) statistics."""
    thr = 0.1 * (cfg.quantize_ema_decay ** cfg.quantize_restart_interval)
    dead = state.ema_count < thr                      # (V,)
    # sample len(V) candidate rows from valid positions
    probs = mask / jnp.maximum(jnp.sum(mask), 1.0)
    idx = jax.random.categorical(
        rng, jnp.log(probs + 1e-20)[None, :],
        shape=(state.codebook.shape[0],))
    cand = flat[idx]                                  # (V, D)
    codebook = jnp.where(dead[:, None], cand, state.codebook)
    ema_count = jnp.where(dead, 1.0, state.ema_count)
    ema_weight = jnp.where(dead[:, None], cand, state.ema_weight)
    return VQTrainState(codebook=codebook, ema_count=ema_count,
                        ema_weight=ema_weight, steps=state.steps)
