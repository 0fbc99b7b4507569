"""Data-parallel training step for the flow model.

Maps the reference trainer (cosyvoice/bin/train.py + utils/executor.py +
utils/train_utils.py) onto SPMD JAX:

- DDP grad all-reduce      -> XLA psum inserted by jit over the data mesh
- DeepSpeed ZeRO-2         -> optimizer-state sharding (parallel.zero_sharding)
- grad accumulation        -> ``accum_steps`` via lax.scan over microbatches
- AMP (autocast bf16)      -> compute-dtype cast inside the loss
- clip_grad_norm + WarmupLR-> optax chain
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
import flax

from ..models.flow import CausalMaskedDiffWithXvec
from ..utils.config import FlowConfig
from ..parallel.mesh import replicated, batch_sharded, zero_sharding


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def warmup_lr(peak_lr: float, warmup_steps: int) -> optax.Schedule:
    """WarmupLR (cosyvoice/utils/scheduler.py:27-75):
    lr * warmup^0.5 * min(step^-0.5, step * warmup^-1.5)."""
    def sched(step):
        s = jnp.maximum(step.astype(jnp.float32), 1.0)
        w = float(warmup_steps)
        return peak_lr * (w ** 0.5) * jnp.minimum(s ** -0.5, s * w ** -1.5)
    return sched


def noam_hold_annealing(peak_lr: float, warmup_steps: int, hold_steps: int,
                        max_steps: int, decay_rate: float = 0.5,
                        min_lr: float = 0.0) -> optax.Schedule:
    """NoamHoldAnnealing (scheduler.py:433-441,623-680, NeMo/SqueezeFormer):
    linear warmup -> hold -> noam decay with exponent ``decay_rate``."""
    def sched(step):
        s = step.astype(jnp.float32)
        warm = peak_lr * jnp.minimum(s / max(warmup_steps, 1), 1.0)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        t_hold = jnp.maximum(1.0, (s - hold_steps) ** decay_rate)
        decay = jnp.maximum(peak_lr * t_warm / t_hold, min_lr)
        in_hold = s <= warmup_steps + hold_steps
        return jnp.where(s <= warmup_steps, warm,
                         jnp.where(in_hold, peak_lr, decay))
    return sched


def cosine_annealing(peak_lr: float, warmup_steps: int, max_steps: int,
                     min_lr: float = 0.0) -> optax.Schedule:
    """CosineAnnealing with linear warmup (scheduler.py:497-534)."""
    def sched(step):
        s = step.astype(jnp.float32)
        warm = peak_lr * jnp.minimum(s / max(warmup_steps, 1), 1.0)
        frac = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1),
                        0.0, 1.0)
        cos = min_lr + (peak_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
        return jnp.where(s <= warmup_steps, warm, cos)
    return sched


def constant_lr(lr: float) -> optax.Schedule:
    return lambda step: jnp.asarray(lr, jnp.float32)


def make_optimizer(peak_lr: float = 1e-3, warmup_steps: int = 2500,
                   clip_norm: float = 5.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(warmup_lr(peak_lr, warmup_steps)),
    )


def create_flow_train_state(cfg: FlowConfig, rng: jax.Array,
                            optimizer: Optional[
                                optax.GradientTransformation] = None,
                            ) -> tuple[CausalMaskedDiffWithXvec, TrainState,
                                       optax.GradientTransformation]:
    model = CausalMaskedDiffWithXvec(cfg)
    tok = jnp.zeros((1, 8), jnp.int32)
    valid = jnp.ones((1, 8), bool)
    pf = jnp.zeros((1, 0, cfg.output_size))
    emb = jnp.zeros((1, cfg.spk_embed_dim))
    params = model.init(rng, tok, valid, pf, emb)
    optimizer = optimizer or make_optimizer()
    opt_state = optimizer.init(params)
    return model, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=opt_state), optimizer


def make_flow_train_step(model: CausalMaskedDiffWithXvec,
                         optimizer: optax.GradientTransformation,
                         mesh=None, accum_steps: int = 1,
                         donate: bool = True) -> Callable:
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    batch: dict with speech_token (B,Tt) i32, token_valid (B,Tt) bool,
    speech_feat (B,Tm,D) f32, feat_valid (B,Tm) bool, embedding (B,E) f32.
    With a mesh, the batch is sharded over the data axis and optimizer
    state uses ZeRO-style sharding.
    """

    def loss_fn(params, batch, rng):
        drop, cfm = jax.random.split(rng)
        loss = model.apply(
            params, batch["speech_token"], batch["token_valid"],
            batch["speech_feat"], batch["feat_valid"], batch["embedding"],
            cfm, method=model.loss, rngs={"dropout": drop})
        return loss

    def step(state: TrainState, batch, rng) -> tuple[TrainState, dict]:
        if accum_steps > 1:
            def micro(carry, mb):
                g_acc, l_acc, i = carry
                mb_rng = jax.random.fold_in(rng, i)
                l, g = jax.value_and_grad(loss_fn)(state.params, mb, mb_rng)
                return (jax.tree.map(jnp.add, g_acc, g), l_acc + l,
                        i + 1), ()
            zeros = jax.tree.map(jnp.zeros_like, state.params)
            micro_batch = jax.tree.map(
                lambda x: x.reshape((accum_steps, -1) + x.shape[1:]), batch)
            (grads, loss, _), _ = jax.lax.scan(
                micro, (zeros, jnp.zeros(()), jnp.zeros((), jnp.int32)),
                micro_batch)
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, batch, rng)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state),
                {"loss": loss, "grad_norm": gnorm})

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    bshard = batch_sharded(mesh)

    def state_shardings(state):
        return TrainState(
            step=repl,
            params=jax.tree.map(lambda _: repl, state.params),
            opt_state=zero_sharding(state.opt_state, mesh))

    def shard_state(state: TrainState) -> TrainState:
        sh = state_shardings(state)
        return jax.tree.map(jax.device_put, state, sh)

    def jit_step(state):
        sh = state_shardings(state)
        batch_sh = {k: bshard for k in ("speech_token", "token_valid",
                                        "speech_feat", "feat_valid",
                                        "embedding")}
        return jax.jit(step,
                       in_shardings=(sh, batch_sh, repl),
                       out_shardings=(sh, repl),
                       donate_argnums=(0,) if donate else ())

    jit_step.shard_state = shard_state
    return jit_step
