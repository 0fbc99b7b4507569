"""Training step tests: loss decreases mechanics, grad accumulation,
and the data-parallel sharded step over a virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.training import (
    create_flow_train_state, make_flow_train_step, make_optimizer)
from moss_speech_decoder_cosy_tpu.parallel import make_mesh
from moss_speech_decoder_cosy_tpu.utils.config import tiny_flow_config


def _batch(cfg, b=8, tt=8, seed=0):
    rng = np.random.RandomState(seed)
    tm = tt * cfg.token_mel_ratio
    return {
        "speech_token": jnp.asarray(
            rng.randint(0, cfg.vocab_size, (b, tt)), jnp.int32),
        "token_valid": jnp.ones((b, tt), bool),
        "speech_feat": jnp.asarray(
            rng.randn(b, tm, cfg.output_size).astype(np.float32)),
        "feat_valid": jnp.ones((b, tm), bool),
        "embedding": jnp.asarray(
            rng.randn(b, cfg.spk_embed_dim).astype(np.float32)),
    }


def test_single_device_train_step():
    cfg = tiny_flow_config()
    model, state, opt = create_flow_train_state(cfg, jax.random.PRNGKey(0))
    step = make_flow_train_step(model, opt, donate=False)
    batch = _batch(cfg, b=2)
    state1, m1 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"]))
    assert int(state1.step) == 1
    state2, m2 = step(state1, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 2


def test_grad_accumulation_matches_full_batch():
    cfg = tiny_flow_config()
    model, state, opt = create_flow_train_state(cfg, jax.random.PRNGKey(0))
    batch = _batch(cfg, b=4)
    step1 = make_flow_train_step(model, opt, accum_steps=1, donate=False)
    step2 = make_flow_train_step(model, opt, accum_steps=2, donate=False)
    _, m1 = step1(state, batch, jax.random.PRNGKey(1))
    _, m2 = step2(state, batch, jax.random.PRNGKey(1))
    # not identical (different rng per microbatch) but the same scale
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))


def test_data_parallel_step_on_mesh():
    cfg = tiny_flow_config()
    mesh = make_mesh(8)
    model, state, opt = create_flow_train_state(cfg, jax.random.PRNGKey(0))
    jit_step = make_flow_train_step(model, opt, mesh=mesh, donate=False)
    state = jit_step.shard_state(state)
    step = jit_step(state)
    batch = _batch(cfg, b=8)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == 1
    # params remain replicated, some opt-state leaves sharded over data
    flat = jax.tree.leaves(state1.opt_state)
    assert any(
        getattr(x, "sharding", None) is not None
        and any(s is not None for s in getattr(x.sharding, "spec", ()))
        for x in flat if hasattr(x, "sharding"))


def test_distributed_helpers():
    from moss_speech_decoder_cosy_tpu.parallel import distributed as dist
    assert dist.host_shard(list(range(10)), 0, 2) == [0, 2, 4, 6, 8]
    assert dist.host_shard(list(range(10)), 1, 2) == [1, 3, 5, 7, 9]
    mesh = dist.global_mesh()
    assert mesh.shape["data"] == 8
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    g = dist.global_batch(batch, mesh)
    assert g["x"].shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
