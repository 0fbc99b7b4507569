"""Tensor parallelism (parallel/tp.py): megatron-split LM params on a 2-D
(data, model) mesh must (a) actually be sharded, (b) reproduce the
replicated forward/train step bit-for-nearly-bit, and (c) compile to a
program whose model-axis collectives GSPMD inserted (all-reduce in HLO)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from moss_speech_decoder_cosy_tpu.models.llm.speech_lm import (
    Qwen2SpeechLM, tiny_speech_lm_config)
from moss_speech_decoder_cosy_tpu.parallel import (
    make_tp_mesh, tp_shard_params, tp_specs)
from moss_speech_decoder_cosy_tpu.training.lm import (
    lm_loss, make_lm_train_step)


@pytest.fixture(scope="module")
def lm_setup():
    cfg = tiny_speech_lm_config()
    lm = Qwen2SpeechLM(cfg)
    rng = np.random.RandomState(0)
    b = 4
    text = rng.randint(0, cfg.backbone.vocab_size, (b, 6))
    speech = rng.randint(0, cfg.speech_token_size, (b, 5))
    batch = {
        "text_token": jnp.asarray(text, jnp.int32),
        "text_token_len": jnp.full((b,), 6, jnp.int32),
        "speech_token": jnp.asarray(speech, jnp.int32),
        "speech_token_len": jnp.full((b,), 5, jnp.int32),
    }
    params = lm.init(jax.random.PRNGKey(0),
                     jnp.asarray(text[:1], jnp.int32),
                     jnp.asarray(speech[:1], jnp.int32),
                     jax.random.PRNGKey(1), 4)
    return cfg, lm, params, batch


def test_tp_specs_split_the_right_dims(lm_setup):
    _, _, params, _ = lm_setup
    mesh = make_tp_mesh(8, tp=2)
    specs = tp_specs(params, mesh)
    pt = params["params"]["llm"]["layers_0"]
    st = specs["params"]["llm"]["layers_0"]
    assert st["q_proj"]["kernel"].spec == P(None, "model")
    assert st["q_proj"]["bias"].spec == P("model")
    assert st["o_proj"]["kernel"].spec == P("model", None)
    assert st["gate_proj"]["kernel"].spec == P(None, "model")
    assert st["down_proj"]["kernel"].spec == P("model", None)
    # norms / embeddings replicated
    assert st["input_layernorm"]["scale"].spec == P()
    assert specs["params"]["llm"]["embed_tokens"]["embedding"].spec == P()
    # placement halves the addressable shard of a column-parallel kernel
    sharded = jax.device_put(pt["q_proj"]["kernel"],
                             st["q_proj"]["kernel"])
    shard_shape = sharded.addressable_shards[0].data.shape
    assert shard_shape[-1] * 2 == pt["q_proj"]["kernel"].shape[-1]


def test_tp_forward_matches_replicated(lm_setup):
    cfg, lm, params, batch = lm_setup
    mesh = make_tp_mesh(8, tp=2)
    want, _ = jax.jit(lambda p: lm_loss(lm, p, batch))(params)

    tp_params = tp_shard_params(params, mesh)
    bsh = NamedSharding(mesh, P("data"))
    tp_batch = jax.device_put(batch, bsh)
    fn = jax.jit(lambda p, bt: lm_loss(lm, p, bt)[0])
    got = fn(tp_params, tp_batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # GSPMD must have inserted the megatron psum over the model axis
    hlo = fn.lower(tp_params, tp_batch).compile().as_text()
    assert "all-reduce" in hlo


def test_tp_train_step_matches_replicated(lm_setup):
    cfg, lm, params, batch = lm_setup
    mesh = make_tp_mesh(8, tp=2)
    tx = optax.adam(1e-3)
    step = make_lm_train_step(lm, tx)

    p_ref, o_ref, m_ref = step(params, tx.init(params), batch)

    tp_params = tp_shard_params(params, mesh)
    opt0 = tx.init(params)
    tp_opt = jax.device_put(opt0, tp_specs(opt0, mesh))
    bsh = NamedSharding(mesh, P("data"))
    p_tp, o_tp, m_tp = step(tp_params, tp_opt,
                            jax.device_put(batch, bsh))
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)
    # updated params stay sharded (no silent replication blow-up) and match
    k_tp = p_tp["params"]["llm"]["layers_0"]["q_proj"]["kernel"]
    assert (k_tp.addressable_shards[0].data.shape[-1] * 2
            == k_tp.shape[-1])
    k_ref = p_ref["params"]["llm"]["layers_0"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(k_tp), np.asarray(k_ref),
                               rtol=1e-4, atol=1e-6)


def test_tp_stepwise_decode_matches_replicated(lm_setup):
    """The SERVING path under TP: prefill + forced single-token decode
    steps (KV cache threaded through) must reproduce the replicated
    logits — TP is only useful if the AR decode loop runs on it."""
    import flax.linen as nn

    cfg, lm, params, _ = lm_setup
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randint(0, cfg.backbone.vocab_size, (1, 5)),
                       jnp.int32)
    pspeech = jnp.asarray(rng.randint(0, cfg.speech_token_size, (1, 3)),
                          jnp.int32)
    forced = jnp.asarray(rng.randint(0, cfg.speech_token_size, (3,)),
                         jnp.int32)

    def run(mdl):
        emb = mdl.prompt_embeds(text, pspeech)
        h, cache = mdl.prefill(emb)
        logits = [mdl.llm_decoder(h[:, -1])]
        for i in range(forced.shape[0]):
            e = mdl.speech_embedding(forced[i][None, None])
            h, cache = mdl.llm.forward_embeds(e, cache)
            logits.append(mdl.llm_decoder(h[:, -1]))
        return jnp.stack(logits)

    fn = jax.jit(lambda p: nn.apply(run, lm)(p))
    want = fn(params)
    mesh = make_tp_mesh(8, tp=2)
    got = fn(tp_shard_params(params, mesh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_tp_transformer_lm_v1_matches_replicated():
    """TP generalizes to the wenet-named v1 TransformerLM stack
    (linear_q/k/v + w_1/w_2 splits): teacher-forced logits match."""
    from moss_speech_decoder_cosy_tpu.models.llm.transformer_lm import (
        TransformerLM, tiny_transformer_lm_config)

    cfg = tiny_transformer_lm_config()
    m = TransformerLM(cfg)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randint(0, cfg.text_token_size, (1, 5)))
    text_valid = jnp.ones((1, 5), bool)
    speech = jnp.asarray(rng.randint(0, cfg.speech_token_size, (1, 7)))
    speech_valid = jnp.ones((1, 7), bool)
    params = m.init(jax.random.PRNGKey(0), text, text_valid, speech,
                    speech_valid)
    fn = jax.jit(lambda p: m.apply(p, text, text_valid, speech,
                                   speech_valid)[0])
    want = fn(params)

    mesh = make_tp_mesh(8, tp=2)
    specs = tp_specs(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    n_split = sum(1 for _, s in flat if s.spec != P())
    assert n_split > 0, "no TransformerLM leaf matched the TP rules"
    got = fn(jax.device_put(params, specs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-5)


def test_tp_indivisible_dims_fall_back_to_replicated(lm_setup):
    """tp=3 divides none of the tiny config's widths (kv 16, ffn 64,
    hidden 32) — every megatron leaf must replicate rather than error."""
    _, _, params, _ = lm_setup
    mesh = make_tp_mesh(6, tp=3)
    specs = tp_specs(params, mesh)
    st = specs["params"]["llm"]["layers_0"]
    for mod in ("q_proj", "k_proj", "o_proj", "gate_proj", "down_proj"):
        assert st[mod]["kernel"].spec == P(), mod
    # and a divisible tp still splits (sanity vs the same tree)
    st2 = tp_specs(params, make_tp_mesh(8, tp=4))["params"]["llm"][
        "layers_0"]
    assert st2["gate_proj"]["kernel"].spec == P(None, "model")
