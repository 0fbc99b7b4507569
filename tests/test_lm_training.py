"""LM training tests: packed-batch construction matches the per-sample
layout, label-smoothing loss, DPO properties, end-to-end train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from moss_speech_decoder_cosy_tpu.models.llm.speech_lm import (
    Qwen2SpeechLM, tiny_speech_lm_config)
from moss_speech_decoder_cosy_tpu.training import lm as lm_mod


def _setup():
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.zeros((1, 4), jnp.int32)
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, ps, jax.random.PRNGKey(1),
                    max_len=4)
    return cfg, m, params


def test_pack_lm_batch_layout():
    cfg, m, params = _setup()
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, 100, (2, 5)), jnp.int32)
    speech = jnp.asarray(rng.randint(0, cfg.speech_token_size, (2, 6)),
                         jnp.int32)
    text_len = jnp.asarray([3, 5])
    speech_len = jnp.asarray([6, 4])
    embeds, targets, mask = lm_mod.pack_lm_batch(
        m, params, text, text_len, speech, speech_len)
    l = 5 + 6 + 2
    assert embeds.shape == (2, l, cfg.backbone.hidden_size)
    t = np.asarray(targets)
    msk = np.asarray(mask)
    eos = cfg.speech_token_size
    # sample 0: tl=3, sl=6 -> loss positions 4..10, eos at 10
    assert msk[0, 4:11].all() and not msk[0, :4].any() \
        and not msk[0, 11:].any()
    np.testing.assert_array_equal(t[0, 4:10], np.asarray(speech)[0, :6])
    assert t[0, 10] == eos
    # sample 1: tl=5, sl=4 -> loss positions 6..10
    assert msk[1, 6:11].all() and not msk[1, :6].any()
    np.testing.assert_array_equal(t[1, 6:10], np.asarray(speech)[1, :4])
    assert t[1, 10] == eos


def test_label_smoothing_loss_perfect_prediction():
    v = 8
    targets = jnp.asarray([[1, 2, 3]])
    mask = jnp.ones((1, 3), bool)
    logits = jax.nn.one_hot(targets, v) * 100.0
    loss, acc = lm_mod.label_smoothing_loss(logits, targets, mask, 0.0)
    assert float(loss) < 1e-3
    assert float(acc) == 1.0
    loss_s, _ = lm_mod.label_smoothing_loss(logits, targets, mask, 0.1)
    assert float(loss_s) > float(loss)


def test_dpo_loss_prefers_chosen():
    better = lm_mod.dpo_loss(jnp.asarray([0.0]), jnp.asarray([-5.0]),
                             jnp.asarray([0.0]), jnp.asarray([0.0]),
                             beta=1.0)[0]
    worse = lm_mod.dpo_loss(jnp.asarray([-5.0]), jnp.asarray([0.0]),
                            jnp.asarray([0.0]), jnp.asarray([0.0]),
                            beta=1.0)[0]
    assert float(better) < float(worse)


def test_lm_train_step_reduces_loss():
    cfg, m, params = _setup()
    rng = np.random.RandomState(1)
    batch = {
        "text_token": jnp.asarray(rng.randint(0, 100, (2, 4)), jnp.int32),
        "text_token_len": jnp.asarray([4, 3]),
        "speech_token": jnp.asarray(
            rng.randint(0, cfg.speech_token_size, (2, 5)), jnp.int32),
        "speech_token_len": jnp.asarray([5, 4]),
    }
    tx = optax.adam(1e-2)
    step = lm_mod.make_lm_train_step(m, tx)
    opt_state = tx.init(params)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_sequence_logp_shapes():
    cfg, m, params = _setup()
    batch = {
        "text_token": jnp.zeros((2, 3), jnp.int32),
        "text_token_len": jnp.asarray([3, 2]),
        "speech_token": jnp.zeros((2, 4), jnp.int32),
        "speech_token_len": jnp.asarray([4, 3]),
    }
    lp = lm_mod.sequence_logp(m, params, batch)
    assert lp.shape == (2,)
    assert (np.asarray(lp) <= 0).all()
