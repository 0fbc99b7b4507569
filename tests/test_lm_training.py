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


def test_dpo_train_step_improves_margin():
    """make_dpo_train_step: the chosen/rejected reward margin grows after
    a few steps on a fixed pair (policy moves toward chosen)."""
    cfg, m, params = _setup()
    rng = np.random.RandomState(2)
    batch = {
        "text_token": jnp.asarray(rng.randint(0, 100, (2, 4)), jnp.int32),
        "text_token_len": jnp.asarray([4, 3]),
        "chosen_token": jnp.asarray(
            rng.randint(0, cfg.speech_token_size, (2, 5)), jnp.int32),
        "chosen_token_len": jnp.asarray([5, 4]),
        "rejected_token": jnp.asarray(
            rng.randint(0, cfg.speech_token_size, (2, 5)), jnp.int32),
        "rejected_token_len": jnp.asarray([5, 4]),
    }
    tx = optax.adam(5e-3)
    step = lm_mod.make_dpo_train_step(m, tx, beta=0.5)
    ref = jax.tree.map(lambda x: x, params)
    opt_state = tx.init(params)
    margins = []
    for _ in range(5):
        params, opt_state, metrics = step(params, ref, opt_state, batch)
        margins.append(float(metrics["reward_margin"]))
    assert np.isfinite(margins).all()
    assert margins[-1] > margins[0]
    assert float(metrics["reward_acc"]) >= 0.5


def test_train_lm_dpo_entry_smoke(tmp_path):
    """bin/train.py --model lm_dpo end to end on a tiny jsonl dataset."""
    import argparse
    import json as _json
    from moss_speech_decoder_cosy_tpu.bin import train as train_mod
    rng = np.random.RandomState(3)
    rows = [{"text_token": rng.randint(0, 100, 4).tolist(),
             "chosen_token": rng.randint(0, 32, 6).tolist(),
             "rejected_token": rng.randint(0, 32, 6).tolist()}
            for _ in range(4)]
    jp = tmp_path / "dpo.jsonl"
    with open(jp, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    lst = tmp_path / "shards.txt"
    lst.write_text(str(jp) + "\n")
    args = argparse.Namespace(
        model="lm_dpo", config="tiny", train_data=str(lst),
        model_dir=str(tmp_path / "out"), checkpoint=None,
        ref_checkpoint=None, epochs=1, accum_grad=1, batch_size=2,
        peak_lr=1e-3, warmup_steps=2, save_per_step=2, max_steps=2,
        use_mesh=False, cv_data=None, cv_batches=1, sample_at_save=False,
        dpo_beta=0.1)
    logger = train_mod.MetricLogger(str(tmp_path / "logs"))
    train_mod.train_lm(args, logger, dpo=True)
    import os
    assert os.path.isdir(tmp_path / "out" / "lm_step_2")


def test_train_lm_dpo_entry_tp2(tmp_path):
    """--tp 2: the same entry on a (4, 2) data x model mesh — params
    megatron-sharded, ref params sharded, batches on the data axis
    (batch 4 divides data=4; the indivisible fallback replicates)."""
    import argparse
    import json as _json
    from moss_speech_decoder_cosy_tpu.bin import train as train_mod
    rng = np.random.RandomState(4)
    rows = [{"text_token": rng.randint(0, 100, 4).tolist(),
             "chosen_token": rng.randint(0, 32, 6).tolist(),
             "rejected_token": rng.randint(0, 32, 6).tolist()}
            for _ in range(8)]
    jp = tmp_path / "dpo.jsonl"
    with open(jp, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    lst = tmp_path / "shards.txt"
    lst.write_text(str(jp) + "\n")
    args = argparse.Namespace(
        model="lm_dpo", config="tiny", train_data=str(lst),
        model_dir=str(tmp_path / "out"), checkpoint=None,
        ref_checkpoint=None, epochs=1, accum_grad=1, batch_size=4,
        peak_lr=1e-3, warmup_steps=2, save_per_step=2, max_steps=2,
        use_mesh=False, cv_data=None, cv_batches=1, sample_at_save=False,
        dpo_beta=0.1, tp=2)
    logger = train_mod.MetricLogger(str(tmp_path / "logs"))
    train_mod.train_lm(args, logger, dpo=True)
    import os
    assert os.path.isdir(tmp_path / "out" / "lm_step_2")
