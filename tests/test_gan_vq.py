"""GAN discriminators/losses, schedulers and VQ EMA training tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from moss_speech_decoder_cosy_tpu.training import gan as gan_mod
from moss_speech_decoder_cosy_tpu.training import vq as vq_mod
from moss_speech_decoder_cosy_tpu.training.train_step import (
    noam_hold_annealing, cosine_annealing, warmup_lr)
from moss_speech_decoder_cosy_tpu.tokenizer import tiny_tokenizer_config
import dataclasses


def test_discriminators_shapes():
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.3)
    yh = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.3)
    disc = gan_mod.MultipleDiscriminator()
    params = disc.init(jax.random.PRNGKey(0), y, yh)
    r, g, fr, fg = disc.apply(params, y, yh)
    assert len(r) == len(g) == 5 + 3                    # MPD + MRD
    assert len(fr) == len(fg) == 8
    for o in r + g:
        assert np.isfinite(np.asarray(o)).all()


def test_gan_losses():
    rng = np.random.RandomState(1)
    r = [jnp.asarray(rng.randn(2, 10).astype(np.float32))]
    g = [jnp.asarray(rng.randn(2, 10).astype(np.float32))]
    assert float(gan_mod.generator_loss(g)) > 0
    assert float(gan_mod.discriminator_loss(r, g)) > 0
    fm = gan_mod.feature_loss([[r[0]]], [[g[0]]])
    assert float(fm) > 0
    t = gan_mod.tpr_loss(r, g, tau=0.04)
    assert 0 <= float(t) <= 0.04 + 1e-6


def test_gan_train_steps_run():
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.utils.config import tiny_hift_config
    cfg = tiny_hift_config()
    genm = HiFTGenerator(cfg)
    t_mel = 8
    mel0 = jnp.zeros((1, t_mel, cfg.in_channels))
    gp = genm.init(jax.random.PRNGKey(0), mel0)
    disc = gan_mod.MultipleDiscriminator()
    wav_len = t_mel * cfg.total_upsample
    dp = disc.init(jax.random.PRNGKey(1), jnp.zeros((1, wav_len)),
                   jnp.zeros((1, wav_len)))
    gen_tx = optax.adam(1e-4)
    disc_tx = optax.adam(1e-4)
    mel_tf = [lambda w: w.reshape(w.shape[0], -1, 16).mean(-1)]  # toy "mel"
    disc_step, gen_step = gan_mod.make_gan_train_step(
        genm, disc, mel_tf, gen_tx, disc_tx)
    state = gan_mod.GanTrainState(
        step=jnp.zeros((), jnp.int32), gen_params=gp, disc_params=dp,
        gen_opt=gen_tx.init(gp), disc_opt=disc_tx.init(dp))
    rng = np.random.RandomState(2)
    batch = {
        "speech": jnp.asarray(rng.randn(1, wav_len).astype(np.float32) * .3),
        "speech_feat": jnp.asarray(
            rng.randn(1, t_mel, cfg.in_channels).astype(np.float32)),
        "pitch_feat": jnp.asarray(
            np.abs(rng.randn(1, t_mel)).astype(np.float32) * 100),
    }
    state, dm = disc_step(state, batch, jax.random.PRNGKey(3))
    state, gm = gen_step(state, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(dm["loss_disc"]))
    assert np.isfinite(float(gm["loss"]))
    assert int(state.step) == 1


def test_schedulers():
    s = warmup_lr(1e-3, 100)
    assert float(s(jnp.asarray(100))) <= 1e-3 + 1e-9
    n = noam_hold_annealing(1e-3, 10, 20, 100)
    assert abs(float(n(jnp.asarray(10))) - 1e-3) < 1e-9
    assert abs(float(n(jnp.asarray(25))) - 1e-3) < 1e-9
    assert float(n(jnp.asarray(90))) < 1e-3
    c = cosine_annealing(1e-3, 10, 100, min_lr=1e-5)
    assert abs(float(c(jnp.asarray(100))) - 1e-5) < 1e-8


def test_vq_ema_moves_codebook_and_restart():
    cfg = dataclasses.replace(tiny_tokenizer_config(),
                              quantize_restart_interval=2)
    rng = np.random.RandomState(0)
    d = cfg.d_model
    codebook = jnp.asarray(rng.randn(cfg.quantize_vocab_size, d)
                           .astype(np.float32))
    state = vq_mod.init_vq_state(codebook)
    hidden = jnp.asarray(rng.randn(2, 16, d).astype(np.float32))
    valid = jnp.ones((2, 16), bool)
    q, ids = vq_mod.quantize(hidden, state.codebook)
    loss = vq_mod.commit_loss(hidden, q, valid, cfg)
    assert float(loss) > 0
    st = vq_mod.straight_through(hidden, q)
    np.testing.assert_allclose(np.asarray(st), np.asarray(q), atol=1e-6)

    s1 = vq_mod.ema_update(state, hidden, ids, valid, cfg,
                           rng=jax.random.PRNGKey(0))
    assert int(s1.steps) == 1
    assert not np.allclose(np.asarray(s1.codebook), np.asarray(codebook))
    # step 2 triggers restart; dead codes (most of the 32) get re-seeded
    s2 = vq_mod.ema_update(s1, hidden, ids, valid, cfg,
                           rng=jax.random.PRNGKey(1))
    assert int(s2.steps) == 2
    assert np.isfinite(np.asarray(s2.codebook)).all()


def test_vq_ema_psum_matches_single_device():
    """psum over a 2-way data split == single-device update on the
    concatenated batch (the reference's all_reduce semantics)."""
    cfg = tiny_tokenizer_config()
    rng = np.random.RandomState(1)
    d = cfg.d_model
    codebook = jnp.asarray(rng.randn(cfg.quantize_vocab_size, d)
                           .astype(np.float32))
    hidden = jnp.asarray(rng.randn(2, 8, d).astype(np.float32))
    valid = jnp.ones((2, 8), bool)
    _, ids = vq_mod.quantize(hidden, codebook)

    single = vq_mod.ema_update(vq_mod.init_vq_state(codebook), hidden, ids,
                               valid, cfg)

    def shard_update(h, i, v):
        return vq_mod.ema_update(vq_mod.init_vq_state(codebook),
                                 h, i, v, cfg, axis_name="data")

    sharded = jax.pmap(shard_update, axis_name="data")(
        hidden[:, None], ids[:, None], valid[:, None])
    np.testing.assert_allclose(np.asarray(sharded.codebook[0]),
                               np.asarray(single.codebook), atol=1e-5)


def test_tokenizer_vq_training_roundtrip():
    """encode_train + commit loss + EMA update: gradients flow through the
    straight-through estimator into encoder params, and the EMA codebook
    moves (the reference's in-forward VQ training,
    modeling_whisper.py:1391-1465)."""
    from moss_speech_decoder_cosy_tpu.tokenizer import (
        WhisperVQEncoder, tiny_tokenizer_config)
    cfg = tiny_tokenizer_config()
    m = WhisperVQEncoder(cfg)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, 16, cfg.num_mel_bins).astype(np.float32))
    valid = jnp.ones((2, 16), bool)
    params = m.init(jax.random.PRNGKey(0), mel, valid)
    vq_state = vq_mod.init_vq_state(
        jnp.asarray(params["params"]["codebook"]))

    def loss_fn(p):
        hidden, q_st, ids, tv = m.apply(p, mel, valid, vq_state.codebook,
                                        method=m.encode_train)
        downstream = jnp.mean(q_st ** 2)          # placeholder ASR loss
        commit = vq_mod.commit_loss(hidden, jnp.take(vq_state.codebook, ids,
                                                     axis=0), tv, cfg)
        return downstream + commit, (hidden, ids, tv)

    (loss, (hidden, ids, tv)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    gnorm = float(optax.global_norm(grads))
    assert gnorm > 0                               # flows through ST
    new_state = vq_mod.ema_update(vq_state, hidden, ids, tv, cfg)
    assert not np.allclose(np.asarray(new_state.codebook),
                           np.asarray(vq_state.codebook))
