"""Flow decoder tests: shapes, streaming semantics, padding invariance."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.models.flow import (
    CausalMaskedDiffWithXvec, UpsampleConformerEncoder,
    CausalConditionalDecoder)
from moss_speech_decoder_cosy_tpu.utils.config import tiny_flow_config


@pytest.fixture(scope="module")
def flow_setup():
    cfg = tiny_flow_config()
    m = CausalMaskedDiffWithXvec(cfg)
    rng = np.random.RandomState(0)
    t_tok = 16
    token = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, t_tok)))
    valid = jnp.ones((1, t_tok), bool)
    prompt_feat = jnp.zeros((1, 0, cfg.output_size))
    emb = jnp.asarray(rng.randn(1, cfg.spk_embed_dim).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), token, valid, prompt_feat, emb)
    return cfg, m, params, token, valid, prompt_feat, emb


def test_offline_inference_shape(flow_setup):
    cfg, m, params, token, valid, prompt_feat, emb = flow_setup
    mel = m.apply(params, token, valid, prompt_feat, emb,
                  streaming=False, finalize=True)
    assert mel.shape == (1, token.shape[1] * cfg.token_mel_ratio,
                         cfg.output_size)
    assert np.isfinite(np.asarray(mel)).all()


def test_streaming_chunk_shape(flow_setup):
    cfg, m, params, token, valid, prompt_feat, emb = flow_setup
    la = cfg.pre_lookahead_len
    mel = m.apply(params, token, valid, prompt_feat, emb,
                  streaming=True, finalize=False)
    assert mel.shape == (1, (token.shape[1] - la) * cfg.token_mel_ratio,
                         cfg.output_size)


def test_prompt_conditioning_changes_output(flow_setup):
    cfg, m, params, token, valid, _, emb = flow_setup
    mel0 = m.apply(params, token, valid,
                   jnp.zeros((1, 0, cfg.output_size)), emb)
    p = 4 * cfg.token_mel_ratio
    prompt = jnp.ones((1, p, cfg.output_size)) * 0.3
    mel1 = m.apply(params, token, valid, prompt, emb)
    assert not np.allclose(np.asarray(mel0[:, p:]), np.asarray(mel1[:, p:]))


def test_right_padding_invariance(flow_setup):
    """Padded (masked-out) tokens on the right must not change the valid
    region — this is what lets the pipeline bucket chunk shapes."""
    cfg, m, params, token, valid, prompt_feat, emb = flow_setup
    t = token.shape[1]
    mel = m.apply(params, token, valid, prompt_feat, emb,
                  streaming=True, finalize=True)
    pad = 6
    token_p = jnp.concatenate(
        [token, jnp.zeros((1, pad), token.dtype)], axis=1)
    valid_p = jnp.concatenate([valid, jnp.zeros((1, pad), bool)], axis=1)
    mel_p = m.apply(params, token_p, valid_p, prompt_feat, emb,
                    streaming=True, finalize=True)
    r = cfg.token_mel_ratio
    np.testing.assert_allclose(np.asarray(mel_p[:, : t * r]),
                               np.asarray(mel), atol=2e-4)


def test_cfm_loss_finite(flow_setup):
    cfg, m, params, token, valid, prompt_feat, emb = flow_setup
    t_mel = token.shape[1] * cfg.token_mel_ratio
    feat = jnp.asarray(np.random.RandomState(1)
                       .randn(1, t_mel, cfg.output_size).astype(np.float32))
    feat_valid = jnp.ones((1, t_mel), bool)
    loss = m.apply(params, token, valid, feat, feat_valid, emb,
                   jax.random.PRNGKey(1), method=m.loss,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))


def test_estimator_standalone_shapes():
    cfg = tiny_flow_config().estimator
    est = CausalConditionalDecoder(cfg)
    rng = np.random.RandomState(0)
    b, t, d = 2, 24, cfg.out_channels
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mu = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    spks = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cond = jnp.zeros((b, t, d))
    valid = jnp.ones((b, t), bool)
    tt = jnp.full((b,), 0.5)
    params = est.init(jax.random.PRNGKey(0), x, valid, mu, tt, spks, cond)
    out = est.apply(params, x, valid, mu, tt, spks, cond, streaming=True)
    assert out.shape == (b, t, d)
    assert np.isfinite(np.asarray(out)).all()


def test_v1_flow_path():
    """CosyVoice-v1 MaskedDiffWithXvec (non-causal estimator + length
    regulator + flow cache)."""
    import dataclasses
    from moss_speech_decoder_cosy_tpu.models.flow.flow_v1 import (
        MaskedDiffWithXvec)
    cfg = tiny_flow_config()
    cfg = dataclasses.replace(
        cfg, estimator=dataclasses.replace(cfg.estimator, causal=False),
        input_frame_rate=50)
    m = MaskedDiffWithXvec(cfg)
    rng = np.random.RandomState(0)
    token = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 10)))
    p_tok = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 4)))
    p_feat = jnp.asarray(
        rng.randn(1, 6, cfg.output_size).astype(np.float32) * 0.1)
    emb = jnp.asarray(rng.randn(1, cfg.spk_embed_dim).astype(np.float32))
    mel_len2 = 16
    params = m.init(jax.random.PRNGKey(0), token, p_tok, p_feat, emb,
                    mel_len2, method=m.inference)
    mel, cache = m.apply(params, token, p_tok, p_feat, emb, mel_len2,
                         method=m.inference)
    assert mel.shape == (1, mel_len2, cfg.output_size)
    # cache = prompt z/mu + last min(34, T) frames (flow_matching.py:61-74)
    assert cache.shape == (1, 6 + min(34, 6 + mel_len2),
                           cfg.output_size, 2)
    # second (grown) window consumes the cache
    token2 = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 24)))
    mel2, cache2 = m.apply(params, token2, p_tok, p_feat, emb, 40,
                           cache, method=m.inference)
    assert mel2.shape == (1, 40, cfg.output_size)
    assert np.isfinite(np.asarray(mel2)).all()


def test_v1_regulator_split_points():
    from moss_speech_decoder_cosy_tpu.models.flow.flow_v1 import (
        InterpolateRegulator)
    reg = InterpolateRegulator(8, n_layers=2)
    x1 = jnp.zeros((1, 4, 8))
    x2 = jnp.asarray(np.random.RandomState(0)
                     .randn(1, 50, 8).astype(np.float32))
    params = reg.init(jax.random.PRNGKey(0), x2, 20)
    out = reg.apply(params, x1, x2, 10, 100, method=reg.inference)
    assert out.shape == (1, 110, 8)


def test_dit_estimator_and_cfm():
    """cosyvoice1 DiT estimator family: shapes, mask correctness, CFM."""
    from moss_speech_decoder_cosy_tpu.models.flow.dit import (
        DiTEstimator, DiTConditionalCFM, tiny_dit_config)
    from moss_speech_decoder_cosy_tpu.utils.config import CFMConfig
    dit_cfg = tiny_dit_config()
    rng = np.random.RandomState(0)
    b, t, d = 2, 12, dit_cfg.io_channels
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mu = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    spks = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cond = jnp.zeros((b, t, d))
    valid = jnp.ones((b, t), bool)
    tt = jnp.full((b,), 0.3)
    est = DiTEstimator(dit_cfg)
    params = est.init(jax.random.PRNGKey(0), x, valid, mu, tt, spks, cond)
    out = est.apply(params, x, valid, mu, tt, spks, cond)
    assert out.shape == (b, t, d)
    # padded keys must not affect valid outputs
    pad = 4
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    mup = jnp.pad(mu, ((0, 0), (0, pad), (0, 0)))
    condp = jnp.pad(cond, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(valid, ((0, 0), (0, pad)))
    outp = est.apply(params, xp, vp, mup, tt, spks, condp)
    np.testing.assert_allclose(np.asarray(outp[:, :t]), np.asarray(out),
                               atol=2e-5)

    cfm = DiTConditionalCFM(CFMConfig(n_timesteps=3, max_noise_len=64),
                            dit_cfg)
    cparams = cfm.init(jax.random.PRNGKey(1), mu, valid, spks, cond)
    mel = cfm.apply(cparams, mu, valid, spks, cond)
    assert mel.shape == (b, t, d)
    assert np.isfinite(np.asarray(mel)).all()


def test_vdiffusion_sampler_matches_reference_loop():
    """VDiffusion nn.scan sampler == a step-by-step python re-evaluation of
    the reference v-diffusion update rule (stable/sampling.py:48-88),
    eta=0 deterministic."""
    import numpy as np
    from moss_speech_decoder_cosy_tpu.models.flow.vdiff import (
        VDiffusion, get_alphas_sigmas, sobol_times)
    from moss_speech_decoder_cosy_tpu.models.flow.dit import tiny_dit_config
    from moss_speech_decoder_cosy_tpu.models.flow.cfm import _fixed_noise

    dit = tiny_dit_config()
    m = VDiffusion(dit)
    rng = np.random.RandomState(0)
    b, t, d = 2, 12, dit.io_channels
    mu = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    spks = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cond = jnp.zeros((b, t, d))
    valid = jnp.ones((b, t), bool)
    params = m.init(jax.random.PRNGKey(0), mu, valid, spks, cond,
                    n_timesteps=2)
    steps = 4
    got = m.apply(params, mu, valid, spks, cond, n_timesteps=steps)

    # reference loop (sampling.py:48-88, eta=0)
    x = np.broadcast_to(_fixed_noise(16384, d)[:, :t], (b, t, d)).copy()
    ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float32)[:-1]
    alphas, sigmas = get_alphas_sigmas(ts)
    for i in range(steps):
        v = np.asarray(m.apply(
            params, jnp.asarray(x.astype(np.float32)), valid, mu,
            jnp.full((b,), ts[i]), spks, cond, method=m._v))
        pred = x * alphas[i] - v * sigmas[i]
        eps = x * sigmas[i] + v * alphas[i]
        if i < steps - 1:
            x = pred * alphas[i + 1] + eps * sigmas[i + 1]
    np.testing.assert_allclose(np.asarray(got), pred, atol=2e-4)

    s = sobol_times(16)
    assert s.shape == (16,) and (s >= 0).all() and (s < 1).all()


def test_gradtts_flow_variant():
    """GradTTSDiffWithXvec (flow_gradtts.py role): finite v-objective loss
    with grads, inference emits the post-prompt mel region at the
    22.05 kHz/256-hop length rule."""
    from moss_speech_decoder_cosy_tpu.models.flow.vdiff import (
        GradTTSDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.flow.dit import tiny_dit_config
    cfg = tiny_flow_config()
    dit = tiny_dit_config()
    m = GradTTSDiffWithXvec(cfg, dit)
    rng = np.random.RandomState(1)
    tok = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, 10)), jnp.int32)
    valid = jnp.ones((1, 10), bool)
    feat = jnp.asarray(rng.randn(1, 24, cfg.output_size).astype(np.float32))
    fvalid = jnp.ones((1, 24), bool)
    emb = jnp.asarray(rng.randn(1, cfg.spk_embed_dim).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), tok, valid, feat, fvalid, emb,
                    jax.random.PRNGKey(1), method=m.loss)

    loss, grads = jax.value_and_grad(
        lambda p: m.apply(p, tok, valid, feat, fvalid, emb,
                          jax.random.PRNGKey(2), method=m.loss))(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0)
    assert gnorm > 0

    assert m.mel_len(50) == int(50 / cfg.input_frame_rate * 22050 / 256)
    pf = jnp.asarray(rng.randn(1, 6, cfg.output_size).astype(np.float32))
    mel = m.apply(params, tok, valid, pf, emb, 20, 2, method=m.inference)
    assert mel.shape == (1, 14, cfg.output_size)
    assert np.isfinite(np.asarray(mel)).all()
