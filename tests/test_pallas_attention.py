"""Pallas flash chunk attention vs the XLA golden (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.ops.pallas_attention import (
    flash_chunk_attention, xla_chunk_attention)


@pytest.mark.parametrize("t,chunk", [(128, 0), (128, 50), (256, 50),
                                     (200, 64), (100, 0)])
def test_flash_matches_xla(t, chunk):
    rng = np.random.RandomState(0)
    b, h, dk = 1, 2, 64
    q = jnp.asarray(rng.randn(b, h, t, dk).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, h, t, dk).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, h, t, dk).astype(np.float32))
    got = flash_chunk_attention(q, k, v, chunk_size=chunk, interpret=True)
    want = xla_chunk_attention(q, k, v, chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


@pytest.mark.parametrize("t,chunk", [(128, 0), (200, 50)])
def test_flash_feature_last_matches_xla(t, chunk):
    """flash_chunk_attention_fl: heads-in-feature-axis entry (no
    transposes) == the (B,H,T,dk) XLA golden."""
    from moss_speech_decoder_cosy_tpu.ops.pallas_attention import (
        flash_chunk_attention_fl)
    rng = np.random.RandomState(2)
    b, h, dk = 2, 4, 64
    q4 = rng.randn(b, h, t, dk).astype(np.float32) * 0.3
    k4 = rng.randn(b, h, t, dk).astype(np.float32) * 0.3
    v4 = rng.randn(b, h, t, dk).astype(np.float32)
    to_fl = lambda a: jnp.asarray(
        a.transpose(0, 2, 1, 3).reshape(b, t, h * dk))
    got = flash_chunk_attention_fl(to_fl(q4), to_fl(k4), to_fl(v4),
                                   heads=h, chunk_size=chunk,
                                   interpret=True)
    want = xla_chunk_attention(jnp.asarray(q4), jnp.asarray(k4),
                               jnp.asarray(v4), chunk_size=chunk)
    want = np.asarray(want).transpose(0, 2, 1, 3).reshape(b, t, h * dk)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_flash_bf16():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
    got = flash_chunk_attention(q, k, v, chunk_size=50, interpret=True)
    want = xla_chunk_attention(q.astype(jnp.float32),
                               k.astype(jnp.float32),
                               v.astype(jnp.float32), 50)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05)


def test_estimator_flash_matches_default():
    """Flash-enabled estimator == masked-bias estimator on all-valid input."""
    import dataclasses
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalConditionalDecoder)
    from moss_speech_decoder_cosy_tpu.utils.config import tiny_flow_config
    cfg = tiny_flow_config().estimator
    cfg_flash = dataclasses.replace(cfg, use_flash_attention=True)
    rng = np.random.RandomState(0)
    b, t, d = 1, 32, cfg.out_channels
    x = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    mu = jnp.asarray(rng.randn(b, t, d).astype(np.float32))
    spks = jnp.asarray(rng.randn(b, d).astype(np.float32))
    cond = jnp.zeros((b, t, d))
    valid = jnp.ones((b, t), bool)
    tt = jnp.full((b,), 0.4)
    est = CausalConditionalDecoder(cfg)
    params = est.init(jax.random.PRNGKey(0), x, valid, mu, tt, spks, cond)
    est_f = CausalConditionalDecoder(cfg_flash)
    for streaming in (False, True):
        want = est.apply(params, x, valid, mu, tt, spks, cond,
                         streaming=streaming)
        got = est_f.apply(params, x, valid, mu, tt, spks, cond,
                          streaming=streaming)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, err_msg=str(streaming))
