"""SPMD lane-sharded serving (pipeline/spmd_session.py): the mesh-sharded
lockstep decoder must produce EXACTLY the batched single-device KV
session's output (same math, partitioned), and its flow program must
contain no collectives (the zero-collective SPMD claim)."""

import dataclasses
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig, CFMConfig)


@pytest.fixture(scope="module")
def dec():
    cfg = dataclasses.replace(
        tiny_flow_config(),
        cfm=CFMConfig(n_timesteps=3, max_noise_len=2048))
    hcfg = tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(cfg)
    hift = HiFTGenerator(hcfg)
    tok0 = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(flow.init)(
        jax.random.PRNGKey(0), tok0, jnp.ones((1, 8), bool),
        jnp.zeros((1, 0, cfg.output_size)),
        jnp.zeros((1, cfg.spk_embed_dim)))
    hift_params = jax.jit(hift.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.output_size)))
    pipe = PipelineConfig(block_size=2, mel_cache_len=2, max_token_len=9)
    return AudioDecoder(cfg, hcfg, params, hift_params, pipe)


def _mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest forces an 8-device CPU mesh"
    return Mesh(np.array(devs[:8]), ("data",))


def _tokens(dec, rng, b, n):
    return rng.randint(0, dec.flow_cfg.vocab_size, (b, n)).astype(np.int32)


@pytest.mark.parametrize("batch,n_prompt", [(8, 0), (16, 3)])
def test_spmd_decode_matches_single_device(dec, batch, n_prompt):
    rng = np.random.RandomState(11)
    cfg = dec.flow_cfg
    r = cfg.token_mel_ratio
    ptok = rng.randint(0, cfg.vocab_size, (1, n_prompt)).astype(np.int32)
    pfeat = rng.randn(1, n_prompt * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    toks = _tokens(dec, rng, batch, 13)

    ref = dec.kv_stream_decoder(ptok, pfeat, emb, block_size=2,
                                token_cap=128, batch=batch)
    want = ref.stream_decode(toks)

    mesh = _mesh()
    spmd = dec.spmd_decoder(mesh, ptok, pfeat, emb, block_size=2,
                            token_cap=128, batch=batch)
    got = spmd.decode(toks)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_spmd_flow_program_has_no_collectives(dec):
    mesh = _mesh()
    spmd = dec.spmd_decoder(mesh, batch=8, block_size=2, token_cap=128)
    hlo = spmd.flow_hlo(13)
    bad = re.findall(r"all-reduce|all-gather|collective-permute|"
                     r"all-to-all|reduce-scatter", hlo)
    assert not bad, f"collectives in SPMD flow program: {set(bad)}"


def test_spmd_program_flops(dec):
    """Aggregate-MFU numerator for the mesh path: XLA cost analysis of
    the two compiled SPMD programs is positive and stable across calls
    (pure replay, no new device work)."""
    mesh = _mesh()
    spmd = dec.spmd_decoder(mesh, batch=8, block_size=2, token_cap=128)
    f1 = spmd.program_flops(13)
    assert f1 > 0
    assert spmd.program_flops(13) == f1


def test_spmd_int16_output(dec):
    rng = np.random.RandomState(3)
    mesh = _mesh()
    toks = _tokens(dec, rng, 8, 13)
    spmd = dec.spmd_decoder(mesh, batch=8, block_size=2, token_cap=128)
    pcm = spmd.decode(toks, output="int16")
    ref = dec.kv_stream_decoder(block_size=2, token_cap=128,
                                batch=8).stream_decode(toks,
                                                       output="int16")
    assert pcm.dtype == np.int16
    np.testing.assert_allclose(pcm.astype(np.int32),
                               ref.astype(np.int32), atol=1)
