"""Continuous-batching audio serving layer (serving/audio_batcher.py):
concurrent async clients over a shared lane pool must each get EXACTLY the
audio an independent sequential KV session produces, and the HTTP streaming
front end must round-trip it."""

import asyncio
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig, CFMConfig)

HOP, RING = 2, 7      # ring coprime to hop -> one-hot writes on both paths


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


def _mk_stream(dec, rng, n_prompt, n_tokens):
    cfg = dec.flow_cfg
    r = cfg.token_mel_ratio
    ptok = rng.randint(0, cfg.vocab_size, (1, n_prompt)).astype(np.int32)
    pfeat = rng.randn(1, n_prompt * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    toks = rng.randint(0, cfg.vocab_size, (1, n_tokens)).astype(np.int32)
    return ptok, pfeat, emb, toks


def _sequential(dec, ptok, pfeat, emb, toks):
    kv = dec.kv_stream_decoder(ptok, pfeat, emb, block_size=HOP,
                               ring_tokens=RING, token_cap=128)
    return kv.stream_decode(toks, bulk_voc=False)


def test_engine_concurrent_clients_match_sequential(dec):
    """Three concurrent clients over TWO lanes (the third awaits a freed
    lane), incremental pushes — each stream equals its independent
    sequential session bit-for-bit."""
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        AudioBatchEngine)
    rng = np.random.RandomState(11)
    streams = [_mk_stream(dec, rng, p, n)
               for p, n in ((3, 14), (2, 11), (0, 9))]

    async def client(engine, ptok, pfeat, emb, toks, pieces):
        s = await engine.open(ptok if ptok.shape[1] else None,
                              pfeat if ptok.shape[1] else None, emb)
        cuts = np.linspace(0, toks.shape[1], pieces + 1).astype(int)
        for a, b in zip(cuts[:-1], cuts[1:]):
            await s.push(toks[:, a:b])
            await asyncio.sleep(0.003)
        await s.finish()
        chunks = [c async for c in s]
        return np.concatenate(chunks, axis=1)

    async def main():
        engine = AudioBatchEngine(dec, n_lanes=2, block_size=HOP,
                                  ring_tokens=RING, token_cap=64)
        outs = await asyncio.gather(*[
            client(engine, *st, pieces=3 + i)
            for i, st in enumerate(streams)])
        assert not engine._streams and engine.batcher.free_lanes == 2
        return outs

    outs = asyncio.run(main())
    for (ptok, pfeat, emb, toks), got in zip(streams, outs):
        want = _sequential(dec, ptok, pfeat, emb, toks)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_http_decode_stream_pcm16(dec):
    """Two concurrent POST /decode_stream requests sharing the lane pool;
    pcm16 body round-trips to the sequential session within 1 LSB."""
    from aiohttp.test_utils import TestServer
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        AudioBatchEngine, AudioBatcherHTTPServer, decode_stream_client)
    rng = np.random.RandomState(13)
    streams = [_mk_stream(dec, rng, p, n) for p, n in ((2, 12), (3, 9))]

    async def main():
        engine = AudioBatchEngine(dec, n_lanes=2, block_size=HOP,
                                  ring_tokens=RING, token_cap=64)
        srv = AudioBatcherHTTPServer(engine)
        server = TestServer(srv.app)
        await server.start_server()
        try:
            url = str(server.make_url("/decode_stream"))
            payloads = [{"tokens": t.tolist(),
                         "prompt_token": pt.tolist(),
                         "prompt_feat": pf.tolist(),
                         "embedding": e.tolist()}
                        for pt, pf, e, t in streams]
            return await asyncio.gather(*[
                decode_stream_client(url, p) for p in payloads])
        finally:
            await server.close()

    outs = asyncio.run(main())
    for (ptok, pfeat, emb, toks), got in zip(streams, outs):
        want = _sequential(dec, ptok, pfeat, emb, toks)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, np.clip(want, -1, 1),
                                   atol=1.5 / 32767.0)


def test_http_decode_stream_oggopus(dec):
    """Ogg Opus transport: container parses and decodes to the right
    length (opus is lossy — only structural checks)."""
    from moss_speech_decoder_cosy_tpu.serving.opus import available
    if not available():
        pytest.skip("libopus not present")
    from aiohttp.test_utils import TestServer
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        AudioBatchEngine, AudioBatcherHTTPServer, decode_stream_client)
    rng = np.random.RandomState(17)
    ptok, pfeat, emb, toks = _mk_stream(dec, rng, 2, 10)

    async def main():
        engine = AudioBatchEngine(dec, n_lanes=1, block_size=HOP,
                                  ring_tokens=RING, token_cap=64)
        srv = AudioBatcherHTTPServer(engine)
        server = TestServer(srv.app)
        await server.start_server()
        try:
            url = str(server.make_url("/decode_stream"))
            return await decode_stream_client(url, {
                "tokens": toks.tolist(), "prompt_token": ptok.tolist(),
                "prompt_feat": pfeat.tolist(), "embedding": emb.tolist(),
                "format": "oggopus"})
        finally:
            await server.close()

    got = asyncio.run(main())
    want = _sequential(dec, ptok, pfeat, emb, toks)
    # opus pads the tail to a full 20 ms frame and the reader drops the
    # pre-skip priming samples (both < one frame): length within 1 frame
    frame = dec.pipe_cfg.sample_rate * 20 // 1000
    assert want.shape[1] - frame <= got.shape[1] <= want.shape[1] + frame
    assert np.isfinite(got).all()


_BATCHER_BOOT_SCRIPT = r"""
import dataclasses
import numpy as np
import jax
# sitecustomize (PYTHONPATH=.axon_site) bakes JAX_PLATFORMS=axon into the
# config defaults of every python process — override AFTER import (same
# dance as conftest.py) or this subprocess tries to init the TPU relay.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig, CFMConfig)
from moss_speech_decoder_cosy_tpu.serving.boot import boot_warmup_batcher

cfg = dataclasses.replace(tiny_flow_config(),
                          cfm=CFMConfig(n_timesteps=3, max_noise_len=2048))
hcfg = tiny_hift_config()
flow, hift = CausalMaskedDiffWithXvec(cfg), HiFTGenerator(hcfg)
fp = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
               jnp.ones((1, 8), bool), jnp.zeros((1, 0, cfg.output_size)),
               jnp.zeros((1, cfg.spk_embed_dim)))
hp = hift.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.output_size)))
dec = AudioDecoder(cfg, hcfg, fp, hp,
                   PipelineConfig(block_size=2, mel_cache_len=2,
                                  max_token_len=9))

class P:
    token = np.arange(3, dtype=np.int32)[None] % cfg.vocab_size
    feat = np.zeros((1, 3 * cfg.token_mel_ratio, cfg.output_size),
                    np.float32)
    embedding = np.zeros((1, cfg.spk_embed_dim), np.float32)

b = dec.kv_batcher(n_lanes=2, ring_tokens=7, token_cap=64)
boot_warmup_batcher(b, prompt=P, verbose=False)
jits = {n: getattr(b, n) for n in
        ("_prefill", "_enc_hops", "_burst", "_admit_scatter",
         "_lane_slice", "_lane_clear", "_voc", "_spk")}
sizes = {n: j._cache_size() for n, j in jits.items()}
assert all(v >= 1 for v in sizes.values()), sizes

# first real requests (same prompt geometry + promptless, tail lengths
# inside the warmed range) compile NOTHING new
rng = np.random.RandomState(1)
for use_p, n in ((True, 12), (False, 9), (True, 10)):
    if use_p:
        lane = b.admit(P.token, P.feat, P.embedding)
    else:
        lane = b.admit(np.zeros((1, 0), np.int32),
                       np.zeros((1, 0, cfg.output_size), np.float32),
                       np.zeros((1, cfg.spk_embed_dim), np.float32))
    b.push(lane, rng.randint(0, cfg.vocab_size, (1, n)).astype(np.int32))
    b.finish(lane)
    got = 0
    while b._lanes[lane].active:
        for v in b.pump(max_iters=8).values():
            got += v.shape[1]
    assert got > 0
after = {n: j._cache_size() for n, j in jits.items()}
assert after == sizes, (sizes, after)
print("BATCHER_BOOT_OK", sizes)
"""


@pytest.mark.slow
def test_boot_warmup_batcher_no_new_compiles():
    """serving/boot.boot_warmup_batcher: after boot, real requests (with
    the warmed prompt geometry, promptless, any tail length) trigger NO
    new compilation on any of the batcher's per-instance jits.  Cold
    subprocess for pristine dispatch-cache counting."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               MOSS_TPU_CACHE=os.path.join(repo, ".jax_cache_cpu"),
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run([sys.executable, "-c", _BATCHER_BOOT_SCRIPT],
                       env=env, cwd=repo, capture_output=True, text=True,
                       timeout=1800)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    assert "BATCHER_BOOT_OK" in r.stdout, r.stdout


def test_http_bad_format_rejected(dec):
    from aiohttp.test_utils import TestServer
    import aiohttp
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        AudioBatchEngine, AudioBatcherHTTPServer)

    async def main():
        engine = AudioBatchEngine(dec, n_lanes=1, block_size=HOP,
                                  ring_tokens=RING, token_cap=64)
        srv = AudioBatcherHTTPServer(engine)
        server = TestServer(srv.app)
        await server.start_server()
        try:
            async with aiohttp.ClientSession() as s:
                async with s.post(str(server.make_url("/decode_stream")),
                                  json={"tokens": [1], "format": "mp3"}
                                  ) as resp:
                    return resp.status
        finally:
            await server.close()

    assert asyncio.run(main()) == 400
