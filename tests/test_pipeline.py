"""End-to-end pipeline tests: offline token2wav, streaming session, and
streaming-vs-offline consistency (the reference repo's core ad-hoc test,
SURVEY.md §4)."""

import numpy as np
import pytest
import jax

from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig)


@pytest.fixture(scope="module")
def decoder():
    flow_cfg = tiny_flow_config()
    hift_cfg = tiny_hift_config()
    # tiny hift expects in_channels == flow output_size
    assert hift_cfg.in_channels == flow_cfg.output_size
    import jax.numpy as jnp
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    tok = jnp.zeros((1, 12), jnp.int32)
    valid = jnp.ones((1, 12), bool)
    pf = jnp.zeros((1, 0, flow_cfg.output_size))
    emb = jnp.zeros((1, flow_cfg.spk_embed_dim))
    flow_params = flow.init(jax.random.PRNGKey(0), tok, valid, pf, emb)
    hift = HiFTGenerator(hift_cfg)
    mel = jnp.zeros((1, 12, hift_cfg.in_channels))
    hift_params = hift.init(jax.random.PRNGKey(1), mel)
    pipe = PipelineConfig(block_size=4, mel_cache_len=6, max_token_len=16)
    return AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params, pipe)


def test_token2wav_offline(decoder):
    rng = np.random.RandomState(0)
    token = rng.randint(0, 64, (1, 20))
    wav = decoder.token2wav(token)
    frame = decoder.hift_cfg.total_upsample
    assert wav.shape == (1, 20 * decoder.ratio * frame)
    assert np.isfinite(wav).all()


def test_token2wav_with_prompt(decoder):
    rng = np.random.RandomState(1)
    p_tok = rng.randint(0, 64, (1, 4))
    p_feat = rng.randn(1, 4 * decoder.ratio,
                       decoder.flow_cfg.output_size).astype(np.float32) * 0.1
    emb = rng.randn(1, decoder.flow_cfg.spk_embed_dim).astype(np.float32)
    token = rng.randint(0, 64, (1, 12))
    wav = decoder.token2wav(token, p_tok, p_feat, emb)
    frame = decoder.hift_cfg.total_upsample
    assert wav.shape == (1, 12 * decoder.ratio * frame)


def test_streaming_total_length(decoder):
    rng = np.random.RandomState(2)
    token = rng.randint(0, 64, (1, 30))
    wav = decoder.stream_inference(token)
    frame = decoder.hift_cfg.total_upsample
    assert wav.shape == (1, 30 * decoder.ratio * frame)
    assert np.isfinite(wav).all()


def test_streaming_incremental_push(decoder):
    rng = np.random.RandomState(3)
    token = rng.randint(0, 64, (1, 30))
    sess = decoder.new_session(block_size=4)
    chunks = []
    for i in range(0, 30, 7):                       # feed irregular pieces
        chunks += list(sess.push(token[0, i:i + 7]))
    chunks += list(sess.finish())
    wav_inc = np.concatenate(chunks, axis=-1)
    wav_all = decoder.stream_inference(token, block_size=4)
    np.testing.assert_allclose(wav_inc, wav_all, atol=1e-5)


def test_streaming_prefix_is_stable(decoder):
    """The property that makes token_offset slicing valid
    (flow_inference.py:141): with chunk-causal attention, full left context
    and the deterministic CFM noise, re-running a LONGER window must
    reproduce the earlier mel prefix (up to fp reassociation)."""
    rng = np.random.RandomState(4)
    token = rng.randint(0, 64, (1, 21))
    mel1 = decoder._flow_mel(token[:, :13], np.zeros((1, 0), np.int32),
                             np.zeros((1, 0, decoder.flow_cfg.output_size),
                                      np.float32),
                             np.zeros((1, decoder.flow_cfg.spk_embed_dim),
                                      np.float32),
                             streaming=True, finalize=False)
    mel2 = decoder._flow_mel(token, np.zeros((1, 0), np.int32),
                             np.zeros((1, 0, decoder.flow_cfg.output_size),
                                      np.float32),
                             np.zeros((1, decoder.flow_cfg.spk_embed_dim),
                                      np.float32),
                             streaming=True, finalize=False)
    # Stability holds up to the last COMPLETE attention chunk: the final
    # partial chunk re-renders once it fills (same approximation as the
    # reference's emit-once streaming).
    chunk_tok = decoder.flow_cfg.encoder.static_chunk_size
    full_tok = ((13 - decoder.lookahead) // chunk_tok) * chunk_tok
    n = full_tok * decoder.ratio
    np.testing.assert_allclose(mel2[:, :n], mel1[:, :n], atol=2e-4)


def test_streaming_with_prompt_pad(decoder):
    """Prompt length not divisible by hop exercises prompt_token_pad
    (flow_inference.py:187)."""
    rng = np.random.RandomState(5)
    p_tok = rng.randint(0, 64, (1, 3))              # 3 % 4 != 0
    p_feat = rng.randn(1, 3 * decoder.ratio,
                       decoder.flow_cfg.output_size).astype(np.float32) * 0.1
    token = rng.randint(0, 64, (1, 24))
    wav = decoder.stream_inference(token, p_tok, p_feat)
    frame = decoder.hift_cfg.total_upsample
    assert wav.shape == (1, 24 * decoder.ratio * frame)


def test_bf16_compute_pipeline():
    """The serving dtype on TPU: whole pipeline under bfloat16 params."""
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)
    flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    fp = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1, 8), bool),
                   jnp.zeros((1, 0, flow_cfg.output_size)),
                   jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hp = hift.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 8, hift_cfg.in_channels)))
    dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp,
                       PipelineConfig(block_size=4, mel_cache_len=4,
                                      max_token_len=16),
                       compute_dtype=jnp.bfloat16)
    tok = np.random.RandomState(0).randint(0, 64, (1, 20))
    wav = dec.stream_inference(tok)
    assert wav.dtype == np.float32
    assert np.isfinite(wav).all()


def test_hybrid_estimator_f32_recipe():
    """bf16-encoder / f32-estimator serving recipe (the round-2 ablation's
    quality sweet spot): all three engines run, and the mel output is
    strictly closer to the f32 reference than all-bf16 is."""
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)
    flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    fp = flow.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1, 8), bool),
                   jnp.zeros((1, 0, flow_cfg.output_size)),
                   jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hp = hift.init(jax.random.PRNGKey(1),
                   jnp.zeros((1, 8, hift_cfg.in_channels)))
    pc = PipelineConfig(block_size=4, mel_cache_len=4, max_token_len=16)
    tok = np.random.RandomState(0).randint(0, flow_cfg.vocab_size, (1, 24))
    pt = np.zeros((1, 0), np.int64)
    pf = np.zeros((1, 0, flow_cfg.output_size), np.float32)
    emb = np.zeros((1, flow_cfg.spk_embed_dim), np.float32)

    mels = {}
    for name, kw in [("f32", {}),
                     ("bf16", dict(compute_dtype=jnp.bfloat16)),
                     ("hybrid", dict(compute_dtype=jnp.bfloat16,
                                     estimator_dtype=jnp.float32))]:
        dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp, pc, **kw)
        mels[name] = np.asarray(
            dec._flow_mel(tok, pt, pf, emb, streaming=False, finalize=True),
            np.float32)
        if name == "hybrid":
            # all three engines must run under the mixed param tree
            assert np.isfinite(dec.token2wav(tok)).all()
            assert np.isfinite(
                dec.device_stream_decoder().stream_decode(tok)).all()
            assert np.isfinite(
                dec.kv_stream_decoder(token_cap=40).stream_decode(tok)).all()

    ref = mels["f32"]
    scale = np.abs(ref).mean() + 1e-9
    err_bf16 = np.abs(mels["bf16"] - ref).mean() / scale
    err_hyb = np.abs(mels["hybrid"] - ref).mean() / scale
    # measured: 2.2% bf16 vs 0.53% hybrid on the tiny config (full-size
    # ablation: 2.9% vs 0.40%, BENCH_NOTES)
    assert err_hyb < err_bf16 / 2
    assert err_hyb < 0.02


def test_device_stream_matches_host_stream(decoder):
    """The fused on-device session must reproduce the host-mediated
    session sample for sample."""
    rng = np.random.RandomState(7)
    token = rng.randint(0, 64, (1, 30))
    wav_host = decoder.stream_inference(token, block_size=4,
                                        max_token_len=16)
    dev = decoder.device_stream_decoder(block_size=4, max_token_len=16)
    wav_dev = dev.stream_decode(token)
    assert wav_dev.shape == wav_host.shape
    np.testing.assert_allclose(wav_dev, wav_host, atol=2e-4)


def test_device_stream_with_prompt(decoder):
    rng = np.random.RandomState(8)
    p_tok = rng.randint(0, 64, (1, 3))
    p_feat = rng.randn(1, 3 * decoder.ratio,
                       decoder.flow_cfg.output_size).astype(np.float32) * 0.1
    token = rng.randint(0, 64, (1, 24))
    wav_host = decoder.stream_inference(token, p_tok, p_feat,
                                        block_size=4, max_token_len=16)
    dev = decoder.device_stream_decoder(p_tok, p_feat, block_size=4,
                                        max_token_len=16)
    wav_dev = dev.stream_decode(token)
    np.testing.assert_allclose(wav_dev, wav_host, atol=2e-4)


def test_device_stream_split_matches_fused(decoder):
    rng = np.random.RandomState(9)
    token = rng.randint(0, 64, (1, 28))
    dev = decoder.device_stream_decoder(block_size=4, max_token_len=16)
    wav_split = dev.stream_decode(token)
    wav_fused = dev.stream_decode(token, fused=True)
    np.testing.assert_allclose(wav_split, wav_fused, atol=1e-5)


def test_batched_device_stream_matches_single(decoder):
    """Lockstep batched decoding must equal per-stream decoding."""
    rng = np.random.RandomState(10)
    toks = rng.randint(0, 64, (2, 24))
    dev_b = decoder.device_stream_decoder(block_size=4, max_token_len=16,
                                          batch=2)
    wav_b = dev_b.stream_decode(toks)
    dev_1 = decoder.device_stream_decoder(block_size=4, max_token_len=16)
    for i in range(2):
        wav_i = dev_1.stream_decode(toks[i:i + 1])
        np.testing.assert_allclose(wav_b[i:i + 1], wav_i, atol=2e-4)


def test_device_stream_int16_output(decoder):
    rng = np.random.RandomState(11)
    token = rng.randint(0, 64, (1, 24))
    dev = decoder.device_stream_decoder(block_size=4, max_token_len=16)
    wav_f = dev.stream_decode(token)
    wav_i = dev.stream_decode(token, output="int16")
    assert wav_i.dtype == np.int16
    np.testing.assert_allclose(wav_i.astype(np.float32) / 32767.0, wav_f,
                               atol=1e-4)


def test_token2wav_batched(decoder):
    """Offline decode supports B > 1 (eval-throughput batching)."""
    rng = np.random.RandomState(12)
    toks = rng.randint(0, 64, (3, 12))
    wav_b = decoder.token2wav(toks)
    frame = decoder.hift_cfg.total_upsample
    assert wav_b.shape == (3, 12 * decoder.ratio * frame)
    wav_1 = decoder.token2wav(toks[1:2])
    np.testing.assert_allclose(wav_b[1:2], wav_1, atol=2e-4)


def test_device_stream_chunks_generator(decoder):
    from moss_speech_decoder_cosy_tpu.pipeline.device_session import (
        stream_chunks)
    rng = np.random.RandomState(13)
    token = rng.randint(0, 64, (1, 24))
    dev = decoder.device_stream_decoder(block_size=4, max_token_len=16)
    chunks = list(stream_chunks(dev, token))
    wav = np.concatenate(chunks, axis=-1)
    want = dev.stream_decode(token)
    np.testing.assert_allclose(wav, want, atol=2e-4)


def test_device_stream_production_knobs(decoder):
    """block_size=5 / max_token_len=40 (the reference defaults) with a
    window larger than the early stream."""
    rng = np.random.RandomState(14)
    token = rng.randint(0, 64, (1, 27))
    wav_host = decoder.stream_inference(token, block_size=5,
                                        max_token_len=40)
    dev = decoder.device_stream_decoder(block_size=5, max_token_len=40)
    wav_dev = dev.stream_decode(token)
    np.testing.assert_allclose(wav_dev, wav_host, atol=2e-4)


def test_program_flops_accounting():
    """program_flops (XLA cost analysis over each engine's own compiled
    programs, utils/flops.py): positive, grows with stream length, and
    the compute-once KV engine counts fewer FLOPs than the windowed
    re-decode engine at the production-shaped schedule."""
    import dataclasses
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig, CFMConfig)
    from moss_speech_decoder_cosy_tpu.utils.flops import (
        compiled_flops, mfu)

    cfg = dataclasses.replace(
        tiny_flow_config(), cfm=CFMConfig(n_timesteps=3,
                                          max_noise_len=2048))
    hcfg = tiny_hift_config()
    flow, hift = CausalMaskedDiffWithXvec(cfg), HiFTGenerator(hcfg)
    fp = jax.jit(flow.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), bool), jnp.zeros((1, 0, cfg.output_size)),
        jnp.zeros((1, cfg.spk_embed_dim)))
    hp = jax.jit(hift.init)(jax.random.PRNGKey(1),
                            jnp.zeros((1, 8, cfg.output_size)))
    dec = AudioDecoder(cfg, hcfg, fp, hp,
                       PipelineConfig(block_size=2, mel_cache_len=2,
                                      max_token_len=8))
    toks = np.random.RandomState(0).randint(
        0, cfg.vocab_size, (1, 21)).astype(np.int32)

    win = dec.device_stream_decoder()
    win.stream_decode(toks)
    f_win = win.program_flops(21)
    kv = dec.kv_stream_decoder(block_size=2, token_cap=64)
    kv.stream_decode(toks)
    f_kv = kv.program_flops(21)
    assert f_win > 0 and f_kv > 0
    # compute-once vs windowed re-decode
    assert f_kv < f_win, (f_kv, f_win)
    # more tokens -> more FLOPs (both engines)
    toks2 = np.random.RandomState(1).randint(
        0, cfg.vocab_size, (1, 41)).astype(np.int32)
    win.stream_decode(toks2)
    kv.stream_decode(toks2)
    assert win.program_flops(41) > f_win
    assert kv.program_flops(41) > f_kv

    # the exact-compiler claim on a known matmul
    f = jax.jit(lambda a, b: a @ b)
    got = compiled_flops(f, jnp.zeros((32, 16)), jnp.zeros((16, 8)))
    assert got == 2 * 32 * 16 * 8
    # mfu: None off-TPU (unknown peak), a ratio when peak is given
    assert mfu(1e12, 1.0) is None or 0 < mfu(1e12, 1.0) < 1
