"""Eval harness tests: wav IO, Seed-TTS driver end-to-end on tiny models,
RTF measurement."""

import json
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.eval import (
    read_wav, write_wav, load_benchmark_data, run_seed_tts_benchmark,
    measure_decode_rtf, measure_encode_rtf)
from moss_speech_decoder_cosy_tpu.eval.audio_io import resample


def test_wav_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 100, 24000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 24000)
    y, sr = read_wav(p)
    assert sr == 24000
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_resample_lengths():
    x = np.zeros(24000, np.float32)
    assert len(resample(x, 24000, 16000)) == 16000


@pytest.fixture(scope="module")
def tiny_codec():
    import dataclasses
    from moss_speech_decoder_cosy_tpu.codec import SpeechCodec
    from moss_speech_decoder_cosy_tpu.tokenizer import (
        WhisperVQEncoder, tiny_tokenizer_config)
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.ops.melspec import (
        matcha_mel_spectrogram)
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)

    tok_cfg = dataclasses.replace(tiny_tokenizer_config(),
                                  quantize_vocab_size=32)
    tok = WhisperVQEncoder(tok_cfg)
    tok_params = tok.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 16, tok_cfg.num_mel_bins)),
                          jnp.ones((1, 16), bool))
    flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    fp = flow.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1, 8), bool),
                   jnp.zeros((1, 0, flow_cfg.output_size)),
                   jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hp = hift.init(jax.random.PRNGKey(2),
                   jnp.zeros((1, 8, hift_cfg.in_channels)))
    dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp,
                       PipelineConfig(block_size=4, mel_cache_len=4,
                                      max_token_len=16))
    mel_fn = lambda w: matcha_mel_spectrogram(  # noqa: E731
        w, n_fft=96, num_mels=flow_cfg.output_size, sampling_rate=24000,
        hop_size=48, win_size=96)
    return SpeechCodec(tok_cfg, tok_params, dec, prompt_mel_fn=mel_fn,
                       segment_seconds=1.0)


def test_seed_tts_driver(tmp_path, tiny_codec):
    rng = np.random.RandomState(0)
    bench = tmp_path / "bench" / "en"
    for name in ("s1", "s2"):
        d = bench / name
        d.mkdir(parents=True)
        write_wav(str(d / "prompt.wav"),
                  rng.randn(8000).astype(np.float32) * 0.1, 16000)
        write_wav(str(d / "label.wav"),
                  rng.randn(16000).astype(np.float32) * 0.1, 16000)
        (d / "prompt.txt").write_text("prompt text")
        (d / "label.txt").write_text("label text")

    data = load_benchmark_data(str(tmp_path / "bench"), "en")
    assert len(data) == 2

    save = tmp_path / "out"
    # tiny pipeline is at "24k"=tiny frames; keep sample_rate consistent
    stats = run_seed_tts_benchmark(tiny_codec, str(tmp_path / "bench"),
                                   str(save), lang="en", block_size=4,
                                   max_token_len=16)
    assert stats["ok"] == 2, stats
    for name in ("s1", "s2"):
        assert (save / "en" / name / "pred.wav").exists()
        meta = json.loads((save / "en" / name / "metadata.json").read_text())
        assert meta["num_tokens"] > 0
    # resume: second run skips everything
    stats2 = run_seed_tts_benchmark(tiny_codec, str(tmp_path / "bench"),
                                    str(save), lang="en")
    assert stats2["skipped"] == 2


def test_rtf_measurement(tiny_codec):
    rng = np.random.RandomState(1)
    tokens = [rng.randint(0, 32, (1, 20)) for _ in range(2)]
    res = measure_decode_rtf(tiny_codec.decoder, tokens, warmup=1,
                             streaming=True, block_size=4)
    assert res["rtf"] > 0 and "first_chunk_ms" in res
    wavs = [rng.randn(12800).astype(np.float32) * 0.1 for _ in range(2)]
    res2 = measure_encode_rtf(tiny_codec, wavs, warmup=1)
    assert res2["rtf"] > 0


def test_tokenizer_rtf_adapter(tiny_codec):
    """External-tokenizer hook (the cal_RTF.py glm4/dac/mimi comparison
    role): any wav->tokens callable benches under the same protocol."""
    from moss_speech_decoder_cosy_tpu.eval.rtf import measure_tokenizer_rtf
    rng = np.random.RandomState(2)
    wavs = [rng.randn(12800).astype(np.float32) * 0.1 for _ in range(2)]
    res = measure_tokenizer_rtf(tiny_codec.encode, wavs, 16000,
                                warmup=1, name="glm4")
    assert res["rtf"] > 0 and res["tokenizer"] == "glm4"
    assert abs(res["audio_s"] - 2 * 0.8) < 1e-6
