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


def test_wer_and_similarity_metrics():
    from moss_speech_decoder_cosy_tpu.eval.score import (
        edit_distance, word_error_rate, speaker_similarity)
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    assert word_error_rate("abc", "abc") == 0.0
    assert word_error_rate([1, 2, 3, 4], [1, 9, 3, 4]) == 0.25
    assert word_error_rate([], []) == 0.0
    assert word_error_rate([], [1]) == 1.0
    a = np.array([1.0, 0.0, 0.0])
    assert abs(speaker_similarity(a, 3 * a) - 1.0) < 1e-12
    assert abs(speaker_similarity(a, [0.0, 1.0, 0.0])) < 1e-12
    assert speaker_similarity(a, np.zeros(3)) == 0.0


def _fake_units(wav):
    """Deterministic wav -> unit sequence: identical wavs give identical
    units, perturbations change them."""
    w = np.asarray(wav, np.float64).reshape(-1)
    chunks = w[: len(w) // 100 * 100].reshape(-1, 100)
    return tuple((np.abs(chunks).mean(1) * 1e4).astype(np.int64) % 97)


def _fake_embed(wav):
    w = np.asarray(wav, np.float64).reshape(-1)
    n = len(w) // 4 * 4
    return w[:n].reshape(4, -1).std(axis=1)


def test_score_seed_tts_run_plumbing(tmp_path):
    """Hermetic scoring plumbing: perfect-copy pred -> WER 0 / SIM ~= 1;
    corrupted pred scores strictly worse.  result.json merges per lang
    (the reference's OUTPUT_DIR/result.json, evaluate_moss_decoder.sh:
    85-94)."""
    from moss_speech_decoder_cosy_tpu.eval.score import (
        score_seed_tts_run, write_result_json)
    rng = np.random.RandomState(3)
    bench = tmp_path / "bench" / "en"
    save = tmp_path / "out" / "en"
    prompt = rng.randn(4800).astype(np.float32) * 0.1
    for name, corrupt in (("good", False), ("bad", True)):
        b = bench / name
        b.mkdir(parents=True)
        label = rng.randn(9600).astype(np.float32) * 0.1
        write_wav(str(b / "prompt.wav"), prompt, 24000)
        write_wav(str(b / "label.wav"), label, 24000)
        s = save / name
        s.mkdir(parents=True)
        pred = (rng.randn(9600).astype(np.float32) * 0.3 if corrupt
                else label)
        pwav = (rng.randn(4800).astype(np.float32) * 0.3 if corrupt
                else prompt)
        write_wav(str(s / "pred.wav"), pred, 24000)
        write_wav(str(s / "prompt_concat_pred.wav"),
                  np.concatenate([pwav, pred]), 24000)

    res = score_seed_tts_run(str(tmp_path / "out"), "en",
                             transcribe_fn=_fake_units,
                             speaker_fn=_fake_embed,
                             benchmark_dir=str(tmp_path / "bench"))
    assert res["n"] == 2
    ps = res["per_sample"]
    assert ps["good"]["wer"] == 0.0
    assert ps["good"]["sim"] > 0.999          # prompt recovered from concat
    assert ps["bad"]["wer"] > 0.0
    assert ps["bad"]["sim"] < ps["good"]["sim"]
    assert res["wer"] > 0.0                   # corpus WER pools both

    # without benchmark_dir the prompt comes from prompt_concat_pred.wav
    res2 = score_seed_tts_run(str(tmp_path / "out"), "en",
                              speaker_fn=_fake_embed)
    assert res2["per_sample"]["good"]["sim"] > 0.999
    assert res2["wer"] is None                # no reference for WER

    path = write_result_json(str(tmp_path / "out"), {"en": res})
    write_result_json(str(tmp_path / "out"), {"zh": {"wer": 0.1,
                                                     "sim": 0.9, "n": 1}})
    merged = json.loads((tmp_path / "out" / "result.json").read_text())
    assert set(merged) == {"en", "zh"} and path.endswith("result.json")


def test_benchmark_scores_end_to_end(tmp_path, tiny_codec):
    """run_seed_tts_benchmark(score=True) with the repo's OWN scoring
    models: WhisperASR over the codec's tokens for WER, a CAM++
    SpeakerEncoder for SIM; result.json lands next to the run."""
    from moss_speech_decoder_cosy_tpu.tokenizer.asr_decoder import (
        PostVQEncoder, WhisperVQDecoder, WhisperASR)
    from moss_speech_decoder_cosy_tpu.models.campplus import (
        CAMPPlus, SpeakerEncoder)

    cfg = tiny_codec.tok_cfg
    rng = np.random.RandomState(4)
    codebook = np.asarray(
        tiny_codec.tok_params["params"]["codebook"], np.float32)
    seg_t = 8
    post = PostVQEncoder(cfg)
    post_params = post.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, seg_t, cfg.d_model)),
                            jnp.ones((1, seg_t), bool))
    dec = WhisperVQDecoder(cfg)
    dec_params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
                          jnp.ones((1, 8), bool),
                          jnp.zeros((1, seg_t, cfg.d_model)),
                          jnp.ones((1, seg_t), bool))
    asr = WhisperASR(cfg, post_params, dec_params, codebook,
                     bos_id=1, eos_id=2, max_len=8, segment_tokens=seg_t)

    emb_dim = tiny_codec.decoder.flow_cfg.spk_embed_dim
    cam = CAMPPlus(embedding_size=emb_dim, growth_rate=4, init_channels=8,
                   block_layers=(2,), block_dilations=(1,))
    cam_params = cam.init(jax.random.PRNGKey(2), jnp.zeros((1, 20, 80)))
    tiny_codec.speaker_encoder = SpeakerEncoder(cam_params, cam)
    try:
        bench = tmp_path / "bench" / "en"
        for name in ("s1",):
            d = bench / name
            d.mkdir(parents=True)
            write_wav(str(d / "prompt.wav"),
                      rng.randn(8000).astype(np.float32) * 0.1, 16000)
            write_wav(str(d / "label.wav"),
                      rng.randn(16000).astype(np.float32) * 0.1, 16000)
        save = tmp_path / "out"
        stats = run_seed_tts_benchmark(
            tiny_codec, str(tmp_path / "bench"), str(save), lang="en",
            block_size=4, max_token_len=16, score=True, asr=asr)
        assert stats["ok"] == 1, stats
        sc = stats["scores"]
        assert sc["wer"] is not None and sc["wer"] >= 0.0
        assert sc["sim"] is not None and -1.0 <= sc["sim"] <= 1.0
        merged = json.loads((save / "result.json").read_text())
        assert merged["en"]["n"] == 1
    finally:
        tiny_codec.speaker_encoder = None


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
