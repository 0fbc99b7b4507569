"""High-level codec API tests (wav -> tokens -> wav, voice conversion)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.codec import (
    SpeechCodec, Prompt, calculate_rms, normalize_volume,
    find_loudest_segment)
from moss_speech_decoder_cosy_tpu.tokenizer import (
    WhisperVQEncoder, tiny_tokenizer_config)
from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.ops.melspec import (
    matcha_mel_spectrogram, kaldi_fbank)
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig)
import dataclasses


@pytest.fixture(scope="module")
def codec():
    tok_cfg = tiny_tokenizer_config()
    # tokens must fit the tiny flow vocab (64)
    tok_cfg = dataclasses.replace(tok_cfg, quantize_vocab_size=32)
    tok = WhisperVQEncoder(tok_cfg)
    mel0 = jnp.zeros((1, 16, tok_cfg.num_mel_bins))
    tok_params = tok.init(jax.random.PRNGKey(0), mel0, jnp.ones((1, 16), bool))

    flow_cfg = tiny_flow_config()
    hift_cfg = tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    flow_params = flow.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), bool), jnp.zeros((1, 0, flow_cfg.output_size)),
        jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hift_params = hift.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 8, hift_cfg.in_channels)))
    dec = AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params,
                       PipelineConfig(block_size=4, mel_cache_len=4,
                                      max_token_len=16))
    # tiny prompt mel: 16 bins, hop = tiny hift frame (48 samples @ "24k")
    mel_fn = lambda w: matcha_mel_spectrogram(  # noqa: E731
        w, n_fft=96, num_mels=flow_cfg.output_size, sampling_rate=24000,
        hop_size=48, win_size=96)
    # 1.28 s = the tiny ring capacity (64 positions * 2 * 160 samples),
    # token-aligned so batch and streaming segment at identical points
    return SpeechCodec(tok_cfg, tok_params, dec, prompt_mel_fn=mel_fn,
                       segment_seconds=1.28)


def test_encode_shapes(codec):
    rng = np.random.RandomState(0)
    wav = rng.randn(16000).astype(np.float32) * 0.1     # 1 s
    tokens = codec.encode(wav)
    # 16000 samples -> 100 mel frames -> 12 tokens (floor(100/8))
    assert tokens.shape == (1, 12)
    assert (tokens >= 0).all() and (tokens < 32).all()


def test_encode_multi_segment(codec):
    rng = np.random.RandomState(1)
    wav = rng.randn(40000).astype(np.float32) * 0.1     # 2.5 s, 3 segments
    tokens = codec.encode(wav)
    assert tokens.shape[1] >= 28


def test_encode_streaming_matches_batch_rate(codec):
    rng = np.random.RandomState(2)
    wav = rng.randn(12800).astype(np.float32) * 0.1     # 10 chunks of 80 ms
    toks = codec.encode_streaming(wav)
    assert toks.shape == (1, 10)


def _early_peak_wav(rng, n):
    """Wav whose global log-mel max sits in the first 80 ms, so the
    streaming frozen-first-block norm max equals the batch global max."""
    wav = rng.randn(n).astype(np.float32) * 0.05
    wav[:400] += np.sin(np.arange(400) * 0.3).astype(np.float32) * 0.8
    return wav


def test_encode_streaming_equals_batch(codec):
    """Codec-level golden contract: encode_streaming == encode token-for-
    token through the REAL chunked feature extraction (VERDICT item 4a;
    reference contract speech_tokenizer/utils.py:191-292 — which our
    boundary-exact streaming features actually achieve, unlike the
    reference's per-chunk padding)."""
    rng = np.random.RandomState(7)
    wav = _early_peak_wav(rng, 12800)                   # single segment
    batch = codec.encode(wav)
    stream = codec.encode_streaming(wav)
    assert np.array_equal(batch, stream), (batch, stream)
    # odd, non-token-aligned push sizes must not change the result
    stream2 = codec.encode_streaming(wav, chunk_samples=777)
    assert np.array_equal(batch, stream2)


def test_encode_streaming_equals_batch_multisegment(codec):
    """Long-session safety (VERDICT item 4b): the session re-segments when
    the KV ring would hit max_source_positions, matching the batch path's
    per-segment extraction exactly (identical per-segment content keeps
    the per-segment norm max equal to the streaming frozen max)."""
    rng = np.random.RandomState(8)
    block = _early_peak_wav(rng, codec.segment_samples)
    wav = np.tile(block, 3)                             # 3 full segments
    batch = codec.encode(wav)
    stream = codec.encode_streaming(wav)
    assert batch.shape[1] == 3 * (codec.segment_samples
                                  // codec.tok_cfg.samples_per_token)
    assert np.array_equal(batch, stream), (
        np.nonzero(batch != stream), batch.shape)


def test_roundtrip_decode(codec):
    rng = np.random.RandomState(3)
    wav = rng.randn(16000).astype(np.float32) * 0.1
    tokens = codec.encode(wav)
    out = codec.decode(tokens)
    frame = codec.decoder.hift_cfg.total_upsample
    assert out.shape == (1, tokens.shape[1] * codec.decoder.ratio * frame)


def test_voice_conversion_with_prompt(codec):
    rng = np.random.RandomState(4)
    src = rng.randn(12800).astype(np.float32) * 0.1
    prompt_16k = rng.randn(6400).astype(np.float32) * 0.1
    # tiny "24k" prompt at the tiny frame rate: token_len*4 mel frames of 48
    prompt_24k = rng.randn(9600).astype(np.float32) * 0.1
    prompt = codec.prepare_prompt(prompt_24k, prompt_16k)
    assert prompt.feat.shape[1] == codec.decoder.ratio * prompt.token.shape[1]
    out = codec.convert_voice(src, prompt)
    assert np.isfinite(out).all()


def test_normalize_volume():
    rng = np.random.RandomState(7)
    wav = rng.randn(4000).astype(np.float32) * 0.03
    out = normalize_volume(wav, 0.2)
    assert abs(calculate_rms(out) - 0.2) < 1e-6
    # silence passes through unscaled (ref :63-67 guards current_rms > 0)
    z = np.zeros(100, np.float32)
    np.testing.assert_array_equal(normalize_volume(z, 0.5), z)


def test_find_loudest_segment_picks_the_burst():
    sr = 16000
    rng = np.random.RandomState(8)
    wav = rng.randn(4 * sr).astype(np.float32) * 0.01
    wav[2 * sr: 3 * sr] += rng.randn(sr).astype(np.float32) * 0.5
    seg, (s, e) = find_loudest_segment(wav, sr, 1.0, return_bounds=True)
    assert e - s == sr and seg.shape == (sr,)
    # the chosen second is markedly louder than the background (the
    # smoothing span is segment/4, so the start can land anywhere inside
    # a uniform burst — assert on loudness, not exact bounds)
    assert calculate_rms(seg) > 5 * calculate_rms(wav[:sr])
    assert 2 * sr - len(seg) // 4 <= s <= 3 * sr, (s, e)
    # short wavs pass through whole (ref :82-83)
    short = wav[: sr // 2]
    out = find_loudest_segment(short, sr, 1.0)
    np.testing.assert_array_equal(out, short)


def test_find_loudest_segment_matches_reference_loop():
    """The cumsum-vectorised energies equal the reference's per-window
    python loop (gradio_voice_converter_unstreaming.py:85-116) and the
    same start index is selected."""
    sr = 8000
    rng = np.random.RandomState(9)
    wav = (rng.randn(3 * sr) * np.linspace(0.01, 0.4, 3 * sr)).astype(
        np.float32)
    segment_duration, window_size = 0.5, 0.1
    win = int(window_size * sr)
    hop = win // 4
    energies = []
    for i in range(0, len(wav) - win + 1, hop):
        w = wav[i: i + win].astype(np.float64)
        energies.append(np.sqrt(np.mean(w * w)))
    energies = np.array(energies)
    k = max(1, int(segment_duration / window_size))
    sm = np.convolve(energies, np.ones(k) / k, mode="valid")
    start = int(np.argmax(sm)) * hop
    end = min(start + int(segment_duration * sr), len(wav))
    if end == len(wav):
        start = max(0, end - int(segment_duration * sr))
    _, (s, e) = find_loudest_segment(wav, sr, segment_duration,
                                     window_size, return_bounds=True)
    assert (s, e) == (start, end)


def test_prepare_prompt_prep_knobs(codec):
    """pick_loudest_seconds + target_rms equal manual slice-then-normalize
    through the plain prepare_prompt (both sample rates cut to the same
    time window; ref demo wiring :398-408)."""
    rng = np.random.RandomState(10)
    p16 = rng.randn(6400).astype(np.float32) * 0.02
    p16[3200:4800] += rng.randn(1600).astype(np.float32) * 0.4
    p24 = np.repeat(p16, 3)[::2].astype(np.float32)   # same content @1.5x
    got = codec.prepare_prompt(p24, p16, pick_loudest_seconds=0.1,
                               target_rms=0.15)
    _, (s16, e16) = find_loudest_segment(p16, 16000, 0.1,
                                         return_bounds=True)
    m16 = normalize_volume(p16[s16:e16], 0.15)
    m24 = normalize_volume(
        p24[(s16 * 3) // 2: (s16 * 3) // 2 + ((e16 - s16) * 3) // 2], 0.15)
    want = codec.prepare_prompt(m24, m16)
    np.testing.assert_array_equal(got.token, want.token)
    np.testing.assert_array_equal(got.feat, want.feat)
    np.testing.assert_array_equal(got.embedding, want.embedding)


def test_kaldi_fbank_shapes():
    rng = np.random.RandomState(5)
    wav = jnp.asarray(rng.randn(1, 16000).astype(np.float32) * 0.1)
    fb = kaldi_fbank(wav)
    assert fb.shape == (1, 98, 80)                       # snip_edges frames
    assert np.isfinite(np.asarray(fb)).all()


def test_matcha_mel_shapes():
    rng = np.random.RandomState(6)
    wav = jnp.asarray(rng.randn(1, 24000).astype(np.float32) * 0.1)
    mel = matcha_mel_spectrogram(wav)
    assert mel.shape == (1, 50, 80)                      # hop 480 -> 50 fps
    assert np.isfinite(np.asarray(mel)).all()


def test_campplus_speaker_encoder_shapes():
    import dataclasses as dc
    from moss_speech_decoder_cosy_tpu.models.campplus import (
        CAMPPlus, SpeakerEncoder)
    m = CAMPPlus(embedding_size=16, growth_rate=4, bn_size=2,
                 init_channels=8, block_layers=(2, 2), block_dilations=(1, 2))
    feat = jnp.zeros((1, 50, 80))
    params = m.init(jax.random.PRNGKey(0), feat)
    enc = SpeakerEncoder(params, m)
    emb = enc(np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1)
    assert emb.shape == (1, 16)
    assert np.isfinite(emb).all()
