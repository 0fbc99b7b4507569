"""Golden numerical parity against the reference's OWN torch modules.

Round-1 checkpoint tests were self-round-trips (synthesize torch layout
from flax, convert back); they could not catch wrong name prefixes, wrong
weight-norm storage, or transposed semantics.  These tests instantiate the
reference torch modules from /root/reference/GLM_modules with small
configs, push their real ``state_dict()`` through utils/checkpoint.py, and
assert numerical parity of the outputs.

Randomness policy: where the reference draws runtime noise (NSF initial
phase + source noise), both sides are monkeypatched to zero so the
deterministic compute path is compared exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_shim

ref_shim.install()

import torch  # noqa: E402

from moss_speech_decoder_cosy_tpu.utils import checkpoint as ckpt  # noqa: E402
from moss_speech_decoder_cosy_tpu.utils.config import (  # noqa: E402
    HiFTConfig, tiny_hift_config)


def _sd(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _max_abs(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


# =====================================================================
# HiFT vocoder (cosyvoice/hifigan/generator.py:392-582)
# =====================================================================
@pytest.fixture(scope="module")
def hift_pair():
    """(torch HiFTGenerator, flax HiFTGenerator, converted params, cfg)."""
    from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as TorchF0

    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator

    cfg = tiny_hift_config()
    torch.manual_seed(0)
    ref = TorchHiFT(
        in_channels=cfg.in_channels,
        base_channels=cfg.base_channels,
        nb_harmonics=cfg.nb_harmonics,
        sampling_rate=cfg.sampling_rate,
        nsf_alpha=cfg.nsf_alpha,
        nsf_sigma=cfg.nsf_sigma,
        nsf_voiced_threshold=cfg.nsf_voiced_threshold,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        istft_params={"n_fft": cfg.istft_n_fft, "hop_len": cfg.istft_hop_len},
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in
                                 cfg.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(cfg.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[
            list(d) for d in cfg.source_resblock_dilation_sizes],
        lrelu_slope=cfg.lrelu_slope,
        audio_limit=cfg.audio_limit,
        f0_predictor=TorchF0(num_class=1, in_channels=cfg.in_channels,
                             cond_channels=cfg.f0_cond_channels),
    ).eval()

    params, unused = ckpt.convert_hift_state_dict(_sd(ref), cfg)
    # buffers that are not learned parameters on our side
    assert set(unused) <= {"stft_window"}, unused
    mine = HiFTGenerator(cfg)
    return ref, mine, params, cfg


def test_hift_f0_predictor_golden(hift_pair):
    ref, mine, params, cfg = hift_pair
    rng = np.random.RandomState(1)
    mel = rng.randn(2, 11, cfg.in_channels).astype(np.float32)
    with torch.no_grad():
        want = ref.f0_predictor(torch.from_numpy(mel).transpose(1, 2)).numpy()
    got = mine.apply(params, jnp.asarray(mel),
                     method=lambda m, x: m.f0_predictor(x))
    assert _max_abs(want, got) < 1e-5


def test_hift_decode_golden(hift_pair):
    """Same (mel, source) -> waveform: exercises conv_pre/ups/source branch/
    Snake resblocks/conv_post/iSTFT and every weight-norm conversion."""
    ref, mine, params, cfg = hift_pair
    rng = np.random.RandomState(2)
    t = 12
    mel = rng.randn(1, t, cfg.in_channels).astype(np.float32)
    s = (0.1 * rng.randn(1, t * cfg.total_upsample, 1)).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(mel).transpose(1, 2),
                          torch.from_numpy(s).transpose(1, 2)).numpy()
    got = np.asarray(mine.apply(
        params, jnp.asarray(mel), jnp.asarray(s),
        method=lambda m, x, src: m.decode(x, src)))
    assert want.shape == got.shape
    assert _max_abs(want, got) < 2e-4
    assert float(np.mean(np.abs(want - got))) < 1e-5


def test_hift_inference_golden_zero_noise(hift_pair, monkeypatch):
    """Full mel->wav inference with NSF randomness zeroed on both sides:
    covers f0 -> SineGen2 phase integration -> l_linear -> decode."""
    ref, mine, params, cfg = hift_pair
    rng = np.random.RandomState(3)
    t = 12
    mel = rng.randn(1, t, cfg.in_channels).astype(np.float32)

    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.zeros(
            *a, **{kk: vv for kk, vv in k.items() if kk != "device"}))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    with torch.no_grad():
        want_wav, want_s = ref.inference(torch.from_numpy(mel).transpose(1, 2))

    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    with jax.disable_jit():
        got_wav, got_s = mine.apply(params, jnp.asarray(mel))
    assert _max_abs(want_s.transpose(1, 2).numpy(), got_s) < 2e-4
    assert _max_abs(want_wav.numpy(), got_wav) < 2e-3
    assert float(np.mean(np.abs(want_wav.numpy() - np.asarray(got_wav)))) \
        < 1e-4


def test_hift_cache_source_golden(hift_pair, monkeypatch):
    """cache_source overwrite contract (generator.py:578-580)."""
    ref, mine, params, cfg = hift_pair
    rng = np.random.RandomState(4)
    t = 10
    mel = rng.randn(1, t, cfg.in_channels).astype(np.float32)
    n_cache = 2 * cfg.total_upsample
    cache = (0.05 * rng.randn(1, n_cache, 1)).astype(np.float32)

    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.zeros(
            *a, **{kk: vv for kk, vv in k.items() if kk != "device"}))
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    with torch.no_grad():
        want_wav, _ = ref.inference(
            torch.from_numpy(mel).transpose(1, 2),
            cache_source=torch.from_numpy(cache).transpose(1, 2))

    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    with jax.disable_jit():
        got_wav, _ = mine.apply(params, jnp.asarray(mel),
                                jnp.asarray(cache))
    assert _max_abs(want_wav.numpy(), got_wav) < 2e-3


def test_hift_22050_source_module_golden(monkeypatch):
    """22.05 kHz selects the original SourceModuleHnNSF (generator.py:429);
    parity for the full-rate phase integration variant."""
    from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as TorchF0
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator

    cfg = HiFTConfig(
        in_channels=16, base_channels=32, nb_harmonics=4,
        sampling_rate=22050,
        upsample_rates=(4, 3), upsample_kernel_sizes=(8, 5),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        source_resblock_kernel_sizes=(5, 5),
        source_resblock_dilation_sizes=((1, 3), (1, 3)),
        f0_cond_channels=24)
    torch.manual_seed(5)
    ref = TorchHiFT(
        in_channels=16, base_channels=32, nb_harmonics=4,
        sampling_rate=22050, upsample_rates=[4, 3],
        upsample_kernel_sizes=[8, 5],
        istft_params={"n_fft": 16, "hop_len": 4},
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        source_resblock_kernel_sizes=[5, 5],
        source_resblock_dilation_sizes=[[1, 3], [1, 3]],
        f0_predictor=TorchF0(num_class=1, in_channels=16,
                             cond_channels=24)).eval()
    params, unused = ckpt.convert_hift_state_dict(_sd(ref), cfg)
    assert set(unused) <= {"stft_window"}, unused
    mine = HiFTGenerator(cfg)

    rng = np.random.RandomState(6)
    mel = rng.randn(1, 9, 16).astype(np.float32)

    class _ZeroUniform:
        def __init__(self, *a, **k):
            pass

        def sample(self, sample_shape=()):
            return torch.zeros(*sample_shape)

    monkeypatch.setattr(torch.distributions.uniform, "Uniform", _ZeroUniform)
    import cosyvoice.hifigan.generator as refgen
    monkeypatch.setattr(refgen, "Uniform", _ZeroUniform)
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    with torch.no_grad():
        want_wav, _ = ref.inference(torch.from_numpy(mel).transpose(1, 2))

    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    with jax.disable_jit():
        got_wav, _ = mine.apply(params, jnp.asarray(mel))
    assert _max_abs(want_wav.numpy(), got_wav) < 2e-3


# =====================================================================
# WhisperVQ tokenizer (speech_tokenizer/modeling_whisper.py:1151-1486)
# =====================================================================
@pytest.fixture(scope="module")
def tokenizer_pair():
    from speech_tokenizer.configuration_whisper import WhisperVQConfig
    from speech_tokenizer.modeling_whisper import (
        WhisperVQEncoder as TorchEncoder)
    from moss_speech_decoder_cosy_tpu.tokenizer import (
        WhisperVQEncoder, tiny_tokenizer_config)

    cfg = tiny_tokenizer_config()
    tcfg = WhisperVQConfig(
        num_mel_bins=cfg.num_mel_bins,
        d_model=cfg.d_model,
        encoder_attention_heads=cfg.attention_heads,
        encoder_ffn_dim=cfg.ffn_dim,
        encoder_layers=cfg.encoder_layers,
        max_source_positions=cfg.max_source_positions,
        pooling_kernel_size=cfg.pooling_kernel_size,
        pooling_type="avg",
        pooling_position=cfg.pooling_position,
        quantize_position=cfg.quantize_position,
        quantize_vocab_size=cfg.quantize_vocab_size,
        quantize_encoder_only=True,
        encoder_causal_attention=True,
        encoder_causal_convolution=True,
        quantize_ema_decay=0.99,
    )
    tcfg._attn_implementation = "sdpa"
    torch.manual_seed(7)
    ref = TorchEncoder(tcfg).eval()
    # give the codebook a non-degenerate spread (post_init leaves Embedding
    # at std 0.02 which is fine, but make ties impossible)
    with torch.no_grad():
        ref.codebook.weight.copy_(torch.randn_like(ref.codebook.weight))

    params, unused = ckpt.convert_tokenizer_state_dict(_sd(ref), cfg)
    # post-VQ positions + EMA buffers are not used by the token path
    assert set(unused) <= {"embed_positions2.weight", "ema_count",
                           "ema_weight"}, unused
    mine = WhisperVQEncoder(cfg)
    return ref, mine, params, cfg


def test_tokenizer_tokens_golden(tokenizer_pair):
    ref, mine, params, cfg = tokenizer_pair
    rng = np.random.RandomState(8)
    t_mel = 48                                # post-conv 24, tokens 6
    mel = rng.randn(1, t_mel, cfg.num_mel_bins).astype(np.float32)
    with torch.no_grad():
        out = ref(input_features=torch.from_numpy(mel).transpose(1, 2),
                  attention_mask=torch.ones(1, t_mel, dtype=torch.long))
    want = out.quantized_token_ids.numpy()
    ids, token_valid = mine.apply(params, jnp.asarray(mel),
                                  jnp.ones((1, t_mel), bool))
    assert np.array_equal(want, np.asarray(ids)), (want, np.asarray(ids))
    assert bool(np.all(np.asarray(token_valid)))


def test_tokenizer_streaming_tokens_golden(tokenizer_pair):
    """Streaming step() against the torch BATCH forward — the reference's
    own equivalence contract (speech_tokenizer/utils.py:191-292)."""
    ref, mine, params, cfg = tokenizer_pair
    rng = np.random.RandomState(9)
    t_mel = 48
    chunk = 16                                # 8 post-conv = 2 tokens
    mel = rng.randn(1, t_mel, cfg.num_mel_bins).astype(np.float32)
    with torch.no_grad():
        out = ref(input_features=torch.from_numpy(mel).transpose(1, 2),
                  attention_mask=torch.ones(1, t_mel, dtype=torch.long))
    want = out.quantized_token_ids.numpy()

    state = mine.apply(params, 1, method=lambda m, b: m.init_state(b))
    got = []
    for i in range(0, t_mel, chunk):
        ids, state = mine.apply(params, jnp.asarray(mel[:, i:i + chunk]),
                                state,
                                method=lambda m, x, s: m.step(x, s))
        got.append(np.asarray(ids))
    got = np.concatenate(got, axis=1)
    assert np.array_equal(want, got), (want, got)


# =====================================================================
# Flow stack: CausalMaskedDiffWithXvec (cosyvoice/flow/flow.py:151-283)
# through UpsampleConformerEncoder + CausalConditionalDecoder + CFM
# =====================================================================
def _make_flow_pair(channels, macaron, use_cnn, cnn_norm="layer_norm"):
    """Build matched (torch flow, flax flow, converted params, cfg)."""
    from omegaconf import DictConfig
    from cosyvoice.flow.flow import CausalMaskedDiffWithXvec as TorchFlow
    from cosyvoice.transformer.upsample_encoder import (
        UpsampleConformerEncoder as TorchEncoder)
    from cosyvoice.flow.decoder import (
        CausalConditionalDecoder as TorchEstimator)
    from cosyvoice.flow.flow_matching import (
        CausalConditionalCFM as TorchCFM)

    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.utils.config import (
        FlowConfig, EncoderConfig, EstimatorConfig, CFMConfig)

    torch.manual_seed(11)
    t_enc = TorchEncoder(
        input_size=512, output_size=512, attention_heads=4,
        linear_units=128, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", macaron_style=macaron,
        use_cnn_module=use_cnn, cnn_module_kernel=7,
        cnn_module_norm=cnn_norm, static_chunk_size=25,
        upsample_stride=4)
    if use_cnn and cnn_norm == "batch_norm":
        # fresh BN stats are (0, 1) — randomize so parity exercises the
        # running-stat math, as a trained checkpoint would
        g = torch.Generator().manual_seed(5)
        for name, buf in t_enc.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.3)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    t_est = TorchEstimator(
        in_channels=320, out_channels=80, channels=list(channels),
        dropout=0.0, attention_head_dim=16, n_blocks=1,
        num_mid_blocks=1, num_heads=2, act_fn="gelu",
        static_chunk_size=50)
    cfm_params = DictConfig({
        "sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
        "training_cfg_rate": 0.2, "inference_cfg_rate": 0.7,
        "reg_loss_type": "l1"})
    t_cfm = TorchCFM(in_channels=240, cfm_params=cfm_params, n_spks=1,
                     spk_emb_dim=80, estimator=t_est)
    ref = TorchFlow(
        input_size=512, output_size=80, spk_embed_dim=192, vocab_size=64,
        input_frame_rate=12, token_mel_ratio=4, pre_lookahead_len=3,
        encoder=t_enc, decoder=t_cfm).eval()

    cfg = FlowConfig(
        vocab_size=64, input_size=512, output_size=80, spk_embed_dim=192,
        input_frame_rate=12.5, token_mel_ratio=4,
        encoder=EncoderConfig(
            input_size=512, output_size=512, attention_heads=4,
            linear_units=128, num_blocks=2, num_up_blocks=4,
            static_chunk_size=25, upsample_stride=4, dropout_rate=0.0,
            macaron_style=macaron, use_cnn_module=use_cnn,
            cnn_module_kernel=7, cnn_module_norm=cnn_norm),
        estimator=EstimatorConfig(
            in_channels=320, out_channels=80, channels=tuple(channels),
            attention_head_dim=16, n_blocks=1, num_mid_blocks=1,
            num_heads=2, act_fn="gelu", static_chunk_size=50),
        cfm=CFMConfig(n_timesteps=10, max_noise_len=15000))

    params, unused = ckpt.convert_flow_state_dict(_sd(ref), cfg)
    mine = CausalMaskedDiffWithXvec(cfg)
    return ref, mine, params, cfg, unused


@pytest.fixture(scope="module")
def flow_pair():
    return _make_flow_pair(channels=(64,), macaron=False, use_cnn=False)


def _inject_torch_noise(monkeypatch, ref):
    """Make my fixed CFM noise buffer equal the reference's rand_noise."""
    from moss_speech_decoder_cosy_tpu.models.flow import cfm as cfm_mod
    noise = ref.decoder.rand_noise.numpy().transpose(0, 2, 1)  # (1, L, 80)
    monkeypatch.setattr(cfm_mod, "_fixed_noise",
                        lambda max_len, dim: noise[:, :max_len, :dim])


def _run_flow_pair(ref, mine, params, cfg, monkeypatch, streaming,
                   finalize, n_tok=12, n_prompt=4):
    _inject_torch_noise(monkeypatch, ref)
    rng = np.random.RandomState(12)
    token = rng.randint(0, cfg.vocab_size, (1, n_tok)).astype(np.int64)
    prompt_token = rng.randint(0, cfg.vocab_size,
                               (1, n_prompt)).astype(np.int64)
    prompt_feat = rng.randn(1, n_prompt * cfg.token_mel_ratio,
                            cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)

    with torch.no_grad():
        want, want_full = ref.inference(
            token=torch.from_numpy(token),
            token_len=torch.tensor([n_tok], dtype=torch.int32),
            prompt_token=torch.from_numpy(prompt_token),
            prompt_token_len=torch.tensor([n_prompt], dtype=torch.int32),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([prompt_feat.shape[1]],
                                         dtype=torch.int32),
            embedding=torch.from_numpy(emb),
            streaming=streaming, finalize=finalize)

    all_tok = np.concatenate([prompt_token, token], axis=1)
    full = mine.apply(params, jnp.asarray(all_tok, jnp.int32),
                      jnp.ones_like(jnp.asarray(all_tok), bool),
                      jnp.asarray(prompt_feat), jnp.asarray(emb),
                      streaming=streaming, finalize=finalize)
    got_full = np.asarray(full).transpose(0, 2, 1)       # (B, 80, T)
    got = got_full[:, :, prompt_feat.shape[1]:]
    assert want.shape == got.shape, (want.shape, got.shape)
    return want.numpy(), got


def test_flow_inference_golden_offline(flow_pair, monkeypatch):
    ref, mine, params, cfg, unused = flow_pair
    assert unused == [], unused
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=False, finalize=True)
    assert _max_abs(want, got) < 2e-3
    assert float(np.mean(np.abs(want - got))) < 2e-4


def test_flow_inference_golden_streaming(flow_pair, monkeypatch):
    """streaming=True engages the chunked attention masks in encoder and
    estimator (static_chunk_size plumbing)."""
    ref, mine, params, cfg, unused = flow_pair
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=True, finalize=True,
                               n_tok=30, n_prompt=4)
    assert _max_abs(want, got) < 2e-3


def test_flow_inference_golden_lookahead(flow_pair, monkeypatch):
    """finalize=False: the last pre_lookahead_len tokens act as encoder
    context and produce no frames (flow.py:262-263)."""
    ref, mine, params, cfg, unused = flow_pair
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=True, finalize=False,
                               n_tok=15, n_prompt=4)
    assert _max_abs(want, got) < 2e-3


def test_flow_inference_golden_unet_2level(monkeypatch):
    """channels=(64, 64): exercises Downsample1D / transpose-Upsample1D and
    the skip-connection paths of the U-Net converter mapping."""
    ref, mine, params, cfg, unused = _make_flow_pair(
        channels=(64, 64), macaron=False, use_cnn=False)
    assert unused == [], unused
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=False, finalize=True)
    assert _max_abs(want, got) < 2e-3


def test_flow_inference_golden_macaron_cnn(monkeypatch):
    """macaron FFN + conformer conv module (layer_norm variant) parity."""
    ref, mine, params, cfg, unused = _make_flow_pair(
        channels=(64,), macaron=True, use_cnn=True)
    assert unused == [], unused
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=False, finalize=True)
    assert _max_abs(want, got) < 2e-3


def test_flow_inference_golden_cnn_batch_norm(monkeypatch):
    """conv module with torch BatchNorm1d eval stats (wenet default norm;
    convolution.py:84-90) — running mean/var converted as parameters."""
    ref, mine, params, cfg, unused = _make_flow_pair(
        channels=(64,), macaron=False, use_cnn=True,
        cnn_norm="batch_norm")
    assert unused == [], unused
    want, got = _run_flow_pair(ref, mine, params, cfg, monkeypatch,
                               streaming=False, finalize=True)
    assert _max_abs(want, got) < 2e-3


# =====================================================================
# Stable-audio DiT estimator (cosyvoice1/flow/stable/dit.py:15-258 +
# transformer.py continuous_transformer, the flow_matching_dit path).
# x_transformers isn't installed, so the reference modules cannot import;
# the torch side is a faithful restatement (tests/ref_shim.py, cites per
# block).
# =====================================================================
def test_dit_estimator_golden():
    from tests.ref_shim import build_torch_stable_dit
    from moss_speech_decoder_cosy_tpu.models.flow.dit import (
        DiTEstimator, DiTConfig)

    io, embed, depth, heads, spk = 16, 128, 2, 2, 12
    torch.manual_seed(21)
    ref = build_torch_stable_dit(io_channels=io, embed_dim=embed,
                                 depth=depth, num_heads=heads,
                                 spk_embed_dim=spk, ff_mult=4).eval()
    cfg = DiTConfig(io_channels=io, embed_dim=embed, depth=depth,
                    num_heads=heads, spk_embed_dim=spk, ff_mult=4)
    params, unused = ckpt.convert_dit_state_dict(_sd(ref), cfg)
    assert unused == [], unused
    mine = DiTEstimator(cfg)

    rng = np.random.RandomState(4)
    b, t = 2, 25
    x = rng.randn(b, t, io).astype(np.float32)
    mu = rng.randn(b, t, io).astype(np.float32)
    spks = rng.randn(b, spk).astype(np.float32)
    tt = rng.rand(b).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(x).transpose(1, 2),
                   torch.from_numpy(tt),
                   torch.from_numpy(spks),
                   torch.from_numpy(mu).transpose(1, 2))
    want = want.numpy().transpose(0, 2, 1)

    got = mine.apply(params, jnp.asarray(x), jnp.ones((b, t), bool),
                     jnp.asarray(mu), jnp.asarray(tt), jnp.asarray(spks),
                     jnp.zeros((b, t, io)))
    got = np.asarray(got)
    assert want.shape == got.shape
    assert _max_abs(want, got) < 2e-4, _max_abs(want, got)


# =====================================================================
# v1 flow: MaskedDiffWithXvec + InterpolateRegulator + non-causal matcha
# U-Net + ConditionalCFM with flow cache (cosyvoice/flow/flow.py:24-148,
# length_regulator.py:21-85, flow_matching.py:26-196)
# =====================================================================
def _make_v1_flow_pair():
    from omegaconf import DictConfig
    from cosyvoice.flow.flow import MaskedDiffWithXvec as TorchV1Flow
    from cosyvoice.transformer.encoder import (
        ConformerEncoder as TorchConformer)
    from cosyvoice.flow.length_regulator import (
        InterpolateRegulator as TorchRegulator)
    from cosyvoice.flow.decoder import ConditionalDecoder as TorchNCEst
    from cosyvoice.flow.flow_matching import ConditionalCFM as TorchV1CFM

    from moss_speech_decoder_cosy_tpu.models.flow.flow_v1 import (
        MaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.utils.config import (
        FlowConfig, EncoderConfig, EstimatorConfig, CFMConfig)

    torch.manual_seed(13)
    t_enc = TorchConformer(
        input_size=64, output_size=64, attention_heads=4,
        linear_units=64, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", pos_enc_layer_type="rel_pos_espnet",
        selfattention_layer_type="rel_selfattn", macaron_style=False,
        use_cnn_module=False, normalize_before=True)
    t_reg = TorchRegulator(channels=80, sampling_ratios=[1, 1, 1, 1])
    t_est = TorchNCEst(
        in_channels=320, out_channels=80, channels=[32, 32],
        dropout=0.0, attention_head_dim=16, n_blocks=1,
        num_mid_blocks=1, num_heads=2, act_fn="gelu")
    cfm_params = DictConfig({
        "sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
        "training_cfg_rate": 0.2, "inference_cfg_rate": 0.7,
        "reg_loss_type": "l1"})
    t_cfm = TorchV1CFM(in_channels=240, cfm_params=cfm_params, n_spks=1,
                       spk_emb_dim=80, estimator=t_est)
    ref = TorchV1Flow(
        input_size=64, output_size=80, spk_embed_dim=192, vocab_size=64,
        input_frame_rate=50, only_mask_loss=True, encoder=t_enc,
        length_regulator=t_reg, decoder=t_cfm).eval()

    cfg = FlowConfig(
        vocab_size=64, input_size=64, output_size=80, spk_embed_dim=192,
        input_frame_rate=50,
        encoder=EncoderConfig(
            input_size=64, output_size=64, attention_heads=4,
            linear_units=64, num_blocks=2, dropout_rate=0.0,
            macaron_style=False, use_cnn_module=False,
            pos_enc_layer_type="rel_pos_espnet"),
        estimator=EstimatorConfig(
            in_channels=320, out_channels=80, channels=(32, 32),
            attention_head_dim=16, n_blocks=1, num_mid_blocks=1,
            num_heads=2, act_fn="gelu", causal=False),
        cfm=CFMConfig(n_timesteps=10, max_noise_len=2048))
    params, unused = ckpt.convert_flow_v1_state_dict(_sd(ref), cfg)
    assert unused == [], unused
    return ref, MaskedDiffWithXvec(cfg), params, cfg


@pytest.mark.parametrize("n_tok", [30, 50])
def test_flow_v1_inference_golden(monkeypatch, n_tok):
    """v1 inference parity incl. the InterpolateRegulator head/mid/tail
    split for targets > 40 tokens (length_regulator.py:52-73) and the
    prompt+34-frame flow cache."""
    ref, mine, params, cfg = _make_v1_flow_pair()
    from moss_speech_decoder_cosy_tpu.models.flow import flow_v1 as v1_mod
    from moss_speech_decoder_cosy_tpu.models.flow.cfm import _fixed_noise

    rng = np.random.RandomState(14)
    n_prompt = 6
    mel_len1 = 10
    mel_len2 = int(n_tok / 50 * 22050 / 256)
    token = rng.randint(0, cfg.vocab_size, (1, n_tok)).astype(np.int64)
    prompt_token = rng.randint(0, cfg.vocab_size,
                               (1, n_prompt)).astype(np.int64)
    prompt_feat = rng.randn(1, mel_len1, 80).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)

    total = mel_len1 + mel_len2
    noise = _fixed_noise(2048, 80)
    monkeypatch.setattr(
        torch, "randn_like",
        lambda mu, **k: torch.from_numpy(
            np.broadcast_to(noise[:, : mu.shape[2]].transpose(0, 2, 1),
                            mu.shape).copy()))

    with torch.no_grad():
        want, want_cache = ref.inference(
            token=torch.from_numpy(token),
            token_len=torch.tensor([n_tok], dtype=torch.int32),
            prompt_token=torch.from_numpy(prompt_token),
            prompt_token_len=torch.tensor([n_prompt], dtype=torch.int32),
            prompt_feat=torch.from_numpy(prompt_feat),
            prompt_feat_len=torch.tensor([mel_len1], dtype=torch.int32),
            embedding=torch.from_numpy(emb),
            flow_cache=torch.zeros(1, 80, 0, 2))

    got, got_cache = mine.apply(
        params, jnp.asarray(token, jnp.int32),
        jnp.asarray(prompt_token, jnp.int32),
        jnp.asarray(prompt_feat), jnp.asarray(emb), mel_len2,
        method=mine.inference)
    got = np.asarray(got).transpose(0, 2, 1)
    assert want.shape == got.shape, (want.shape, got.shape)
    assert _max_abs(want.numpy(), got) < 2e-3
    assert float(np.mean(np.abs(want.numpy() - got))) < 2e-4
    # flow cache (prompt + last-34 z/mu) parity
    assert _max_abs(want_cache.numpy(),
                    np.asarray(got_cache).transpose(0, 2, 1, 3)) < 2e-3
    del total


# =====================================================================
# cosyvoice1 BlockConformerEncoder (cosyvoice1/transformer/encoder.py:477,
# attention.py:472, utils/block_mask_util.py:4-20)
# =====================================================================
def test_block_conformer_golden():
    """Grid-masked (block-causal) conformer: our chunk mask with unlimited
    left context IS the reference grid mask, so the whole variant reduces
    to one mask knob on flow_v1.ConformerEncoder."""
    ref_shim.install_cosyvoice1_block()
    from cosyvoice1.transformer.encoder import (
        BlockConformerEncoder as TorchBlockEncoder)
    from moss_speech_decoder_cosy_tpu.models.flow.flow_v1 import (
        BlockConformerEncoder)
    from moss_speech_decoder_cosy_tpu.utils.config import EncoderConfig

    block_size = 3
    torch.manual_seed(61)
    ref = TorchBlockEncoder(
        input_size=16, output_size=24, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="linear",
        pos_enc_layer_type="rel_pos", macaron_style=True,
        selfattention_layer_type="block_rel_selfattn",
        use_cnn_module=True, cnn_module_kernel=7,
        cnn_module_norm="layer_norm", causal=False,
        block_size=block_size).eval()

    enc_cfg = EncoderConfig(
        input_size=16, output_size=24, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, macaron_style=True,
        use_cnn_module=True, cnn_module_kernel=7,
        cnn_module_norm="layer_norm", cnn_causal=False,
        pos_enc_layer_type="rel_pos")
    params, unused = ckpt.convert_block_conformer_state_dict(_sd(ref),
                                                             enc_cfg)
    assert unused == [], unused

    rng = np.random.RandomState(62)
    t = 8
    x = rng.randn(1, t, 16).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x), torch.tensor([t]))
    mine = BlockConformerEncoder(enc_cfg, block_size=block_size)
    got = mine.apply(params, jnp.asarray(x), jnp.ones((1, t), bool))
    assert want.numpy().shape == np.asarray(got).shape
    assert _max_abs(want.numpy(), got) < 2e-5

    # the block structure must actually matter: a plain-causal run differs
    from moss_speech_decoder_cosy_tpu.models.flow.flow_v1 import (
        ConformerEncoder)
    causal = ConformerEncoder(enc_cfg, static_chunk_size=1)
    got_causal = causal.apply(params, jnp.asarray(x), jnp.ones((1, t), bool))
    assert _max_abs(got, got_causal) > 1e-4
