"""Golden end-to-end parity for the CosyVoice-v1 streaming session
(pipeline/stream_v1.StreamSessionV1) against the reference's OWN
CosyVoiceModel.token2wav loop (cli/model.py:133-221) driven exactly like
``tts(stream=True)`` with a pre-filled token list: growing token hop,
mel-overlap fade_in_out, flow_cache threading, HiFT mel/source/speech
caches.  NSF randomness is zeroed on both sides; the flow CFM noise is the
shared deterministic table."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_shim

ref_shim.install()

import torch  # noqa: E402

from moss_speech_decoder_cosy_tpu.utils import checkpoint as ckpt  # noqa: E402
from moss_speech_decoder_cosy_tpu.utils.config import HiFTConfig  # noqa: E402
from test_golden_parity import _make_v1_flow_pair, _sd, _max_abs  # noqa: E402


def _make_hift_pair():
    """Tiny torch/flax HiFT pair (same shapes as the hift golden tests)."""
    from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as TorchF0
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.utils.config import tiny_hift_config
    import dataclasses

    # the v1 flow emits 80 mel bins — widen the tiny config's input side
    cfg = dataclasses.replace(tiny_hift_config(), in_channels=80)
    torch.manual_seed(77)
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
    params, _ = ckpt.convert_hift_state_dict(_sd(ref), cfg)
    return ref, HiFTGenerator(cfg), params, cfg


def _zero_noise(monkeypatch):
    """Zero NSF randomness on both sides; flow CFM z -> shared table."""
    from moss_speech_decoder_cosy_tpu.models.flow.cfm import _fixed_noise
    noise = _fixed_noise(2048, 80)

    def torch_randn_like(x, **k):
        if x.dim() == 3 and x.shape[1] == 80:        # flow CFM z (B,80,T)
            return torch.from_numpy(np.broadcast_to(
                noise[:, : x.shape[2]].transpose(0, 2, 1), x.shape).copy())
        return torch.zeros_like(x)

    monkeypatch.setattr(torch, "randn_like", torch_randn_like)
    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.zeros(
            *a, **{kk: vv for kk, vv in k.items() if kk != "device"}))
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape=(), dtype=jnp.float32, **k:
                        jnp.zeros(shape, dtype))


def test_stream_v1_defaults_match_reference_formulas():
    """Constant derivation (cli/model.py:44-53)."""
    from moss_speech_decoder_cosy_tpu.pipeline.stream_v1 import (
        StreamSessionV1)
    flow_pair = _make_v1_flow_pair()
    hift_ref, hift, hift_params, hift_cfg = _make_hift_pair()
    _, flow, flow_params, flow_cfg = flow_pair
    s = StreamSessionV1(flow, flow_params, hift, hift_params,
                        np.zeros((1, 0), np.int64),
                        np.zeros((1, 0, 80), np.float32),
                        np.zeros((1, flow_cfg.spk_embed_dim), np.float32))
    fr = flow_cfg.input_frame_rate
    assert s.token_min_hop_len == 2 * fr
    assert s.token_max_hop_len == 4 * fr
    assert s.mel_overlap_len == int(20 / fr * 22050 / 256)
    assert s.source_cache_len == 20 * hift_cfg.total_upsample
    assert s.mel_window.shape[0] == 2 * s.mel_overlap_len


def test_stream_v1_golden_vs_reference_loop(monkeypatch):
    """Chunk-for-chunk waveform parity with the reference token2wav loop
    under a shrunken schedule (hop 6 x1.5 -> 12, overlap 4) that still
    exercises hop growth, overlap fades, and all three caches."""
    from cosyvoice.cli.model import CosyVoiceModel
    from moss_speech_decoder_cosy_tpu.pipeline.stream_v1 import (
        StreamSessionV1)

    ref_flow, flow, flow_params, flow_cfg = _make_v1_flow_pair()
    ref_hift, hift, hift_params, hift_cfg = _make_hift_pair()
    fr = flow_cfg.input_frame_rate
    up = hift_cfg.total_upsample

    rng = np.random.RandomState(90)
    n_prompt, mel_len1 = 4, 7
    prompt_token = rng.randint(0, flow_cfg.vocab_size, (1, n_prompt))
    prompt_feat = rng.randn(1, mel_len1, 80).astype(np.float32)
    emb = rng.randn(1, flow_cfg.spk_embed_dim).astype(np.float32)
    # schedule must keep every window's mel >= the prompt+34-frame cache
    # (flow_matching.py:64-66); window 22 tokens -> 37 mel frames >= 41-7
    tokens = rng.randint(0, flow_cfg.vocab_size, (60,))

    sched = dict(token_min_hop_len=16, token_max_hop_len=32,
                 token_overlap_len=6, mel_cache_len=3,
                 stream_scale_factor=1.5)

    _zero_noise(monkeypatch)

    # ---------------- reference loop (tts stream=True, cli/model.py:186+)
    model = CosyVoiceModel(llm=torch.nn.Identity(), flow=ref_flow,
                           hift=ref_hift)
    model.token_min_hop_len = sched["token_min_hop_len"]
    model.token_max_hop_len = sched["token_max_hop_len"]
    model.token_overlap_len = sched["token_overlap_len"]
    model.mel_overlap_len = int(sched["token_overlap_len"] / fr
                                * 22050 / 256)
    model.mel_window = np.hamming(2 * model.mel_overlap_len)
    model.mel_cache_len = sched["mel_cache_len"]
    model.source_cache_len = sched["mel_cache_len"] * up
    model.speech_window = np.hamming(2 * model.source_cache_len)
    model.stream_scale_factor = sched["stream_scale_factor"]

    uid = "golden"
    model.mel_overlap_dict[uid] = torch.zeros(1, 80, 0)
    model.flow_cache_dict[uid] = torch.zeros(1, 80, 0, 2)
    model.hift_cache_dict[uid] = None
    p_tok = torch.from_numpy(prompt_token)
    p_feat = torch.from_numpy(prompt_feat)
    t_emb = torch.from_numpy(emb)

    want_chunks = []
    pending = list(tokens)
    hop = model.token_min_hop_len
    with torch.no_grad():
        while len(pending) >= hop + model.token_overlap_len:
            window = torch.tensor(
                pending[: hop + model.token_overlap_len]).unsqueeze(0)
            want_chunks.append(model.token2wav(
                window, p_tok, p_feat, t_emb, uid,
                finalize=False).numpy()[0])
            pending = pending[hop:]
            hop = min(model.token_max_hop_len,
                      int(hop * model.stream_scale_factor))
        window = torch.tensor(pending).unsqueeze(0)
        want_chunks.append(model.token2wav(
            window, p_tok, p_feat, t_emb, uid, finalize=True).numpy()[0])

    # ---------------- mine
    sess = StreamSessionV1(flow, flow_params, hift, hift_params,
                           prompt_token, prompt_feat, emb, **sched)
    with jax.disable_jit():
        got_chunks = sess.push_tokens(tokens)
        got_chunks.append(sess.finalize())

    assert len(want_chunks) == len(got_chunks), (
        [c.shape for c in want_chunks], [c.shape for c in got_chunks])
    for i, (w, g) in enumerate(zip(want_chunks, got_chunks)):
        assert w.shape == g.shape, (i, w.shape, g.shape)
        assert _max_abs(w, g) < 5e-3, i
        assert float(np.mean(np.abs(w - np.asarray(g)))) < 5e-4, i


def test_stream_v1_incremental_feed_equals_bulk(monkeypatch):
    """Feeding tokens a few at a time must produce the same chunk stream
    as one bulk push (the session only acts on full hops)."""
    from moss_speech_decoder_cosy_tpu.pipeline.stream_v1 import (
        StreamSessionV1)
    _, flow, flow_params, flow_cfg = _make_v1_flow_pair()
    _, hift, hift_params, _ = _make_hift_pair()
    _zero_noise(monkeypatch)

    rng = np.random.RandomState(91)
    prompt_token = rng.randint(0, flow_cfg.vocab_size, (1, 3))
    prompt_feat = rng.randn(1, 5, 80).astype(np.float32)
    emb = rng.randn(1, flow_cfg.spk_embed_dim).astype(np.float32)
    tokens = rng.randint(0, flow_cfg.vocab_size, (60,))
    sched = dict(token_min_hop_len=16, token_max_hop_len=32,
                 token_overlap_len=4, mel_cache_len=2,
                 stream_scale_factor=1.5)

    def run(feed_sizes):
        s = StreamSessionV1(flow, flow_params, hift, hift_params,
                            prompt_token, prompt_feat, emb, **sched)
        out = []
        i = 0
        with jax.disable_jit():
            for n in feed_sizes:
                out.extend(s.push_tokens(tokens[i:i + n]))
                i += n
            out.extend(s.push_tokens(tokens[i:]))
            out.append(s.finalize())
        return out

    bulk = run([len(tokens)])
    drip = run([2] * 10)
    assert len(bulk) == len(drip)
    for w, g in zip(bulk, drip):
        assert w.shape == g.shape
        assert _max_abs(w, g) == 0.0


def test_decode_v1_cli_helper(tmp_path):
    """bin/inference decode_v1: offline and streaming v1 decode on tiny
    configs (the CLI surface for stock v1 checkpoints)."""
    from types import SimpleNamespace
    import dataclasses
    from moss_speech_decoder_cosy_tpu.bin.inference import decode_v1
    from moss_speech_decoder_cosy_tpu.utils.config import tiny_hift_config

    _, flow, flow_params, flow_cfg = _make_v1_flow_pair()
    hcfg = dataclasses.replace(tiny_hift_config(), in_channels=80)
    rng = np.random.RandomState(8)
    tokens = rng.randint(0, flow_cfg.vocab_size, (1, 24))
    args = SimpleNamespace(flow_ckpt=None, hift_ckpt=None, streaming=False)
    out = decode_v1(args, tokens, flow_cfg=flow_cfg, hift_cfg=hcfg)
    assert out.ndim == 2 and out.shape[-1] > 0
    assert np.all(np.isfinite(out))
