"""Turnkey real-checkpoint validation.

No released checkpoints exist in the build environment, so the converter
stack is validated by golden tests against random-init reference torch
modules (tests/test_golden_parity.py).  The day real ``flow.pt`` /
``hift.pt`` / tokenizer / ``campplus.onnx`` files appear, THIS command
closes the remaining claim (BASELINE waveform MAE) in one invocation:

    python -m moss_speech_decoder_cosy_tpu.bin.validate_reference \\
        --flow flow.pt --hift hift.pt [--config config.yaml] \\
        [--tokenizer model.safetensors] [--campplus campplus.onnx] \\
        [--reference-path /path/to/GLM_modules] [--seconds 5]

Steps: load + convert every provided checkpoint (reporting unused torch
keys), run our jitted token2wav end to end (RTF measured), and — when the
reference package is importable from ``--reference-path`` — run the
reference torch pipeline on the SAME inputs with both sides' noise matched
(the torch CFM's ``rand_noise`` buffer is injected into our solver; NSF
noise is zeroed on both sides) and report the waveform MAE.  Emits ONE
JSON line.

Reference roles: flow_inference.py:53-104 (checkpoint loading + audio
decoding), cal_RTF.py:349-421 (RTF protocol).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _convert_all(args, flow_cfg, hift_cfg):
    from ..utils import checkpoint as ckpt
    report = {}
    flow_params = hift_params = None
    if args.flow:
        sd = ckpt.load_torch_state_dict(args.flow)
        if args.flow_version == "v1":
            flow_params, unused = ckpt.convert_flow_v1_state_dict(sd,
                                                                  flow_cfg)
        else:
            flow_params, unused = ckpt.convert_flow_state_dict(sd, flow_cfg)
        report["flow_unused"] = len(unused)
    if args.hift:
        sd = ckpt.load_torch_state_dict(args.hift)
        sd = ckpt.strip_prefix(sd, "generator.")
        hift_params, unused = ckpt.convert_hift_state_dict(sd, hift_cfg)
        report["hift_unused"] = len([u for u in unused
                                     if u != "stft_window"])
    if args.tokenizer:
        from ..tokenizer import tiny_tokenizer_config  # placeholder cfg
        from ..tokenizer.config import glm4_voice_tokenizer_config
        sd = ckpt.load_torch_state_dict(args.tokenizer)
        sd = ckpt.strip_prefix(sd, "generator.encoder.", "encoder.")
        tcfg = glm4_voice_tokenizer_config() if not args.tiny \
            else tiny_tokenizer_config()
        _, unused = ckpt.convert_tokenizer_state_dict(sd, tcfg)
        report["tokenizer_unused"] = len(
            [u for u in unused
             if u not in ("embed_positions2.weight", "ema_count",
                          "ema_weight")])
    if args.campplus:
        from ..utils.onnx_io import load_onnx_initializers
        sd = load_onnx_initializers(args.campplus)
        _, unused = ckpt.convert_campplus_state_dict(sd)
        report["campplus_unused"] = len(unused)
    return flow_params, hift_params, report


def _jax_decode(flow_cfg, hift_cfg, flow_params, hift_params, tokens,
                prompt_feat, emb, v1: bool):
    """Our pipeline: tokens -> mel -> wav; returns (wav np, seconds)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    if v1:
        from ..models.flow.flow_v1 import MaskedDiffWithXvec
        from ..models.hift import HiFTGenerator
        flow = MaskedDiffWithXvec(flow_cfg)
        hift = HiFTGenerator(hift_cfg)
        mel_len2 = int(tokens.shape[1] / flow_cfg.input_frame_rate
                       * hift_cfg.sampling_rate / hift_cfg.total_upsample)
        mel, _ = flow.apply(flow_params, jnp.asarray(tokens, jnp.int32),
                            jnp.zeros((1, 0), jnp.int32),
                            jnp.asarray(prompt_feat), jnp.asarray(emb),
                            mel_len2, method=flow.inference)
        wav, _ = hift.apply(hift_params, mel)
        return np.asarray(wav)
    from ..pipeline import AudioDecoder
    from ..utils.config import PipelineConfig
    dec = AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params,
                       PipelineConfig())
    return np.asarray(dec.token2wav(tokens, prompt_feat=prompt_feat,
                                    embedding=emb))


def main(argv=None, flow_cfg=None, hift_cfg=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--flow")
    ap.add_argument("--hift")
    ap.add_argument("--tokenizer")
    ap.add_argument("--campplus")
    ap.add_argument("--config", help="reference hyperpyyaml config.yaml")
    ap.add_argument("--flow-version", choices=("v1", "v2"), default="v2")
    ap.add_argument("--reference-path",
                    help="GLM_modules dir for the torch-side comparison")
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test configs instead of production sizes")
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    if flow_cfg is None or hift_cfg is None:
        if args.config:
            from ..utils.ref_config import configs_from_reference_yaml
            flow_cfg, hift_cfg = configs_from_reference_yaml(args.config)
        elif args.tiny:
            from ..utils.config import tiny_flow_config, tiny_hift_config
            flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
        else:
            from ..utils.config import moss_flow_config, moss_hift_config
            flow_cfg, hift_cfg = moss_flow_config(), moss_hift_config()

    flow_params, hift_params, report = _convert_all(args, flow_cfg,
                                                    hift_cfg)
    result = {"metric": "reference_validation", **report}

    if flow_params is not None and hift_params is not None:
        rng = np.random.RandomState(0)
        n_tok = max(4, int(args.seconds * flow_cfg.input_frame_rate))
        tokens = rng.randint(0, flow_cfg.vocab_size, (1, n_tok))
        prompt_feat = np.zeros((1, 0, flow_cfg.output_size), np.float32)
        emb = rng.randn(1, flow_cfg.spk_embed_dim).astype(np.float32)
        v1 = args.flow_version == "v1"

        wav = _jax_decode(flow_cfg, hift_cfg, flow_params, hift_params,
                          tokens, prompt_feat, emb, v1)     # compile pass
        t0 = time.perf_counter()
        wav = _jax_decode(flow_cfg, hift_cfg, flow_params, hift_params,
                          tokens, prompt_feat, emb, v1)
        dt = time.perf_counter() - t0
        audio_sec = wav.shape[-1] / hift_cfg.sampling_rate
        result["rtf"] = round(dt / audio_sec, 5)
        result["finite"] = bool(np.all(np.isfinite(wav)))

        if args.reference_path and not v1:
            try:
                mae = _torch_compare(args, flow_cfg, hift_cfg, flow_params,
                                     hift_params, tokens, prompt_feat, emb)
                result["waveform_mae"] = round(mae, 8)
            except Exception as e:           # report, don't crash
                result["torch_compare_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))
    return result


def _build_torch_pair(args, flow_cfg, hift_cfg, load: bool = True):
    """Instantiate the reference torch modules with OUR configs' shapes
    (the tests/test_golden_parity.py fixture pattern) and load the given
    checkpoints into them."""
    import torch
    from omegaconf import DictConfig
    from cosyvoice.flow.flow import CausalMaskedDiffWithXvec as TorchFlow
    from cosyvoice.transformer.upsample_encoder import (
        UpsampleConformerEncoder as TorchEncoder)
    from cosyvoice.flow.decoder import (
        CausalConditionalDecoder as TorchEstimator)
    from cosyvoice.flow.flow_matching import (
        CausalConditionalCFM as TorchCFM)
    from cosyvoice.hifigan.generator import HiFTGenerator as TorchHiFT
    from cosyvoice.hifigan.f0_predictor import ConvRNNF0Predictor as TorchF0

    e, s = flow_cfg.encoder, flow_cfg.estimator
    t_enc = TorchEncoder(
        input_size=flow_cfg.input_size, output_size=e.output_size,
        attention_heads=e.attention_heads, linear_units=e.linear_units,
        num_blocks=e.num_blocks, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="linear", macaron_style=e.macaron_style,
        use_cnn_module=e.use_cnn_module,
        cnn_module_kernel=e.cnn_module_kernel,
        static_chunk_size=e.static_chunk_size,
        upsample_stride=e.upsample_stride)
    t_est = TorchEstimator(
        in_channels=s.in_channels, out_channels=s.out_channels,
        channels=list(s.channels), dropout=0.0,
        attention_head_dim=s.attention_head_dim, n_blocks=s.n_blocks,
        num_mid_blocks=s.num_mid_blocks, num_heads=s.num_heads,
        act_fn=s.act_fn, static_chunk_size=s.static_chunk_size)
    cfm_params = DictConfig({
        "sigma_min": 1e-6, "solver": "euler", "t_scheduler": "cosine",
        "training_cfg_rate": 0.2,
        "inference_cfg_rate": flow_cfg.cfm.inference_cfg_rate,
        "reg_loss_type": "l1"})
    t_cfm = TorchCFM(in_channels=s.in_channels - flow_cfg.output_size,
                     cfm_params=cfm_params, n_spks=1,
                     spk_emb_dim=flow_cfg.output_size, estimator=t_est)
    ref_flow = TorchFlow(
        input_size=flow_cfg.input_size, output_size=flow_cfg.output_size,
        spk_embed_dim=flow_cfg.spk_embed_dim,
        vocab_size=flow_cfg.vocab_size,
        input_frame_rate=int(flow_cfg.input_frame_rate),
        token_mel_ratio=flow_cfg.token_mel_ratio,
        pre_lookahead_len=flow_cfg.encoder.pre_lookahead_len,
        encoder=t_enc, decoder=t_cfm).eval()

    h = hift_cfg
    ref_hift = TorchHiFT(
        in_channels=h.in_channels, base_channels=h.base_channels,
        nb_harmonics=h.nb_harmonics, sampling_rate=h.sampling_rate,
        nsf_alpha=h.nsf_alpha, nsf_sigma=h.nsf_sigma,
        nsf_voiced_threshold=h.nsf_voiced_threshold,
        upsample_rates=list(h.upsample_rates),
        upsample_kernel_sizes=list(h.upsample_kernel_sizes),
        istft_params={"n_fft": h.istft_n_fft, "hop_len": h.istft_hop_len},
        resblock_kernel_sizes=list(h.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in
                                 h.resblock_dilation_sizes],
        source_resblock_kernel_sizes=list(h.source_resblock_kernel_sizes),
        source_resblock_dilation_sizes=[
            list(d) for d in h.source_resblock_dilation_sizes],
        lrelu_slope=h.lrelu_slope, audio_limit=h.audio_limit,
        f0_predictor=TorchF0(num_class=1, in_channels=h.in_channels,
                             cond_channels=h.f0_cond_channels)).eval()

    if load:
        ref_flow.load_state_dict(
            torch.load(args.flow, map_location="cpu", weights_only=True),
            strict=False)
        hift_sd = torch.load(args.hift, map_location="cpu",
                             weights_only=True)
        hift_sd = {k.replace("generator.", ""): v
                   for k, v in hift_sd.items()}
        ref_hift.load_state_dict(hift_sd, strict=False)
    return ref_flow, ref_hift


def _torch_compare(args, flow_cfg, hift_cfg, flow_params, hift_params,
                   tokens, prompt_feat, emb):
    """Reference torch pipeline vs ours on the same inputs with noise
    matched: the torch CFM's rand_noise buffer is injected into our
    solver table; NSF randomness is zeroed on both sides.  Returns the
    waveform MAE (v2 stack)."""
    import numpy as np
    if args.reference_path not in sys.path:
        sys.path.insert(0, args.reference_path)
    import torch
    import jax
    import jax.numpy as jnp
    from ..models.flow import CausalMaskedDiffWithXvec
    from ..models.flow import cfm as cfm_mod
    from ..models.hift import HiFTGenerator

    ref_flow, ref_hift = _build_torch_pair(args, flow_cfg, hift_cfg)

    n_tok = tokens.shape[1]
    t_tokens = torch.from_numpy(np.asarray(tokens, np.int64))
    patches = [(torch, "rand", torch.rand),
               (torch, "randn_like", torch.randn_like),
               (jax.random, "uniform", jax.random.uniform),
               (jax.random, "normal", jax.random.normal),
               (cfm_mod, "_fixed_noise", cfm_mod._fixed_noise)]
    try:
        torch.rand = lambda *a, **k: torch.zeros(
            *a, **{kk: vv for kk, vv in k.items() if kk != "device"})
        torch.randn_like = lambda x, **k: torch.zeros_like(x)
        jax.random.uniform = lambda key, shape=(), dtype=jnp.float32, **k: \
            jnp.zeros(shape, dtype)
        jax.random.normal = lambda key, shape=(), dtype=jnp.float32, **k: \
            jnp.zeros(shape, dtype)
        noise = ref_flow.decoder.rand_noise.numpy().transpose(0, 2, 1)
        cfm_mod._fixed_noise = \
            lambda max_len, dim: noise[:, :max_len, :dim]

        with torch.no_grad():
            mel_t, _ = ref_flow.inference(
                token=t_tokens,
                token_len=torch.tensor([n_tok], dtype=torch.int32),
                prompt_token=torch.zeros(1, 0, dtype=torch.int64),
                prompt_token_len=torch.tensor([0], dtype=torch.int32),
                prompt_feat=torch.from_numpy(prompt_feat),
                prompt_feat_len=torch.tensor([0], dtype=torch.int32),
                embedding=torch.from_numpy(emb),
                streaming=False, finalize=True)
            wav_t, _ = ref_hift.inference(mel_t)
        want = wav_t.numpy()

        flow = CausalMaskedDiffWithXvec(flow_cfg)
        hift = HiFTGenerator(hift_cfg)
        mel = flow.apply(flow_params, jnp.asarray(tokens, jnp.int32),
                         jnp.ones((1, n_tok), bool),
                         jnp.asarray(prompt_feat), jnp.asarray(emb),
                         streaming=False, finalize=True)
        with jax.disable_jit():
            wav, _ = hift.apply(hift_params, mel)
        got = np.asarray(wav)
    finally:
        for mod, name, orig in patches:
            setattr(mod, name, orig)
    assert want.shape == got.shape, (want.shape, got.shape)
    return float(np.mean(np.abs(want - got)))


if __name__ == "__main__":
    main()
