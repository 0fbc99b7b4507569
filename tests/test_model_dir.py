"""load_model_dir: one-call assembly of a reference-layout checkpoint dir
(config.yaml + flow.pt + hift.pt [+ spk2info.pt ...]) — the
AudioDecoder/CosyVoice model-dir loading role (flow_inference.py:48-92,
cli/cosyvoice.py:27-80) — validated on tiny synthetic checkpoints built
from the reference's own torch modules."""

import dataclasses
import json

import numpy as np
import pytest

import ref_shim

ref_shim.install()

import torch  # noqa: E402


def _tiny_v2_cfgs():
    from moss_speech_decoder_cosy_tpu.utils.config import (
        FlowConfig, EncoderConfig, EstimatorConfig, CFMConfig,
        tiny_hift_config)
    # reference UpsampleConformerEncoder hardcodes 512-ch pre-lookahead
    # (upsample_encoder.py:203) — same scale as test_validate_reference
    flow_cfg = FlowConfig(
        vocab_size=64, input_size=512, output_size=80, spk_embed_dim=12,
        input_frame_rate=12.5, token_mel_ratio=4,
        encoder=EncoderConfig(
            input_size=512, output_size=512, attention_heads=4,
            linear_units=64, num_blocks=1, num_up_blocks=4,
            static_chunk_size=4, upsample_stride=4, dropout_rate=0.0),
        estimator=EstimatorConfig(
            in_channels=320, out_channels=80, channels=(24,),
            attention_head_dim=8, n_blocks=1, num_mid_blocks=1,
            num_heads=2, static_chunk_size=8),
        cfm=CFMConfig(n_timesteps=4, max_noise_len=512))
    hift_cfg = dataclasses.replace(tiny_hift_config(), in_channels=80)
    return flow_cfg, hift_cfg


def _write_v2_dir(tmp_path, flow_cfg, hift_cfg):
    from types import SimpleNamespace
    from moss_speech_decoder_cosy_tpu.bin import validate_reference as vr
    torch.manual_seed(3)
    ref_flow, ref_hift = vr._build_torch_pair(
        SimpleNamespace(flow=None, hift=None), flow_cfg, hift_cfg,
        load=False)
    torch.save(ref_flow.state_dict(), tmp_path / "flow.pt")
    torch.save({"generator." + k: v
                for k, v in ref_hift.state_dict().items()},
               tmp_path / "hift.pt")
    torch.save({"alice": {"embedding": torch.zeros(1, 12)},
                "bob": {"flow_embedding": torch.ones(1, 12),
                        "flow_prompt_speech_token":
                            torch.arange(3, dtype=torch.int64)[None],
                        "prompt_speech_feat": torch.zeros(1, 12, 80)}},
               tmp_path / "spk2info.pt")


_V2_YAML = """\
flow: !new:cosyvoice.flow.flow.CausalMaskedDiffWithXvec
  vocab_size: 64
  input_size: 512
  output_size: 80
  spk_embed_dim: 12
  input_frame_rate: 12.5
  token_mel_ratio: 4
  pre_lookahead_len: 3
  encoder: !new:cosyvoice.transformer.upsample_encoder.UpsampleConformerEncoder
    input_size: 512
    output_size: 512
    attention_heads: 4
    linear_units: 64
    num_blocks: 1
    num_up_blocks: 4
    static_chunk_size: 4
    upsample_stride: 4
    dropout_rate: 0.0
  decoder: !new:cosyvoice.flow.flow_matching.CausalConditionalCFM
    cfm_params: !new:omegaconf.DictConfig
      content:
        sigma_min: 1e-06
        t_scheduler: cosine
        training_cfg_rate: 0.2
        inference_cfg_rate: 0.7
    estimator: !new:cosyvoice.flow.decoder.CausalConditionalDecoder
      in_channels: 320
      out_channels: 80
      channels: [24]
      attention_head_dim: 8
      n_blocks: 1
      num_mid_blocks: 1
      num_heads: 2
      static_chunk_size: 8
hift: !new:cosyvoice.hifigan.generator.HiFTGenerator
  in_channels: 80
  base_channels: {base}
  nb_harmonics: {harm}
  sampling_rate: {sr}
  upsample_rates: {ups}
  upsample_kernel_sizes: {upk}
  istft_params:
    n_fft: {nfft}
    hop_len: {hop}
  resblock_kernel_sizes: {rk}
  resblock_dilation_sizes: {rd}
  source_resblock_kernel_sizes: {sk}
  source_resblock_dilation_sizes: {sd}
  f0_predictor: !new:cosyvoice.hifigan.f0_predictor.ConvRNNF0Predictor
    num_class: 1
    in_channels: 80
    cond_channels: {f0c}
"""


def _yaml_for(hift_cfg) -> str:
    j = lambda x: json.dumps(list(x) if isinstance(x, tuple) else x)
    return _V2_YAML.format(
        base=hift_cfg.base_channels, harm=hift_cfg.nb_harmonics,
        sr=hift_cfg.sampling_rate,
        ups=j(hift_cfg.upsample_rates), upk=j(hift_cfg.upsample_kernel_sizes),
        nfft=hift_cfg.istft_n_fft, hop=hift_cfg.istft_hop_len,
        rk=j(hift_cfg.resblock_kernel_sizes),
        rd=j([list(d) for d in hift_cfg.resblock_dilation_sizes]),
        sk=j(hift_cfg.source_resblock_kernel_sizes),
        sd=j([list(d) for d in hift_cfg.source_resblock_dilation_sizes]),
        f0c=hift_cfg.f0_cond_channels)


def test_load_model_dir_v2(tmp_path):
    """config.yaml-driven load: configs parsed from the yaml match the
    goldens, converters report zero unused keys, decode runs, spk2info
    prompts assemble, and the loaded decoder's output is IDENTICAL to a
    hand-assembled AudioDecoder on the same checkpoints."""
    from moss_speech_decoder_cosy_tpu.model_dir import load_model_dir
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.utils import checkpoint as ckpt
    from moss_speech_decoder_cosy_tpu.utils.config import PipelineConfig

    flow_cfg, hift_cfg = _tiny_v2_cfgs()
    _write_v2_dir(tmp_path, flow_cfg, hift_cfg)
    (tmp_path / "config.yaml").write_text(_yaml_for(hift_cfg))

    # cfm n_timesteps/max_noise_len aren't carried by reference yamls
    # (set at inference time) — align them for the identity check
    md = load_model_dir(str(tmp_path), verbose=False)
    assert md.flow_version == "v2"
    assert md.flow_cfg.encoder == flow_cfg.encoder
    assert md.flow_cfg.estimator == flow_cfg.estimator
    assert md.hift_cfg == hift_cfg
    assert md.report["flow_unused"] == 0
    assert md.report["hift_unused"] == 0
    assert md.codec is None and md.speaker_encoder is None

    md = load_model_dir(str(tmp_path), verbose=False,
                        flow_cfg=flow_cfg, hift_cfg=hift_cfg)
    tokens = np.arange(8, dtype=np.int32)[None] % flow_cfg.vocab_size
    wav = md.decoder.token2wav(tokens)
    assert wav.shape == (1, 8 * 4 * hift_cfg.total_upsample)
    assert np.isfinite(wav).all()

    # identity vs hand-assembled pipeline on the same checkpoints
    sd = ckpt.load_torch_state_dict(str(tmp_path / "flow.pt"))
    fp, _ = ckpt.convert_flow_state_dict(sd, flow_cfg)
    sd = ckpt.strip_prefix(
        ckpt.load_torch_state_dict(str(tmp_path / "hift.pt")), "generator.")
    hp, _ = ckpt.convert_hift_state_dict(sd, hift_cfg)
    dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp, PipelineConfig())
    np.testing.assert_array_equal(np.asarray(wav),
                                  np.asarray(dec.token2wav(tokens)))

    # spk2info -> Prompt assembly
    pa = md.prompt("alice")
    assert pa.token.shape == (1, 0) and pa.embedding.shape == (1, 12)
    pb = md.prompt("bob")
    assert pb.token.shape == (1, 3)
    assert pb.feat.shape == (1, 12, 80)
    assert (pb.embedding == 1).all()
    wav_b = md.decoder.token2wav(tokens, pb.token, pb.feat, pb.embedding)
    assert np.isfinite(wav_b).all()


def test_load_model_dir_requires_checkpoints(tmp_path):
    from moss_speech_decoder_cosy_tpu.model_dir import load_model_dir
    with pytest.raises(FileNotFoundError):
        load_model_dir(str(tmp_path), verbose=False)


def test_load_model_dir_v1(tmp_path):
    """v1 branch: MaskedDiffWithXvec checkpoint + 22.05 kHz HiFT through
    V1Decoder — offline decode and the growing-hop streaming session
    both run; streaming == offline-session feeding (the golden v1
    equivalence is in test_stream_v1; here we check the loader plumbing)."""
    import test_golden_parity as gp
    from moss_speech_decoder_cosy_tpu.model_dir import load_model_dir
    from moss_speech_decoder_cosy_tpu.utils.config import tiny_hift_config

    ref_v1, _, _, flow_cfg = gp._make_v1_flow_pair()
    hift_cfg = dataclasses.replace(tiny_hift_config(), in_channels=80,
                                   sampling_rate=22050)
    from types import SimpleNamespace
    from moss_speech_decoder_cosy_tpu.bin import validate_reference as vr
    torch.manual_seed(5)
    _, ref_hift = vr._build_torch_pair(
        SimpleNamespace(flow=None, hift=None), flow_cfg, hift_cfg,
        load=False)
    torch.save(ref_v1.state_dict(), tmp_path / "flow.pt")
    torch.save(ref_hift.state_dict(), tmp_path / "hift.pt")

    md = load_model_dir(str(tmp_path), flow_version="v1", verbose=False,
                        flow_cfg=flow_cfg, hift_cfg=hift_cfg)
    assert md.flow_version == "v1"
    assert md.report["flow_unused"] == 0

    tokens = (np.arange(16, dtype=np.int32)[None] * 7) % flow_cfg.vocab_size
    wav = md.decoder.token2wav(tokens)
    n_mel = int(16 / flow_cfg.input_frame_rate
                * hift_cfg.sampling_rate / 256)
    assert wav.shape == (1, n_mel * hift_cfg.total_upsample)
    assert np.isfinite(wav).all()

    sess = md.decoder.new_session()
    chunks = sess.push_tokens(tokens.reshape(-1))
    chunks.append(sess.finalize())
    stream = np.concatenate([c.reshape(-1) for c in chunks])
    assert stream.size > 0 and np.isfinite(stream).all()
    # the wrapper's one-shot stream_inference == manual session feeding
    again = md.decoder.stream_inference(tokens)
    np.testing.assert_array_equal(stream, again.reshape(-1))
