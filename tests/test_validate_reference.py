"""bin/validate_reference.py on tiny synthetic checkpoints: conversion
report + jax RTF + torch-vs-jax e2e waveform MAE in one command (the CLI
that closes the BASELINE real-weight claim the day real checkpoints
appear)."""

import json

import numpy as np
import pytest

import ref_shim

ref_shim.install()

import torch  # noqa: E402


def test_validate_reference_cli(tmp_path, capsys):
    from types import SimpleNamespace
    from moss_speech_decoder_cosy_tpu.bin import validate_reference as vr
    from moss_speech_decoder_cosy_tpu.utils.config import (
        FlowConfig, EncoderConfig, EstimatorConfig, CFMConfig,
        tiny_hift_config)

    # the reference UpsampleConformerEncoder hardcodes its pre-lookahead
    # at 512 channels (upsample_encoder.py:203) — the torch side cannot
    # shrink below that, so use the golden-test scale (512 encoder, small
    # estimator) with the hift input widened to the flow's 16 mel bins
    import dataclasses
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
    torch.manual_seed(3)
    args0 = SimpleNamespace(flow=None, hift=None)
    ref_flow, ref_hift = vr._build_torch_pair(args0, flow_cfg, hift_cfg,
                                              load=False)
    fp = tmp_path / "flow.pt"
    hp = tmp_path / "hift.pt"
    torch.save(ref_flow.state_dict(), fp)
    # the reference's hift.pt carries a 'generator.' prefix
    # (cli/model.py:73-75) — exercise the strip path
    torch.save({"generator." + k: v
                for k, v in ref_hift.state_dict().items()}, hp)

    result = vr.main(["--flow", str(fp), "--hift", str(hp),
                      "--seconds", "1",
                      "--reference-path", ref_shim.REFERENCE_PATH],
                     flow_cfg=flow_cfg, hift_cfg=hift_cfg)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert parsed == pytest.approx(result, abs=0) or parsed == result

    assert result["finite"] is True
    assert result["rtf"] > 0
    assert result["flow_unused"] == 0
    assert result["hift_unused"] == 0
    assert "torch_compare_error" not in result, result
    # converted weights through both stacks with matched noise: the e2e
    # waveform must agree to float tolerance
    assert result["waveform_mae"] < 1e-2, result
