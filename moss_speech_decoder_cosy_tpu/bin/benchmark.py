"""Seed-TTS benchmark CLI — the scripts/evaluate_moss_decoder.sh +
benchmark_moss_decoder.py entry point.

Shards samples by RANK/WORLD_SIZE env (the reference's torchrun pattern,
benchmark_moss_decoder.py:175-189), resumes by pred.wav existence, and
reports RTF stats at the end.  ``--score`` closes the loop IN-REPO —
WER via the repo's own Whisper ASR stack and speaker SIM via CAM++ —
writing ``<save_dir>/result.json`` like the reference's external
seed-tts-eval call (evaluate_moss_decoder.sh:76-94).  Use
``bin.score`` to (re-)score an already-synthesized run directory.

  RANK=0 WORLD_SIZE=1 python -m moss_speech_decoder_cosy_tpu.bin.benchmark \
      --benchmark_dir seedtts_testset --save_dir out --lang en \
      --flow_ckpt flow.pt --hift_ckpt hift.pt --tokenizer_ckpt tok.safetensors \
      --score --campplus_onnx campplus.onnx
"""

from __future__ import annotations

import argparse
import json
import os


def build_asr(tokenizer_ckpt: str, codec):
    """WhisperASR from the same checkpoint file that feeds the tokenizer:
    the GLM4 tokenizer ships the full WhisperVQ encoder-decoder
    (whisper_encoder_decoder.py:90-100), so the post-VQ encoder slice and
    the text decoder convert from it directly.  Returns None (with a
    warning) when the file has no decoder weights."""
    import numpy as np
    from ..tokenizer.asr_decoder import WhisperASR
    from ..utils import checkpoint as ckpt

    sd = ckpt.load_torch_state_dict(tokenizer_ckpt)
    enc_sd = ckpt.strip_prefix(sd, "generator.encoder.", "encoder.")
    dec_sd = {}
    for pre in ("generator.decoder.", "generator.whisper_model.decoder.",
                "whisper_model.decoder.", "decoder."):
        dec_sd = {k[len(pre):]: v for k, v in sd.items()
                  if k.startswith(pre)}
        if dec_sd:
            break
    if not dec_sd:
        print("WARNING: --score requested but the tokenizer checkpoint "
              "has no decoder.* weights; WER will be skipped")
        return None
    cfg = codec.tok_cfg
    post_params, _ = ckpt.convert_post_vq_state_dict(enc_sd, cfg)
    dec_params, _ = ckpt.convert_whisper_decoder_state_dict(dec_sd, cfg)
    codebook = np.asarray(codec.tok_params["params"]["codebook"])
    return WhisperASR(cfg, post_params, dec_params, codebook)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--benchmark_dir", required=True)
    p.add_argument("--save_dir", required=True)
    p.add_argument("--lang", default="en", choices=["en", "zh"])
    p.add_argument("--block_size", type=int, default=5)
    p.add_argument("--max_token_len", type=int, default=40)
    p.add_argument("--mel_cache_len", type=int, default=8)
    p.add_argument("--flow_ckpt", default=None)
    p.add_argument("--hift_ckpt", default=None)
    p.add_argument("--tokenizer_ckpt", default=None)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--score", action="store_true",
                   help="score the run in-repo (WER+SIM) and write "
                        "result.json")
    p.add_argument("--campplus_onnx", default=None,
                   help="CAM++ onnx for speaker SIM scoring")
    args = p.parse_args()

    rank = int(os.environ.get("RANK", "0"))
    world = int(os.environ.get("WORLD_SIZE", "1"))

    from .inference import build_codec
    from ..eval import run_seed_tts_benchmark

    codec = build_codec(argparse.Namespace(
        flow_ckpt=args.flow_ckpt, hift_ckpt=args.hift_ckpt,
        tokenizer_ckpt=args.tokenizer_ckpt, block_size=args.block_size,
        max_token_len=args.max_token_len, bf16=args.bf16))
    if args.campplus_onnx:
        from ..models.campplus import SpeakerEncoder
        codec.speaker_encoder = SpeakerEncoder.from_onnx(args.campplus_onnx)

    asr = None
    if args.score and args.tokenizer_ckpt:
        asr = build_asr(args.tokenizer_ckpt, codec)

    stats = run_seed_tts_benchmark(
        codec, args.benchmark_dir, args.save_dir, lang=args.lang,
        block_size=args.block_size, max_token_len=args.max_token_len,
        rank=rank, world_size=world, score=args.score, asr=asr)
    scores = stats.pop("scores", None)
    print(json.dumps({"rank": rank, **stats}))
    if scores is not None:
        print(json.dumps({args.lang: {"wer": scores["wer"],
                                      "sim": scores["sim"],
                                      "n": scores["n"]}}))
        print(f"result.json: {stats.get('result_json')}")


if __name__ == "__main__":
    main()
