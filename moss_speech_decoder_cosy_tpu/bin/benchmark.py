"""Seed-TTS benchmark CLI — the scripts/evaluate_moss_decoder.sh +
benchmark_moss_decoder.py entry point.

Shards samples by RANK/WORLD_SIZE env (the reference's torchrun pattern,
benchmark_moss_decoder.py:175-189), resumes by pred.wav existence, and
reports RTF stats at the end.  Scoring (WER/SIM) stays external, exactly
like the reference (seed-tts-eval).

  RANK=0 WORLD_SIZE=1 python -m moss_speech_decoder_cosy_tpu.bin.benchmark \
      --benchmark_dir seedtts_testset --save_dir out --lang en \
      --flow_ckpt flow.pt --hift_ckpt hift.pt --tokenizer_ckpt tok.safetensors
"""

from __future__ import annotations

import argparse
import json
import os


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
    args = p.parse_args()

    rank = int(os.environ.get("RANK", "0"))
    world = int(os.environ.get("WORLD_SIZE", "1"))

    from .inference import build_codec
    from ..eval import run_seed_tts_benchmark

    codec = build_codec(argparse.Namespace(
        flow_ckpt=args.flow_ckpt, hift_ckpt=args.hift_ckpt,
        tokenizer_ckpt=args.tokenizer_ckpt, block_size=args.block_size,
        max_token_len=args.max_token_len, bf16=args.bf16))

    stats = run_seed_tts_benchmark(
        codec, args.benchmark_dir, args.save_dir, lang=args.lang,
        block_size=args.block_size, max_token_len=args.max_token_len,
        rank=rank, world_size=world)
    print(json.dumps({"rank": rank, **stats}))
    print(f"Next: score {args.save_dir}/{args.lang} with seed-tts-eval "
          f"(external), as the reference does "
          f"(scripts/evaluate_moss_decoder.sh:76-94).")


if __name__ == "__main__":
    main()
