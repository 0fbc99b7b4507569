"""Score an already-synthesized Seed-TTS run directory — the role of the
reference's external ``seed-tts-eval/benchmark.sh ${OUTPUT_DIR}`` step
(scripts/evaluate_moss_decoder.sh:76-94), computed IN-REPO:

- WER through the repo's own Whisper ASR stack (tokenizer/asr_decoder.py)
  — the label transcription is the reference when no text tokenizer is
  available;
- speaker SIM through the CAM++ embedder (models/campplus.py).

  python -m moss_speech_decoder_cosy_tpu.bin.score \
      --save_dir out --benchmark_dir seedtts_testset --lang en \
      --tokenizer_ckpt tok.safetensors --campplus_onnx campplus.onnx
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", required=True)
    p.add_argument("--benchmark_dir", default=None,
                   help="original benchmark layout (label/prompt wavs); "
                        "without it SIM falls back to the prompt head of "
                        "prompt_concat_pred.wav and WER is skipped")
    p.add_argument("--lang", default="en", choices=["en", "zh"])
    p.add_argument("--tokenizer_ckpt", default=None,
                   help="tokenizer+decoder weights for the ASR (WER)")
    p.add_argument("--campplus_onnx", default=None,
                   help="CAM++ onnx for speaker SIM")
    p.add_argument("--bf16", action="store_true", default=True)
    args = p.parse_args()

    from ..eval.score import (make_asr_transcriber, score_seed_tts_run,
                              write_result_json)

    transcribe_fn = speaker_fn = None
    if args.tokenizer_ckpt:
        from .benchmark import build_asr
        from .inference import build_codec
        codec = build_codec(argparse.Namespace(
            flow_ckpt=None, hift_ckpt=None,
            tokenizer_ckpt=args.tokenizer_ckpt, block_size=5,
            max_token_len=40, bf16=args.bf16))
        asr = build_asr(args.tokenizer_ckpt, codec)
        if asr is not None:
            transcribe_fn = make_asr_transcriber(codec, asr)
    if args.campplus_onnx:
        from ..models.campplus import SpeakerEncoder
        speaker_fn = SpeakerEncoder.from_onnx(args.campplus_onnx)

    res = score_seed_tts_run(
        args.save_dir, args.lang, transcribe_fn=transcribe_fn,
        speaker_fn=speaker_fn, benchmark_dir=args.benchmark_dir)
    path = write_result_json(args.save_dir, {args.lang: res})
    print(json.dumps({args.lang: {"wer": res["wer"], "sim": res["sim"],
                                  "n": res["n"]}}))
    print(f"result.json: {path}")


if __name__ == "__main__":
    main()
