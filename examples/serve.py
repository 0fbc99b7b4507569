"""Launch the streaming voice server (ws protocol + browser demo page).

  python examples/serve.py --port 8888                 # echo handler
  python examples/serve.py --prompt_wav speaker.wav \
      --flow_ckpt flow.pt --hift_ckpt hift.pt \
      --tokenizer_ckpt tokenizer.safetensors           # voice conversion

The page at http://host:8888/ streams uploaded audio over the websocket in
80 ms frames (reference server.py protocol) and plays back the result.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8888)
    p.add_argument("--prompt_wav", default=None)
    p.add_argument("--flow_ckpt", default=None)
    p.add_argument("--hift_ckpt", default=None)
    p.add_argument("--tokenizer_ckpt", default=None)
    p.add_argument("--block_size", type=int, default=5)
    p.add_argument("--max_token_len", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    from moss_speech_decoder_cosy_tpu.serving.web_demo import (
        WebDemo, make_vc_handler)

    handler = None
    if args.prompt_wav:
        from moss_speech_decoder_cosy_tpu.bin.inference import build_codec
        from moss_speech_decoder_cosy_tpu.eval.audio_io import (
            read_wav, resample)
        codec = build_codec(args)
        wav, sr = read_wav(args.prompt_wav)
        prompt = codec.prepare_prompt(resample(wav, sr, 24000),
                                      resample(wav, sr, 16000))
        # compile/cache-load every serving program BEFORE accepting
        # traffic (serving/boot.py; first request then only pays compute)
        from moss_speech_decoder_cosy_tpu.serving.boot import boot_warmup
        boot_warmup(codec=codec, prompt=prompt)
        handler = make_vc_handler(codec, prompt)
        print("voice-conversion handler ready")
    else:
        print("no --prompt_wav: serving echo handler")

    WebDemo(handler=handler, host=args.host, port=args.port).run()


if __name__ == "__main__":
    main()
