"""Launch the continuous-batching token->wav HTTP server.

  python examples/decode_server.py --port 10010 --lanes 4 \
      --flow_ckpt flow.pt --hift_ckpt hift.pt          # production
  python examples/decode_server.py --port 10010        # random-weight demo

POST /decode_stream with JSON {"tokens": [[...]], "prompt_token"?,
"prompt_feat"?, "embedding"?, "format": "pcm16"|"oggopus"} streams the
decoded audio back while later chunks are still computing.  N concurrent
requests share ONE estimator wavefront (pipeline/kv_batcher.py) — the
vLLM-server role for the flow decode, vs the reference's per-uuid GPU
work (GLM_modules/cosyvoice/cli/model.py:60-65).

Boot pre-compiles every serving program (serving/boot.py:
boot_warmup_batcher) so the first request only pays compute.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=10010)
    p.add_argument("--lanes", type=int, default=4)
    p.add_argument("--flow_ckpt", default=None)
    p.add_argument("--hift_ckpt", default=None)
    p.add_argument("--tokenizer_ckpt", default=None)
    p.add_argument("--block_size", type=int, default=5)
    p.add_argument("--max_token_len", type=int, default=40)
    p.add_argument("--ring_tokens", type=int, default=None)
    p.add_argument("--token_cap", type=int, default=1024)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no_warmup", action="store_true")
    args = p.parse_args()

    from moss_speech_decoder_cosy_tpu.bin.inference import build_codec
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        AudioBatchEngine, AudioBatcherHTTPServer)
    from moss_speech_decoder_cosy_tpu.serving.boot import (
        boot_warmup_batcher, enable_persistent_cache)

    enable_persistent_cache()
    codec = build_codec(args)
    engine = AudioBatchEngine(codec.decoder, n_lanes=args.lanes,
                              block_size=args.block_size,
                              ring_tokens=args.ring_tokens,
                              token_cap=args.token_cap)
    if not args.no_warmup:
        boot_warmup_batcher(engine.batcher)
    print(f"decode server ready: {args.lanes} lanes on "
          f"{args.host}:{args.port}")
    AudioBatcherHTTPServer(engine, host=args.host, port=args.port).run()


if __name__ == "__main__":
    main()
