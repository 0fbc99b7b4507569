"""Inference CLI: tokens/wav -> wav (the whisper_encoder_decoder.py __main__
and cosyvoice/bin/inference.py use cases).

Modes:
  reconstruct  wav -> tokens -> wav (voice conversion when --prompt_wav set)
  decode       token .npy/.json -> wav
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp


def build_codec(args):
    import dataclasses
    from ..codec import SpeechCodec
    from ..pipeline import AudioDecoder
    from ..models.flow import CausalMaskedDiffWithXvec
    from ..models.hift import HiFTGenerator
    from ..tokenizer import WhisperVQEncoder, glm4_voice_tokenizer_config
    from ..utils.config import (moss_flow_config, moss_hift_config,
                                PipelineConfig)
    from ..utils import checkpoint as ckpt

    flow_cfg, hift_cfg = moss_flow_config(), moss_hift_config()
    tok_cfg = glm4_voice_tokenizer_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    tok = WhisperVQEncoder(tok_cfg)

    if args.flow_ckpt and args.flow_ckpt.endswith(".pt"):
        sd = ckpt.load_torch_state_dict(args.flow_ckpt)
        flow_params, unused = ckpt.convert_flow_state_dict(sd, flow_cfg)
        print(f"flow: {len(unused)} unused torch keys")
    elif args.flow_ckpt:
        flow_params = ckpt.load_checkpoint(args.flow_ckpt)
    else:
        flow_params = jax.jit(flow.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
            jnp.ones((1, 8), bool), jnp.zeros((1, 0, 80)),
            jnp.zeros((1, 192)))
        print("WARNING: random flow weights (no --flow_ckpt)")

    if args.hift_ckpt and args.hift_ckpt.endswith(".pt"):
        sd = ckpt.load_torch_state_dict(args.hift_ckpt)
        hift_params, _ = ckpt.convert_hift_state_dict(sd, hift_cfg)
    elif args.hift_ckpt:
        hift_params = ckpt.load_checkpoint(args.hift_ckpt)
    else:
        hift_params = jax.jit(hift.init)(jax.random.PRNGKey(1),
                                         jnp.zeros((1, 8, 80)))
        print("WARNING: random hift weights (no --hift_ckpt)")

    if args.tokenizer_ckpt:
        sd = ckpt.load_torch_state_dict(args.tokenizer_ckpt)
        sd = ckpt.strip_prefix(sd, "generator.encoder.", "encoder.")
        tok_params, _ = ckpt.convert_tokenizer_state_dict(sd, tok_cfg)
    else:
        tok_params = tok.init(jax.random.PRNGKey(2),
                              jnp.zeros((1, 16, tok_cfg.num_mel_bins)),
                              jnp.ones((1, 16), bool))
        print("WARNING: random tokenizer weights (no --tokenizer_ckpt)")

    dt = jnp.bfloat16 if args.bf16 else None
    dec = AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params,
                       PipelineConfig(block_size=args.block_size,
                                      max_token_len=args.max_token_len),
                       compute_dtype=dt)
    return SpeechCodec(tok_cfg, tok_params, dec)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["reconstruct", "decode"],
                   default="reconstruct")
    p.add_argument("--input", required=True,
                   help="wav (reconstruct) or token .npy/.json (decode)")
    p.add_argument("--output", required=True)
    p.add_argument("--prompt_wav", default=None)
    p.add_argument("--flow_ckpt", default=None)
    p.add_argument("--hift_ckpt", default=None)
    p.add_argument("--tokenizer_ckpt", default=None)
    p.add_argument("--streaming", action="store_true")
    p.add_argument("--engine", choices=["windowed", "kv"],
                   default="windowed",
                   help="streaming engine: reference-semantics windowed "
                        "re-decode, or the compute-once KV wavefront "
                        "(pipeline/kv_session.py; fastest)")
    p.add_argument("--block_size", type=int, default=5)
    p.add_argument("--max_token_len", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    from ..eval.audio_io import read_wav, write_wav, resample
    codec = build_codec(args)

    prompt = None
    if args.prompt_wav:
        wav, sr = read_wav(args.prompt_wav)
        prompt = codec.prepare_prompt(resample(wav, sr, 24000),
                                      resample(wav, sr, 16000))

    if args.mode == "reconstruct":
        wav, sr = read_wav(args.input)
        tokens = codec.encode(resample(wav, sr, 16000))
        print(f"{tokens.shape[1]} tokens")
    else:
        if args.input.endswith(".json"):
            tokens = np.asarray(json.load(open(args.input)))[None]
        else:
            tokens = np.load(args.input).reshape(1, -1)

    if args.streaming and args.engine == "kv":
        kw = {}
        if prompt is not None:
            kw = dict(prompt_token=prompt.token, prompt_feat=prompt.feat,
                      embedding=prompt.embedding)
        kv = codec.decoder.kv_stream_decoder(
            block_size=args.block_size,
            ring_tokens=args.max_token_len - args.block_size,
            token_cap=tokens.shape[1] + 16, **kw)
        out = kv.stream_decode(tokens)
    elif args.streaming:
        out = codec.decode_streaming(tokens, prompt,
                                     block_size=args.block_size,
                                     max_token_len=args.max_token_len)
    else:
        out = codec.decode(tokens, prompt)
    write_wav(args.output, out[0], 24000)
    print(f"wrote {args.output}: {out.shape[-1] / 24000:.2f}s")


if __name__ == "__main__":
    main()
