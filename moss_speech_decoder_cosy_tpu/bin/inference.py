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


def decode_v1(args, tokens, flow_cfg=None, hift_cfg=None):
    """CosyVoice-v1 token->wav (offline flow.inference, or the growing-hop
    StreamSessionV1 when --streaming).  Zero prompt; real prompts come via
    the session API (pipeline/stream_v1.py)."""
    from ..models.flow.flow_v1 import MaskedDiffWithXvec
    from ..models.hift import HiFTGenerator
    from ..utils import checkpoint as ckpt
    from ..utils.config import (cosyvoice1_flow_config,
                                cosyvoice1_hift_config)

    flow_cfg = flow_cfg or cosyvoice1_flow_config()
    hift_cfg = hift_cfg or cosyvoice1_hift_config()
    flow = MaskedDiffWithXvec(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    if args.flow_ckpt:
        sd = ckpt.load_torch_state_dict(args.flow_ckpt)
        flow_params, _ = ckpt.convert_flow_v1_state_dict(sd, flow_cfg)
    else:
        flow_params = flow.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
            jnp.zeros((1, 0), jnp.int32),
            jnp.zeros((1, 0, flow_cfg.output_size)),
            jnp.zeros((1, flow_cfg.spk_embed_dim)), 16,
            method=MaskedDiffWithXvec.inference)
        print("WARNING: random v1 flow weights (no --flow_ckpt)")
    if args.hift_ckpt:
        sd = ckpt.load_torch_state_dict(args.hift_ckpt)
        sd = ckpt.strip_prefix(sd, "generator.")
        hift_params, _ = ckpt.convert_hift_state_dict(sd, hift_cfg)
    else:
        hift_params = hift.init(jax.random.PRNGKey(1),
                                jnp.zeros((1, 8, hift_cfg.in_channels)))
        print("WARNING: random v1 hift weights (no --hift_ckpt)")

    emb = np.zeros((1, flow_cfg.spk_embed_dim), np.float32)
    pf = np.zeros((1, 0, flow_cfg.output_size), np.float32)
    if args.streaming:
        from ..pipeline.stream_v1 import StreamSessionV1
        sess = StreamSessionV1(flow, flow_params, hift, hift_params,
                               np.zeros((1, 0), np.int64), pf, emb,
                               sample_rate=hift_cfg.sampling_rate,
                               mel_hop=hift_cfg.total_upsample)
        chunks = sess.push_tokens(tokens[0])
        chunks.append(sess.finalize())
        return np.concatenate(chunks)[None]
    mel_len2 = int(tokens.shape[1] / flow_cfg.input_frame_rate
                   * hift_cfg.sampling_rate / hift_cfg.total_upsample)
    mel, _ = flow.apply(flow_params, jnp.asarray(tokens, jnp.int32),
                        jnp.zeros((1, 0), jnp.int32), jnp.asarray(pf),
                        jnp.asarray(emb), mel_len2, method=flow.inference)
    wav, _ = hift.apply(hift_params, mel)
    return np.asarray(wav)


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
    p.add_argument("--flow_version", choices=["v2", "v1"], default="v2",
                   help="v1 = the CosyVoice-v1 / stock-GLM-4-Voice "
                        "MaskedDiffWithXvec stack at 22.05 kHz "
                        "(models/flow/flow_v1.py + StreamSessionV1); "
                        "decode mode, zero prompt")
    p.add_argument("--block_size", type=int, default=5)
    p.add_argument("--max_token_len", type=int, default=40)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    from ..eval.audio_io import read_wav, write_wav, resample

    if args.flow_version == "v1":
        if args.mode != "decode":
            p.error("--flow_version v1 supports --mode decode only "
                    "(v1 has no WhisperVQ tokenizer; tokens come from files)")
        if args.input.endswith(".json"):
            tokens = np.asarray(json.load(open(args.input)))[None]
        else:
            tokens = np.load(args.input).reshape(1, -1)
        out = decode_v1(args, tokens)
        write_wav(args.output, out[0], 22050)
        print(f"wrote {args.output}: {out.shape[-1] / 22050:.2f}s")
        return

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
