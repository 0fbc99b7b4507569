"""One-call loader for a reference-layout model directory.

The reference loads a checkpoint dir in three places — ``AudioDecoder``
(GLM_modules/flow_inference.py:48-92: config.yaml + flow.pt + hift.pt +
campplus.onnx), ``CosyVoice{,2}`` (cosyvoice/cli/cosyvoice.py:27-80: adds
llm.pt, speech tokenizer, spk2info.pt) and ``GLM4Encoder``
(whisper_encoder_decoder.py:35-118: adds the WhisperVQ tokenizer dir).
``load_model_dir`` is the one-call equivalent here: it parses the
hyperpyyaml ``config.yaml`` into declarative configs
(utils/ref_config.py), converts every present torch checkpoint through
the golden-tested converters (utils/checkpoint.py), and assembles the
ready-to-serve objects:

    md = load_model_dir("path/to/model_dir")      # flow.pt + hift.pt [+...]
    wav = md.decoder.token2wav(tokens)            # (1, T*ratio*480)
    wav = md.codec.decode(tokens, md.prompt("spk"))   # with tokenizer dir

Recognized files (all optional except flow.pt + hift.pt):

    config.yaml       hyperpyyaml model config -> FlowConfig/HiFTConfig;
                      v1 vs v2 autodetected from the flow class name
    flow.pt           flow decoder weights (v1 or v2 converter)
    hift.pt           vocoder weights (``generator.`` prefix stripped)
    campplus.onnx     speaker x-vector -> native CAMPPlus (SpeakerEncoder)
    spk2info.pt       speaker prompt cache (cli/frontend.py:60-66)
    <tokenizer dir>   HF-layout WhisperVQ dir (config.json +
                      model.safetensors) via ``tokenizer=`` or a
                      ``speech_tokenizer/`` subdir
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
from typing import Any, Dict, Optional

import numpy as np


def tokenizer_config_from_json(path: str):
    """HF ``config.json`` (the GLM-4-Voice tokenizer layout,
    /root/reference/config.json) -> WhisperVQConfig."""
    from .tokenizer.config import WhisperVQConfig
    with open(path) as f:
        c = json.load(f)
    return WhisperVQConfig(
        num_mel_bins=c.get("num_mel_bins", 128),
        d_model=c.get("d_model", 1280),
        attention_heads=c.get("encoder_attention_heads", 20),
        ffn_dim=c.get("encoder_ffn_dim", 5120),
        encoder_layers=c.get("encoder_layers", 32),
        quantize_position=c.get("quantize_position", 16),
        pooling_position=c.get("pooling_position", 16),
        pooling_kernel_size=c.get("pooling_kernel_size", 4),
        quantize_vocab_size=c.get("quantize_vocab_size", 16384),
        max_source_positions=c.get("max_source_positions", 1500),
        causal_attention=c.get("encoder_causal_attention", True),
        quantize_causal_block_size=c.get("quantize_causal_block_size", 200),
        quantize_ema_decay=c.get("quantize_ema_decay", 0.99),
        quantize_commit_coefficient=c.get("quantize_commit_coefficient",
                                          0.25),
        quantize_loss_scale=c.get("quantize_loss_scale", 10.0),
        quantize_restart_interval=c.get("quantize_restart_interval", 100),
        include_post_vq=not c.get("quantize_encoder_only", True),
        decoder_layers=c.get("decoder_layers", 4),
        decoder_attention_heads=c.get("decoder_attention_heads", 20),
        decoder_ffn_dim=c.get("decoder_ffn_dim", 5120),
        vocab_size=c.get("vocab_size", 51866),
        max_target_positions=c.get("max_target_positions", 448),
    )


class V1Decoder:
    """token->wav for the v1 stack (the CosyVoiceModel decode role,
    cosyvoice/cli/model.py:29-238): offline ``token2wav`` plus the
    growing-hop ``new_session`` (pipeline/stream_v1.py).  v2 sessions
    live on pipeline.AudioDecoder; this wrapper gives the v1 family the
    same surface so ``load_model_dir`` returns one ``decoder`` either
    way."""

    def __init__(self, flow_cfg, hift_cfg, flow_params, hift_params,
                 mel_hop: int = 256):
        from .models.flow.flow_v1 import MaskedDiffWithXvec
        from .models.hift import HiFTGenerator
        self.flow_cfg, self.hift_cfg = flow_cfg, hift_cfg
        self.flow = MaskedDiffWithXvec(flow_cfg)
        self.hift = HiFTGenerator(hift_cfg)
        self.flow_params, self.hift_params = flow_params, hift_params
        self.mel_hop = mel_hop
        # mel frames per token (86.13 Hz mel / 50 Hz tokens ~= 1.72 —
        # fractional, unlike v2's exact 4)
        self.ratio = (hift_cfg.sampling_rate / mel_hop
                      / flow_cfg.input_frame_rate)

    def _defaults(self, prompt_token, prompt_feat, embedding):
        if prompt_token is None:
            prompt_token = np.zeros((1, 0), np.int32)
        if prompt_feat is None:
            prompt_feat = np.zeros(
                (1, int(round(prompt_token.shape[1] * self.ratio)),
                 self.flow_cfg.output_size), np.float32)
        if embedding is None:
            embedding = np.zeros((1, self.flow_cfg.spk_embed_dim),
                                 np.float32)
        return prompt_token, prompt_feat, embedding

    def token2wav(self, token, prompt_token=None, prompt_feat=None,
                  embedding=None) -> np.ndarray:
        """Offline decode (flow.inference(finalize) + hift),
        cli/model.py:133-163 with no streaming caches."""
        import jax.numpy as jnp
        pt, pf, emb = self._defaults(prompt_token, prompt_feat, embedding)
        token = np.asarray(token).reshape(1, -1)
        mel_len2 = int(token.shape[1] / self.flow_cfg.input_frame_rate
                       * self.hift_cfg.sampling_rate / self.mel_hop)
        mel, _ = self.flow.apply(
            self.flow_params, jnp.asarray(token, jnp.int32),
            jnp.asarray(pt, jnp.int32), jnp.asarray(pf, jnp.float32),
            jnp.asarray(emb, jnp.float32), mel_len2,
            method=self.flow.inference)
        wav, _ = self.hift.apply(self.hift_params, mel)
        return np.asarray(wav, np.float32)

    def new_session(self, prompt_token=None, prompt_feat=None,
                    embedding=None, **kw):
        from .pipeline.stream_v1 import StreamSessionV1
        pt, pf, emb = self._defaults(prompt_token, prompt_feat, embedding)
        return StreamSessionV1(self.flow, self.flow_params, self.hift,
                               self.hift_params, pt, pf, emb,
                               sample_rate=self.hift_cfg.sampling_rate,
                               mel_hop=self.mel_hop, **kw)

    def stream_inference(self, token, prompt_token=None, prompt_feat=None,
                         embedding=None, block_size=None,
                         max_token_len=None, **kw) -> np.ndarray:
        """v1 hops grow by schedule (2*fr scaling to 4*fr), so the v2
        knobs ``block_size``/``max_token_len`` are accepted for
        SpeechCodec signature compatibility and ignored."""
        sess = self.new_session(prompt_token, prompt_feat, embedding, **kw)
        chunks = sess.push_tokens(np.asarray(token).reshape(-1))
        chunks.append(sess.finalize())
        return np.concatenate([c.reshape(-1) for c in chunks])[None]


@dataclasses.dataclass
class ModelDir:
    """Everything ``load_model_dir`` assembled.  ``decoder`` is always
    present; ``codec`` only when a tokenizer checkpoint was found;
    ``speaker_encoder`` only with campplus.onnx."""
    path: str
    flow_version: str                    # "v1" | "v2"
    flow_cfg: Any
    hift_cfg: Any
    decoder: Any                         # pipeline.AudioDecoder
    codec: Optional[Any] = None          # codec.SpeechCodec
    speaker_encoder: Optional[Any] = None
    spk2info: Dict[str, Dict[str, np.ndarray]] = dataclasses.field(
        default_factory=dict)
    report: Dict[str, int] = dataclasses.field(default_factory=dict)

    def prompt(self, speaker: str):
        """spk2info entry -> codec.Prompt (the cli frontend's cached-
        speaker role, cosyvoice/cli/frontend.py:120-141).  Zero-shot
        caches carry token/feat/embedding; sft caches only an embedding —
        missing pieces default to empty."""
        from .codec import Prompt
        info = self.spk2info[speaker]
        emb = None
        for k in ("flow_embedding", "embedding"):
            if k in info:
                emb = np.asarray(info[k], np.float32).reshape(1, -1)
                break
        if emb is None:
            emb = np.zeros((1, self.flow_cfg.spk_embed_dim), np.float32)
        token = np.asarray(
            info.get("flow_prompt_speech_token",
                     np.zeros((1, 0))), np.int32).reshape(1, -1)
        feat = info.get("prompt_speech_feat")
        if feat is None:
            feat = np.zeros((1, token.shape[1] * self.decoder.ratio,
                             self.flow_cfg.output_size))
        feat = np.asarray(feat, np.float32)
        if feat.ndim == 2:
            feat = feat[None]
        return Prompt(token=token, feat=feat, embedding=emb)


def _load_spk2info(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    import torch
    raw = torch.load(path, map_location="cpu", weights_only=True)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for spk, info in raw.items():
        out[spk] = {k: (v.numpy() if hasattr(v, "numpy") else v)
                    for k, v in info.items()}
    return out


def _find_tokenizer(path: str, tokenizer: Optional[str]):
    """Resolve (config.json or None, weights file or None)."""
    cand = tokenizer or os.path.join(path, "speech_tokenizer")
    if os.path.isfile(cand):
        cfg = os.path.join(os.path.dirname(cand), "config.json")
        return (cfg if os.path.isfile(cfg) else None), cand
    if os.path.isdir(cand):
        cfg = os.path.join(cand, "config.json")
        weights = (glob.glob(os.path.join(cand, "*.safetensors"))
                   or glob.glob(os.path.join(cand, "*.pt")))
        if weights:
            return (cfg if os.path.isfile(cfg) else None), sorted(weights)[0]
    return None, None


def load_model_dir(path: str, tokenizer: Optional[str] = None,
                   pipeline=None, compute_dtype=None, estimator_dtype=None,
                   flow_version: Optional[str] = None,
                   flow_cfg=None, hift_cfg=None,
                   verbose: bool = True) -> ModelDir:
    """Assemble decoder (+codec/speaker cache) from a reference-layout
    checkpoint dir.  ``tokenizer`` optionally points at a WhisperVQ
    checkpoint file or HF dir outside ``path``.  ``flow_cfg``/``hift_cfg``
    override the yaml/default configs (non-stock checkpoint shapes)."""
    from .utils import checkpoint as ckpt
    from .utils.config import (moss_flow_config, moss_hift_config,
                               cosyvoice1_flow_config, cosyvoice1_hift_config,
                               PipelineConfig)
    from .pipeline import AudioDecoder

    report: Dict[str, int] = {}

    def p(*names):
        for n in names:
            f = os.path.join(path, n)
            if os.path.exists(f):
                return f
        return None

    # ----------------------------------------------------------- configs
    yaml_path = p("config.yaml")
    if yaml_path:
        from .utils.ref_config import (load_reference_yaml,
                                       flow_config_from_reference,
                                       hift_config_from_reference)
        ref_cfg = load_reference_yaml(yaml_path)
        cls = ref_cfg.get("flow", {}).get("__class__", "") \
            if isinstance(ref_cfg.get("flow"), dict) else ""
        detected = "v2" if "Causal" in cls else "v1"
        flow_version = flow_version or detected
        flow_cfg = flow_cfg or flow_config_from_reference(ref_cfg)
        hift_cfg = hift_cfg or hift_config_from_reference(ref_cfg)
    else:
        flow_version = flow_version or "v2"
        flow_cfg = flow_cfg or (moss_flow_config() if flow_version == "v2"
                                else cosyvoice1_flow_config())
        hift_cfg = hift_cfg or (moss_hift_config() if flow_version == "v2"
                                else cosyvoice1_hift_config())

    # ----------------------------------------------------------- weights
    flow_pt = p("flow.pt", "flow.cache.pt")
    hift_pt = p("hift.pt")
    if flow_pt is None or hift_pt is None:
        raise FileNotFoundError(
            f"model dir {path!r} needs flow.pt and hift.pt "
            f"(found flow={flow_pt}, hift={hift_pt})")
    sd = ckpt.load_torch_state_dict(flow_pt)
    if flow_version == "v1":
        flow_params, unused = ckpt.convert_flow_v1_state_dict(sd, flow_cfg)
    else:
        flow_params, unused = ckpt.convert_flow_state_dict(sd, flow_cfg)
    report["flow_unused"] = len(unused)
    sd = ckpt.load_torch_state_dict(hift_pt)
    sd = ckpt.strip_prefix(sd, "generator.")
    hift_params, unused = ckpt.convert_hift_state_dict(sd, hift_cfg)
    report["hift_unused"] = len([u for u in unused if u != "stft_window"])

    if flow_version == "v1":
        decoder = V1Decoder(flow_cfg, hift_cfg, flow_params, hift_params)
    else:
        decoder = AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params,
                               pipeline or PipelineConfig(
                                   sample_rate=hift_cfg.sampling_rate),
                               compute_dtype=compute_dtype,
                               estimator_dtype=estimator_dtype)

    # ------------------------------------------------------------ extras
    speaker_encoder = None
    campplus = p("campplus.onnx")
    if campplus:
        from .models.campplus import SpeakerEncoder
        speaker_encoder = SpeakerEncoder.from_onnx(campplus)

    codec = None
    tok_cfg_path, tok_weights = _find_tokenizer(path, tokenizer)
    if tok_weights:
        from .codec import SpeechCodec
        from .tokenizer.config import glm4_voice_tokenizer_config
        tok_cfg = (tokenizer_config_from_json(tok_cfg_path)
                   if tok_cfg_path else glm4_voice_tokenizer_config())
        sd = ckpt.load_torch_state_dict(tok_weights)
        sd = ckpt.strip_prefix(sd, "generator.encoder.", "encoder.")
        tok_params, unused = ckpt.convert_tokenizer_state_dict(sd, tok_cfg)
        report["tokenizer_unused"] = len(
            [u for u in unused if u not in
             ("embed_positions2.weight", "ema_count", "ema_weight")])
        codec = SpeechCodec(tok_cfg, tok_params, decoder,
                            speaker_encoder=speaker_encoder)

    spk2info: Dict[str, Dict[str, np.ndarray]] = {}
    spk_pt = p("spk2info.pt")
    if spk_pt:
        spk2info = _load_spk2info(spk_pt)

    if verbose:
        parts = [f"flow={flow_version}", f"hift@{hift_cfg.sampling_rate}"]
        if codec is not None:
            parts.append("tokenizer")
        if speaker_encoder is not None:
            parts.append("campplus")
        if spk2info:
            parts.append(f"{len(spk2info)} speakers")
        print(f"# load_model_dir({path}): " + ", ".join(parts)
              + f"  unused={report}")
    return ModelDir(path=path, flow_version=flow_version,
                    flow_cfg=flow_cfg, hift_cfg=hift_cfg, decoder=decoder,
                    codec=codec, speaker_encoder=speaker_encoder,
                    spk2info=spk2info, report=report)
