"""Checkpoint IO and torch-reference weight conversion.

The reference ships hyperpyyaml checkpoint dirs with ``flow.pt`` /
``hift.pt`` (flow_inference.py:53-64) and a HF/safetensors WhisperVQ
tokenizer (speech_tokenizer/utils.py:18-38).  This module maps those torch
state_dicts onto our flax parameter trees so reference weights run on TPU.

Layout conventions (see ops/convs.py):
  torch Linear (O, I)        -> flax Dense kernel (I, O)          [transpose]
  torch Conv1d (O, I, K)     -> flax 'WIO' kernel (K, I, O)       [(2,1,0)]
  torch ConvT1d (I, O, K)    -> flax 'WIO' kernel (K, I, O)       [(2,0,1)]
  torch weight_norm (g, v)   -> our (g squeezed, v transposed)
  torch LayerNorm / GroupNorm weight/bias -> scale / bias

Native checkpoints are saved with orbax (save/load_checkpoint) — the TPU
equivalent of ``torch.save`` with the YAML sidecar (train_utils.py:202-222).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Mapping

import numpy as np
import flax.traverse_util as tu

from .config import FlowConfig, HiFTConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def _t(w: Array) -> Array:            # torch Linear -> Dense
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:         # (O, I, K) -> (K, I, O)
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _convT(w: Array) -> Array:        # (I, O, K) -> (K, I, O)
    return np.ascontiguousarray(w.transpose(2, 0, 1))


def _g(w: Array) -> Array:            # weight_norm g: (O,1,1)/(I,1,1) -> 1-D
    return np.ascontiguousarray(w.reshape(-1))


def _conv2(w: Array) -> Array:        # torch Conv2d (O, I, KH, KW) -> HWIO
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _dense_from_conv1(w: Array) -> Array:   # Conv1d k1 (O, I, 1) -> (I, O)
    return np.ascontiguousarray(w[:, :, 0].T)


class _Mapper:
    """Accumulates flat {'a/b/c': array} entries and reports leftovers.

    With ``sd=None`` runs in RECORD mode: no arrays are read, just the
    (dst, src, transform) triples — used by tests to synthesize a torch
    state_dict from flax params and round-trip the conversion."""

    def __init__(self, sd: StateDict | None):
        self.record = sd is None
        self.sd = {} if sd is None else {k: np.asarray(v)
                                         for k, v in sd.items()}
        self.out: Dict[str, Array] = {}
        self.used: set = set()
        self.plan: list = []

    def put(self, dst: str, src: str, fn: Callable[[Array], Array] = None):
        self.plan.append((dst, src, fn))
        if self.record:
            return
        if src not in self.sd:
            raise KeyError(f"missing torch key: {src}")
        w = self.sd[src]
        self.out[dst] = fn(w) if fn else np.asarray(w)
        self.used.add(src)

    def maybe(self, dst: str, src: str, fn=None) -> bool:
        if self.record:
            self.put(dst, src, fn)
            return True
        if src in self.sd:
            self.put(dst, src, fn)
            return True
        return False

    def ignore(self, src: str):
        """Mark a torch-only bookkeeping key (e.g. BatchNorm
        num_batches_tracked) as consumed without emitting a param."""
        if src in self.sd:
            self.used.add(src)

    def linear(self, dst: str, src: str, bias: bool = True):
        self.put(f"{dst}/kernel", f"{src}.weight", _t)
        if bias:
            self.maybe(f"{dst}/bias", f"{src}.bias")

    def conv(self, dst: str, src: str, weight_norm: bool = False,
             transpose: bool = False):
        wfn = _convT if transpose else _conv
        if weight_norm:
            # torch >= 2.1 parametrized names or legacy weight_g/weight_v
            candidates = ((f"{src}.parametrizations.weight.original0",
                           f"{src}.parametrizations.weight.original1"),
                          (f"{src}.weight_g", f"{src}.weight_v"))
            if self.record:
                self.put(f"{dst}/g", candidates[0][0], _g)
                self.put(f"{dst}/v", candidates[0][1], wfn)
            else:
                for gk, vk in candidates:
                    if gk in self.sd:
                        self.put(f"{dst}/g", gk, _g)
                        self.put(f"{dst}/v", vk, wfn)
                        break
                else:
                    raise KeyError(f"no weight_norm params for {src}")
        else:
            self.put(f"{dst}/kernel", f"{src}.weight", wfn)
        self.maybe(f"{dst}/bias", f"{src}.bias")

    def norm(self, dst: str, src: str):
        self.put(f"{dst}/scale", f"{src}.weight")
        self.put(f"{dst}/bias", f"{src}.bias")

    def batchnorm(self, dst: str, src: str):
        """torch BatchNorm1d/2d (inference stats) -> models BatchNorm."""
        self.put(f"{dst}/scale", f"{src}.weight")
        self.put(f"{dst}/bias", f"{src}.bias")
        self.put(f"{dst}/mean", f"{src}.running_mean")
        self.put(f"{dst}/var", f"{src}.running_var")

    def conv2d(self, dst: str, src: str, bias: bool = False):
        self.put(f"{dst}/kernel", f"{src}.weight", _conv2)
        if bias:
            self.maybe(f"{dst}/bias", f"{src}.bias")

    def unused(self):
        return sorted(set(self.sd) - self.used)

    def tree(self):
        return {"params": tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in self.out.items()})}


# --------------------------------------------------------------- estimator
def _map_basic_tf_block(m: _Mapper, dst: str, src: str):
    """Matcha BasicTransformerBlock (flow/decoder.py via matcha)."""
    m.norm(f"{dst}/norm1", f"{src}.norm1")
    m.norm(f"{dst}/norm3", f"{src}.norm3")
    m.linear(f"{dst}/attn1/to_q", f"{src}.attn1.to_q", bias=False)
    m.linear(f"{dst}/attn1/to_k", f"{src}.attn1.to_k", bias=False)
    m.linear(f"{dst}/attn1/to_v", f"{src}.attn1.to_v", bias=False)
    m.linear(f"{dst}/attn1/to_out", f"{src}.attn1.to_out.0")
    m.linear(f"{dst}/ff_proj", f"{src}.ff.net.0.proj")
    m.linear(f"{dst}/ff_out", f"{src}.ff.net.2")


def _map_resnet(m: _Mapper, dst: str, src: str, causal: bool = True):
    """(Causal)ResnetBlock1D (flow/decoder.py:83-88 / matcha): causal
    blocks wrap the conv (block1/conv/conv, LayerNorm at block.2);
    non-causal matcha blocks are Conv1d + GroupNorm (block.0 / block.1)."""
    cpath = "conv/conv" if causal else "conv"
    nidx = 2 if causal else 1
    m.conv(f"{dst}/block1/{cpath}", f"{src}.block1.block.0")
    m.norm(f"{dst}/block1/norm", f"{src}.block1.block.{nidx}")
    m.conv(f"{dst}/block2/{cpath}", f"{src}.block2.block.0")
    m.norm(f"{dst}/block2/norm", f"{src}.block2.block.{nidx}")
    m.linear(f"{dst}/mlp", f"{src}.mlp.1")
    m.conv(f"{dst}/res_conv", f"{src}.res_conv")


def _map_estimator(m: _Mapper, dst: str, src: str, cfg, causal: bool = True):
    est = cfg.estimator
    m.linear(f"{dst}/time_mlp/linear_1", f"{src}.time_mlp.linear_1")
    m.linear(f"{dst}/time_mlp/linear_2", f"{src}.time_mlp.linear_2")
    n_ch = len(est.channels)
    for i in range(n_ch):
        _map_resnet(m, f"{dst}/down_res_{i}", f"{src}.down_blocks.{i}.0",
                    causal)
        for j in range(est.n_blocks):
            _map_basic_tf_block(m, f"{dst}/down_tf_{i}_{j}",
                                f"{src}.down_blocks.{i}.1.{j}")
        if i == n_ch - 1:
            if causal:
                m.conv(f"{dst}/down_conv_{i}/conv",
                       f"{src}.down_blocks.{i}.2")
            else:
                m.conv(f"{dst}/down_conv_{i}", f"{src}.down_blocks.{i}.2")
        else:
            m.conv(f"{dst}/down_conv_{i}/conv", f"{src}.down_blocks.{i}.2.conv")
    for i in range(est.num_mid_blocks):
        _map_resnet(m, f"{dst}/mid_res_{i}", f"{src}.mid_blocks.{i}.0",
                    causal)
        for j in range(est.n_blocks):
            _map_basic_tf_block(m, f"{dst}/mid_tf_{i}_{j}",
                                f"{src}.mid_blocks.{i}.1.{j}")
    for i in range(n_ch):
        _map_resnet(m, f"{dst}/up_res_{i}", f"{src}.up_blocks.{i}.0",
                    causal)
        for j in range(est.n_blocks):
            _map_basic_tf_block(m, f"{dst}/up_tf_{i}_{j}",
                                f"{src}.up_blocks.{i}.1.{j}")
        if i == n_ch - 1:
            if causal:
                m.conv(f"{dst}/up_conv_{i}/conv", f"{src}.up_blocks.{i}.2")
            else:
                m.conv(f"{dst}/up_conv_{i}", f"{src}.up_blocks.{i}.2")
        else:
            m.conv(f"{dst}/up_conv_{i}/conv", f"{src}.up_blocks.{i}.2.conv",
                   transpose=True)
    if causal:
        m.conv(f"{dst}/final_block/conv/conv", f"{src}.final_block.block.0")
        m.norm(f"{dst}/final_block/norm", f"{src}.final_block.block.2")
    else:
        m.conv(f"{dst}/final_block/conv", f"{src}.final_block.block.0")
        m.norm(f"{dst}/final_block/norm", f"{src}.final_block.block.1")
    m.conv(f"{dst}/final_proj", f"{src}.final_proj")


# ----------------------------------------------------------------- encoder
def _map_conformer_layer(m: _Mapper, dst: str, src: str, cfg):
    m.norm(f"{dst}/norm_mha", f"{src}.norm_mha")
    m.norm(f"{dst}/norm_ff", f"{src}.norm_ff")
    a = f"{src}.self_attn"
    d = f"{dst}/self_attn"
    m.linear(f"{d}/linear_q", f"{a}.linear_q")
    m.linear(f"{d}/linear_k", f"{a}.linear_k", bias=cfg.encoder.key_bias)
    m.linear(f"{d}/linear_v", f"{a}.linear_v")
    m.linear(f"{d}/linear_out", f"{a}.linear_out")
    m.linear(f"{d}/linear_pos", f"{a}.linear_pos", bias=False)
    m.put(f"{d}/pos_bias_u", f"{a}.pos_bias_u")
    m.put(f"{d}/pos_bias_v", f"{a}.pos_bias_v")
    m.linear(f"{dst}/feed_forward/w_1", f"{src}.feed_forward.w_1")
    m.linear(f"{dst}/feed_forward/w_2", f"{src}.feed_forward.w_2")
    if cfg.encoder.macaron_style:
        m.norm(f"{dst}/norm_ff_macaron", f"{src}.norm_ff_macaron")
        m.linear(f"{dst}/ff_macaron/w_1", f"{src}.feed_forward_macaron.w_1")
        m.linear(f"{dst}/ff_macaron/w_2", f"{src}.feed_forward_macaron.w_2")
    if cfg.encoder.use_cnn_module:
        m.norm(f"{dst}/norm_conv", f"{src}.norm_conv")
        m.norm(f"{dst}/norm_final", f"{src}.norm_final")
        cm, cd = f"{src}.conv_module", f"{dst}/conv_module"
        m.conv(f"{cd}/pointwise_conv1", f"{cm}.pointwise_conv1")
        m.conv(f"{cd}/depthwise_conv", f"{cm}.depthwise_conv")
        m.conv(f"{cd}/pointwise_conv2", f"{cm}.pointwise_conv2")
        if cfg.encoder.cnn_module_norm == "batch_norm":
            # torch nn.BatchNorm1d eval stats (convolution.py:84-90)
            m.put(f"{cd}/scale", f"{cm}.norm.weight")
            m.put(f"{cd}/bias", f"{cm}.norm.bias")
            m.put(f"{cd}/running_mean", f"{cm}.norm.running_mean")
            m.put(f"{cd}/running_var", f"{cm}.norm.running_var")
            m.ignore(f"{cm}.norm.num_batches_tracked")
        else:
            m.norm(f"{cd}/norm", f"{cm}.norm")


def _convert_flow(m: "_Mapper", cfg: FlowConfig):
    m.put("input_embedding/embedding", "input_embedding.weight")
    m.linear("spk_embed_affine_layer", "spk_embed_affine_layer")
    m.linear("encoder_proj", "encoder_proj")

    e = "encoder"
    m.linear(f"{e}/embed/linear", f"{e}.embed.out.0")
    m.norm(f"{e}/embed/norm", f"{e}.embed.out.1")
    m.conv(f"{e}/pre_lookahead_layer/conv1", f"{e}.pre_lookahead_layer.conv1")
    m.conv(f"{e}/pre_lookahead_layer/conv2", f"{e}.pre_lookahead_layer.conv2")
    for i in range(cfg.encoder.num_blocks):
        _map_conformer_layer(m, f"{e}/encoders_{i}", f"{e}.encoders.{i}", cfg)
    m.conv(f"{e}/up_layer/conv", f"{e}.up_layer.conv")
    m.linear(f"{e}/up_embed/linear", f"{e}.up_embed.out.0")
    m.norm(f"{e}/up_embed/norm", f"{e}.up_embed.out.1")
    for i in range(cfg.encoder.num_up_blocks):
        _map_conformer_layer(m, f"{e}/up_encoders_{i}", f"{e}.up_encoders.{i}",
                             cfg)
    m.norm(f"{e}/after_norm", f"{e}.after_norm")

    _map_estimator(m, "decoder/estimator", "decoder.estimator", cfg)


def convert_flow_state_dict(sd: StateDict, cfg: FlowConfig):
    """torch flow.pt state_dict -> flax params for CausalMaskedDiffWithXvec.

    Torch module paths follow cosyvoice/flow/flow.py:151-186 and
    transformer/upsample_encoder.py:105-246."""
    m = _Mapper(sd)
    _convert_flow(m, cfg)
    return m.tree(), m.unused()


def _convert_hift(m: "_Mapper", cfg: HiFTConfig):
    for i in range(5):
        m.conv(f"f0_predictor/cond{i}", f"f0_predictor.condnet.{2 * i}",
               weight_norm=True)
    m.linear("f0_predictor/classifier", "f0_predictor.classifier")
    m.linear("m_source/l_linear", "m_source.l_linear")
    m.conv("conv_pre", "conv_pre", weight_norm=True)
    m.conv("conv_post", "conv_post", weight_norm=True)
    for i in range(len(cfg.upsample_rates)):
        m.conv(f"ups_{i}", f"ups.{i}", weight_norm=True, transpose=True)
        m.conv(f"source_down_{i}", f"source_downs.{i}")
        ks = cfg.source_resblock_dilation_sizes[i]
        for j in range(len(ks)):
            for name, tname in (("conv1", "convs1"), ("conv2", "convs2")):
                m.conv(f"source_res_{i}/{name}_{j}",
                       f"source_resblocks.{i}.{tname}.{j}", weight_norm=True)
            for name, tname in (("act1", "activations1"),
                                ("act2", "activations2")):
                m.put(f"source_res_{i}/{name}_{j}/alpha",
                      f"source_resblocks.{i}.{tname}.{j}.alpha")
        for j in range(len(cfg.resblock_kernel_sizes)):
            r = i * len(cfg.resblock_kernel_sizes) + j
            nd = len(cfg.resblock_dilation_sizes[j])
            for k in range(nd):
                m.conv(f"resblock_{i}_{j}/conv1_{k}",
                       f"resblocks.{r}.convs1.{k}", weight_norm=True)
                m.conv(f"resblock_{i}_{j}/conv2_{k}",
                       f"resblocks.{r}.convs2.{k}", weight_norm=True)
                m.put(f"resblock_{i}_{j}/act1_{k}/alpha",
                      f"resblocks.{r}.activations1.{k}.alpha")
                m.put(f"resblock_{i}_{j}/act2_{k}/alpha",
                      f"resblocks.{r}.activations2.{k}.alpha")


def convert_hift_state_dict(sd: StateDict, cfg: HiFTConfig):
    """torch hift.pt state_dict -> flax params for HiFTGenerator
    (hifigan/generator.py:392-470 module paths)."""
    m = _Mapper(sd)
    _convert_hift(m, cfg)
    return m.tree(), m.unused()


def _convert_tokenizer(m: "_Mapper", cfg):
    m.conv("conv1", "conv1")
    m.conv("conv2", "conv2")
    m.put("embed_positions", "embed_positions.weight")
    m.put("codebook", "codebook.weight")
    for i in range(cfg.quantize_position):
        s, d = f"layers.{i}", f"layers_{i}"
        m.norm(f"{d}/self_attn_layer_norm", f"{s}.self_attn_layer_norm")
        m.norm(f"{d}/final_layer_norm", f"{s}.final_layer_norm")
        m.linear(f"{d}/self_attn/q_proj", f"{s}.self_attn.q_proj")
        m.linear(f"{d}/self_attn/k_proj", f"{s}.self_attn.k_proj",
                 bias=False)
        m.linear(f"{d}/self_attn/v_proj", f"{s}.self_attn.v_proj")
        m.linear(f"{d}/self_attn/out_proj", f"{s}.self_attn.out_proj")
        m.linear(f"{d}/fc1", f"{s}.fc1")
        m.linear(f"{d}/fc2", f"{s}.fc2")


def convert_tokenizer_state_dict(sd: StateDict, cfg):
    """HF WhisperVQEncoder weights -> flax params (pre-VQ stack).

    Accepts the raw HF names; strip prefixes like ``generator.encoder.``
    beforehand (whisper_encoder_decoder.py:90-100)."""
    m = _Mapper(sd)
    _convert_tokenizer(m, cfg)
    return m.tree(), m.unused()


def _convert_qwen2(m: "_Mapper", cfg):
    """HF Qwen2 (model.* names) -> models/llm/qwen2.Qwen2Model params."""
    m.put("embed_tokens/embedding", "model.embed_tokens.weight")
    for i in range(cfg.num_layers):
        s, d = f"model.layers.{i}", f"layers_{i}"
        m.put(f"{d}/input_layernorm/scale", f"{s}.input_layernorm.weight")
        m.put(f"{d}/post_attention_layernorm/scale",
              f"{s}.post_attention_layernorm.weight")
        m.linear(f"{d}/q_proj", f"{s}.self_attn.q_proj")
        m.linear(f"{d}/k_proj", f"{s}.self_attn.k_proj")
        m.linear(f"{d}/v_proj", f"{s}.self_attn.v_proj")
        m.linear(f"{d}/o_proj", f"{s}.self_attn.o_proj", bias=False)
        m.linear(f"{d}/gate_proj", f"{s}.mlp.gate_proj", bias=False)
        m.linear(f"{d}/up_proj", f"{s}.mlp.up_proj", bias=False)
        m.linear(f"{d}/down_proj", f"{s}.mlp.down_proj", bias=False)
    m.put("norm/scale", "model.norm.weight")


def convert_qwen2_state_dict(sd: StateDict, cfg):
    """HF Qwen2ForCausalLM state_dict -> flax Qwen2Model params
    (the CosyVoice2 LM backbone, llm.py:231-260; lm_head handled by the
    speech-LM wrapper which has its own llm_decoder)."""
    m = _Mapper(sd)
    _convert_qwen2(m, cfg)
    return m.tree(), m.unused()


def _convert_speech_lm(m: "_Mapper", cfg):
    """CosyVoice2 Qwen2LM checkpoint -> Qwen2SpeechLM params: the Qwen2
    backbone under ``llm.model.*`` (llm.py:231-260 wraps the HF model) plus
    the speech heads (llm.py:286-295)."""
    m.put("llm_embedding/embedding", "llm_embedding.weight")
    m.put("speech_embedding/embedding", "speech_embedding.weight")
    m.linear("llm_decoder", "llm_decoder")
    m.put("llm/embed_tokens/embedding", "llm.model.model.embed_tokens.weight")
    bk = cfg.backbone
    for i in range(bk.num_layers):
        s_, d = f"llm.model.model.layers.{i}", f"llm/layers_{i}"
        m.put(f"{d}/input_layernorm/scale", f"{s_}.input_layernorm.weight")
        m.put(f"{d}/post_attention_layernorm/scale",
              f"{s_}.post_attention_layernorm.weight")
        m.linear(f"{d}/q_proj", f"{s_}.self_attn.q_proj")
        m.linear(f"{d}/k_proj", f"{s_}.self_attn.k_proj")
        m.linear(f"{d}/v_proj", f"{s_}.self_attn.v_proj")
        m.linear(f"{d}/o_proj", f"{s_}.self_attn.o_proj", bias=False)
        m.linear(f"{d}/gate_proj", f"{s_}.mlp.gate_proj", bias=False)
        m.linear(f"{d}/up_proj", f"{s_}.mlp.up_proj", bias=False)
        m.linear(f"{d}/down_proj", f"{s_}.mlp.down_proj", bias=False)
    m.put("llm/norm/scale", "llm.model.model.norm.weight")


def convert_speech_lm_state_dict(sd: StateDict, cfg):
    """CosyVoice2 llm.pt -> flax Qwen2SpeechLM params."""
    m = _Mapper(sd)
    _convert_speech_lm(m, cfg)
    return m.tree(), m.unused()


def _map_transformer_layer(m: "_Mapper", dst: str, src: str,
                           key_bias: bool = True):
    """wenet TransformerEncoderLayer (encoder_layer.py:24-109) with
    rel_selfattn attention -> our ConformerEncoderLayer param names
    (norm1 -> norm_mha, norm2 -> norm_ff; macaron/cnn absent)."""
    m.norm(f"{dst}/norm_mha", f"{src}.norm1")
    m.norm(f"{dst}/norm_ff", f"{src}.norm2")
    a, d = f"{src}.self_attn", f"{dst}/self_attn"
    m.linear(f"{d}/linear_q", f"{a}.linear_q")
    m.linear(f"{d}/linear_k", f"{a}.linear_k", bias=key_bias)
    m.linear(f"{d}/linear_v", f"{a}.linear_v")
    m.linear(f"{d}/linear_out", f"{a}.linear_out")
    m.linear(f"{d}/linear_pos", f"{a}.linear_pos", bias=False)
    m.put(f"{d}/pos_bias_u", f"{a}.pos_bias_u")
    m.put(f"{d}/pos_bias_v", f"{a}.pos_bias_v")
    m.linear(f"{dst}/feed_forward/w_1", f"{src}.feed_forward.w_1")
    m.linear(f"{dst}/feed_forward/w_2", f"{src}.feed_forward.w_2")


def _convert_transformer_lm(m: "_Mapper", cfg):
    """CosyVoice v1 TransformerLM (llm.py:32-229: text embedding +
    ConformerEncoder text encoder + affine + TransformerEncoder decoder
    stack + heads) -> models/llm/transformer_lm.TransformerLM params."""
    import types as _types
    m.put("text_embedding/embedding", "text_embedding.weight")
    te = "text_encoder"
    m.linear("text_embed_in/linear", f"{te}.embed.out.0")
    m.norm("text_embed_in/norm", f"{te}.embed.out.1")
    shim = _types.SimpleNamespace(encoder=cfg.text_encoder)
    for i in range(cfg.text_encoder.num_blocks):
        _map_conformer_layer(m, f"text_enc_{i}", f"{te}.encoders.{i}", shim)
    m.norm("text_after_norm", f"{te}.after_norm")
    m.linear("text_encoder_affine_layer", "text_encoder_affine_layer")
    m.linear("spk_embed_affine_layer", "spk_embed_affine_layer")
    m.put("llm_embedding/embedding", "llm_embedding.weight")
    m.put("speech_embedding/embedding", "speech_embedding.weight")
    m.linear("llm_decoder", "llm_decoder")
    m.linear("llm/embed/linear", "llm.embed.out.0")
    m.norm("llm/embed/norm", "llm.embed.out.1")
    for i in range(cfg.llm_blocks):
        _map_transformer_layer(m, f"llm/layers_{i}", f"llm.encoders.{i}")
    m.norm("llm/after_norm", "llm.after_norm")


def convert_transformer_lm_state_dict(sd: StateDict, cfg):
    """CosyVoice v1 llm.pt -> flax TransformerLM params."""
    m = _Mapper(sd)
    _convert_transformer_lm(m, cfg)
    return m.tree(), m.unused()


def _map_whisper_enc_layer(m: "_Mapper", dst: str, src: str):
    m.norm(f"{dst}/self_attn_layer_norm", f"{src}.self_attn_layer_norm")
    m.norm(f"{dst}/final_layer_norm", f"{src}.final_layer_norm")
    m.linear(f"{dst}/self_attn/q_proj", f"{src}.self_attn.q_proj")
    m.linear(f"{dst}/self_attn/k_proj", f"{src}.self_attn.k_proj",
             bias=False)
    m.linear(f"{dst}/self_attn/v_proj", f"{src}.self_attn.v_proj")
    m.linear(f"{dst}/self_attn/out_proj", f"{src}.self_attn.out_proj")
    m.linear(f"{dst}/fc1", f"{src}.fc1")
    m.linear(f"{dst}/fc2", f"{src}.fc2")


def _convert_post_vq(m: "_Mapper", cfg):
    """WhisperVQEncoder layers AFTER quantize_position + the second
    positional table (modeling_whisper.py:1265-1269,1466-1486) ->
    tokenizer/asr_decoder.PostVQEncoder params."""
    m.put("embed_positions2", "embed_positions2.weight")
    for i in range(cfg.encoder_layers - cfg.quantize_position):
        _map_whisper_enc_layer(m, f"layers_{i}",
                               f"layers.{cfg.quantize_position + i}")
    m.norm("layer_norm", "layer_norm")


def convert_post_vq_state_dict(sd: StateDict, cfg):
    """Post-VQ slice of a WhisperVQEncoder state_dict -> PostVQEncoder
    params (pre-VQ keys are reported unused; pair with
    convert_tokenizer_state_dict on the same dict)."""
    m = _Mapper(sd)
    _convert_post_vq(m, cfg)
    return m.tree(), m.unused()


def _convert_whisper_decoder(m: "_Mapper", cfg):
    """WhisperVQDecoder (modeling_whisper.py:1614-1974) ->
    tokenizer/asr_decoder.WhisperVQDecoder params (tied output proj)."""
    m.put("embed_tokens/embedding", "embed_tokens.weight")
    m.put("embed_positions", "embed_positions.weight")
    for i in range(cfg.decoder_layers):
        s, d = f"layers.{i}", f"layers_{i}"
        m.norm(f"{d}/self_attn_layer_norm", f"{s}.self_attn_layer_norm")
        m.norm(f"{d}/encoder_attn_layer_norm", f"{s}.encoder_attn_layer_norm")
        m.norm(f"{d}/final_layer_norm", f"{s}.final_layer_norm")
        for att in ("self_attn", "encoder_attn"):
            m.linear(f"{d}/{att}/q_proj", f"{s}.{att}.q_proj")
            m.linear(f"{d}/{att}/k_proj", f"{s}.{att}.k_proj", bias=False)
            m.linear(f"{d}/{att}/v_proj", f"{s}.{att}.v_proj")
            m.linear(f"{d}/{att}/out_proj", f"{s}.{att}.out_proj")
        m.linear(f"{d}/fc1", f"{s}.fc1")
        m.linear(f"{d}/fc2", f"{s}.fc2")
    m.norm("layer_norm", "layer_norm")


def convert_whisper_decoder_state_dict(sd: StateDict, cfg):
    """torch WhisperVQDecoder state_dict -> flax WhisperVQDecoder params."""
    m = _Mapper(sd)
    _convert_whisper_decoder(m, cfg)
    return m.tree(), m.unused()


def convert_block_conformer_state_dict(sd: StateDict, enc_cfg):
    """cosyvoice1 BlockConformerEncoder (cosyvoice1/transformer/
    encoder.py:477, standalone state_dict) -> flow_v1.ConformerEncoder
    params (the block 'grid' mask is a mask knob on our side, not a
    parameter difference)."""
    import types as _types
    m = _Mapper(sd)
    m.linear("embed/linear", "embed.out.0")
    m.norm("embed/norm", "embed.out.1")
    shim = _types.SimpleNamespace(encoder=enc_cfg)
    for i in range(enc_cfg.num_blocks):
        _map_conformer_layer(m, f"encoders_{i}", f"encoders.{i}", shim)
    m.norm("after_norm", "after_norm")
    return m.tree(), m.unused()


def _convert_campplus(m: "_Mapper", block_layers=(12, 24, 16)):
    """modelscope speakerlab CAMPPlus names (the torch model the reference's
    campplus.onnx was exported from, run via onnxruntime at
    GLM_modules/flow_inference.py:86-89) -> models/campplus.py params.

    ONNX exports keep the state_dict names for initializers, so the same
    map serves both ``campplus.pt`` state_dicts and
    ``load_onnx_initializers('campplus.onnx')`` outputs."""
    # FCM 2-D front-end: conv1/bn1, layer{1,2} (two BasicResBlocks each,
    # first strided with a projection shortcut), conv2/bn2
    m.conv2d("head/conv1", "head.conv1")
    m.batchnorm("head/bn1", "head.bn1")
    for i in range(2):
        for j, tag in enumerate("ab"):
            s = f"head.layer{i + 1}.{j}"
            d = f"head/block{i}{tag}"
            m.conv2d(f"{d}/conv1", f"{s}.conv1")
            m.batchnorm(f"{d}/bn1", f"{s}.bn1")
            m.conv2d(f"{d}/conv2", f"{s}.conv2")
            m.batchnorm(f"{d}/bn2", f"{s}.bn2")
            if j == 0:                       # strided block has a projection
                m.conv2d(f"{d}/shortcut_conv", f"{s}.shortcut.0")
                m.batchnorm(f"{d}/shortcut_bn", f"{s}.shortcut.1")
    m.conv2d("head/conv2", "head.conv2")
    m.batchnorm("head/bn2", "head.bn2")

    m.put("tdnn_conv/kernel", "xvector.tdnn.linear.weight", _conv)
    m.batchnorm("tdnn_bn", "xvector.tdnn.nonlinear.batchnorm")
    for bi, n_layers in enumerate(block_layers):
        for li in range(n_layers):
            s = f"xvector.block{bi + 1}.tdnnd{li + 1}"
            d = f"block{bi}_layer{li}"
            m.batchnorm(f"{d}/bn1", f"{s}.nonlinear1.batchnorm")
            m.put(f"{d}/linear1/kernel", f"{s}.linear1.weight", _conv)
            m.batchnorm(f"{d}/bn2", f"{s}.nonlinear2.batchnorm")
            cam = f"{s}.cam_layer"
            cd = f"{d}/cam_layer"
            m.put(f"{cd}/linear_local/kernel", f"{cam}.linear_local.weight",
                  _conv)
            m.put(f"{cd}/linear1/kernel", f"{cam}.linear1.weight", _conv)
            m.maybe(f"{cd}/linear1/bias", f"{cam}.linear1.bias")
            m.put(f"{cd}/linear2/kernel", f"{cam}.linear2.weight", _conv)
            m.maybe(f"{cd}/linear2/bias", f"{cam}.linear2.bias")
        m.batchnorm(f"transit{bi}_bn",
                    f"xvector.transit{bi + 1}.nonlinear.batchnorm")
        m.put(f"transit{bi}_conv/kernel",
              f"xvector.transit{bi + 1}.linear.weight", _conv)
    m.batchnorm("out_bn", "xvector.out_nonlinear.batchnorm")
    m.put("dense/kernel", "xvector.dense.linear.weight", _dense_from_conv1)
    m.maybe("dense/bias", "xvector.dense.linear.bias")
    m.batchnorm("dense_bn", "xvector.dense.nonlinear.batchnorm")


def convert_campplus_state_dict(sd: StateDict, block_layers=(12, 24, 16)):
    """campplus torch state_dict OR onnx initializers -> CAMPPlus params.

    For the released campplus.onnx, obtain ``sd`` via
    ``utils.onnx_io.load_onnx_initializers(path)``."""
    m = _Mapper(sd)
    _convert_campplus(m, block_layers)
    unused = [k for k in m.unused() if not k.endswith("num_batches_tracked")]
    return m.tree(), unused


def _convert_flow_v1(m: "_Mapper", cfg: FlowConfig,
                     regulator_layers: int = 4):
    """v1 MaskedDiffWithXvec (flow.py:24-148): plain ConformerEncoder +
    InterpolateRegulator (length_regulator.py:21-43) + non-causal
    matcha U-Net estimator."""
    m.put("input_embedding/embedding", "input_embedding.weight")
    m.linear("spk_embed_affine_layer", "spk_embed_affine_layer")
    m.linear("encoder_proj", "encoder_proj")
    e = "encoder"
    m.linear(f"{e}/embed/linear", f"{e}.embed.out.0")
    m.norm(f"{e}/embed/norm", f"{e}.embed.out.1")
    for i in range(cfg.encoder.num_blocks):
        _map_conformer_layer(m, f"{e}/encoders_{i}", f"{e}.encoders.{i}",
                             cfg)
    m.norm(f"{e}/after_norm", f"{e}.after_norm")
    lr = "length_regulator"
    for i in range(regulator_layers):
        m.conv(f"{lr}/conv_{i}", f"{lr}.model.{3 * i}")
        m.norm(f"{lr}/norm_{i}", f"{lr}.model.{3 * i + 1}")
    m.conv(f"{lr}/out_conv", f"{lr}.model.{3 * regulator_layers}")
    _map_estimator(m, "decoder/estimator", "decoder.estimator", cfg,
                   causal=False)


def convert_flow_v1_state_dict(sd: StateDict, cfg: FlowConfig):
    """torch v1 flow.pt (MaskedDiffWithXvec) -> flow_v1 params."""
    m = _Mapper(sd)
    _convert_flow_v1(m, cfg)
    return m.tree(), m.unused()


def _convert_dit(m: _Mapper, cfg, src: str = ""):
    """cosyvoice1 stable-audio DiffusionTransformer
    (cosyvoice1/flow/stable/dit.py:15-258 + stable/transformer.py,
    continuous_transformer + prepend path) -> models/flow/dit.DiTEstimator."""
    p = src
    m.put("timestep_features/weight", f"{p}timestep_features.weight")
    m.linear("ts_embed_1", f"{p}to_timestep_embed.0")
    m.linear("ts_embed_2", f"{p}to_timestep_embed.2")
    m.linear("global_embed_1", f"{p}to_global_embed.0", bias=False)
    m.linear("global_embed_2", f"{p}to_global_embed.2", bias=False)
    m.put("preprocess/kernel", f"{p}preprocess_conv.weight",
          _dense_from_conv1)
    m.put("postprocess/kernel", f"{p}postprocess_conv.weight",
          _dense_from_conv1)
    m.linear("project_in", f"{p}transformer.project_in", bias=False)
    m.linear("project_out", f"{p}transformer.project_out", bias=False)
    m.ignore(f"{p}transformer.inv_freq")
    m.ignore(f"{p}transformer.rotary_pos_emb.inv_freq")
    for i in range(cfg.depth):
        s = f"{p}transformer.layers.{i}"
        d = f"block_{i}"
        m.put(f"{d}/pre_norm/scale", f"{s}.pre_norm.gamma")
        m.ignore(f"{s}.pre_norm.beta")
        m.linear(f"{d}/to_qkv", f"{s}.self_attn.to_qkv", bias=False)
        m.linear(f"{d}/attn_out", f"{s}.self_attn.to_out", bias=False)
        m.put(f"{d}/ff_norm/scale", f"{s}.ff_norm.gamma")
        m.ignore(f"{s}.ff_norm.beta")
        m.linear(f"{d}/ff_in", f"{s}.ff.ff.0.proj")
        m.linear(f"{d}/ff_out", f"{s}.ff.ff.2")


def convert_dit_state_dict(sd: StateDict, cfg):
    """torch stable-audio DiffusionTransformer -> DiTEstimator params."""
    m = _Mapper(sd)
    _convert_dit(m, cfg)
    return m.tree(), m.unused()


def conversion_plan(kind: str, cfg) -> list:
    """(dst, src, transform) triples for a converter, without arrays —
    lets tests synthesize a torch state_dict from flax params and
    round-trip the mapping."""
    m = _Mapper(None)
    if kind == "flow":
        _convert_flow(m, cfg)
    elif kind == "hift":
        _convert_hift(m, cfg)
    elif kind == "tokenizer":
        _convert_tokenizer(m, cfg)
    elif kind == "qwen2":
        _convert_qwen2(m, cfg)
    elif kind == "speech_lm":
        _convert_speech_lm(m, cfg)
    elif kind == "campplus":
        _convert_campplus(m, cfg if cfg is not None else (12, 24, 16))
    elif kind == "dit":
        _convert_dit(m, cfg)
    elif kind == "flow_v1":
        _convert_flow_v1(m, cfg)
    elif kind == "transformer_lm":
        _convert_transformer_lm(m, cfg)
    elif kind == "post_vq":
        _convert_post_vq(m, cfg)
    elif kind == "whisper_decoder":
        _convert_whisper_decoder(m, cfg)
    else:
        raise ValueError(kind)
    return m.plan


def strip_prefix(sd: StateDict, *prefixes: str) -> Dict[str, Array]:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, Array]:
    """Load a .pt/.safetensors state_dict to numpy (host-side torch CPU)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


# ------------------------------------------------------------- native IO
def save_checkpoint(path: str, params, metadata: dict | None = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()
    if metadata:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)


def load_checkpoint(path: str, like=None):
    import orbax.checkpoint as ocp
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), like)


class AsyncCheckpointManager:
    """Non-blocking checkpointing with a keep-latest retention policy for
    long runs: saves overlap the next train steps (orbax async), older
    step directories beyond ``keep`` are deleted once the newer save
    commits.  The training loop calls ``save(step, params)`` at cadence
    and ``wait()`` before exit."""

    def __init__(self, root: str, keep: int = 3, prefix: str = "step_"):
        import orbax.checkpoint as ocp
        self.root = os.path.abspath(root)
        self.keep = keep
        self.prefix = prefix
        os.makedirs(self.root, exist_ok=True)
        self._ckpt = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._pending_meta = []

    def _dir(self, step: int) -> str:
        return os.path.join(self.root, f"{self.prefix}{step}")

    def save(self, step: int, params, metadata: dict | None = None):
        self._ckpt.save(self._dir(step), args=_std_save_args(params),
                        force=True)
        self._pending_meta.append((step, metadata))

    def _flush_meta(self):
        for step, metadata in self._pending_meta:
            if metadata:
                with open(os.path.join(self._dir(step),
                                       "metadata.json"), "w") as f:
                    json.dump({"step": step, **metadata}, f, indent=2)
        self._pending_meta = []

    def steps(self):
        out = []
        for name in os.listdir(self.root):
            if name.startswith(self.prefix):
                try:
                    out.append(int(name[len(self.prefix):]))
                except ValueError:
                    pass
        return sorted(out)

    def gc(self):
        """Delete all but the newest ``keep`` committed checkpoints."""
        import shutil
        for step in self.steps()[: -self.keep or None]:
            shutil.rmtree(self._dir(step), ignore_errors=True)

    def wait(self):
        self._ckpt.wait_until_finished()
        self._flush_meta()
        self.gc()

    def latest(self):
        steps = self.steps()
        return steps[-1] if steps else None

    def restore_latest(self, like=None):
        step = self.latest()
        if step is None:
            return None, None
        return load_checkpoint(self._dir(step), like), step


def _std_save_args(params):
    import orbax.checkpoint as ocp
    return ocp.args.StandardSave(params)


def shape_filtered_merge(params, loaded):
    """Partial restore that skips shape-mismatched leaves, reporting them —
    the reference's shape-filtered checkpoint load (bin/train.py:149-169)."""
    flat_p = tu.flatten_dict(params)
    flat_l = tu.flatten_dict(loaded)
    skipped = []
    out = dict(flat_p)
    for k, v in flat_l.items():
        if k in flat_p and np.shape(flat_p[k]) == np.shape(v):
            out[k] = v
        else:
            skipped.append("/".join(map(str, k)))
    return tu.unflatten_dict(out), skipped
