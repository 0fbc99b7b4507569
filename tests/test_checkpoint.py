"""Checkpoint conversion round-trips: synthesize a torch-style state_dict
from flax params via the inverse transforms, convert, and require exact
structural + numerical equality with the model's own init tree."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.traverse_util as tu
import pytest

from moss_speech_decoder_cosy_tpu.utils import checkpoint as ckpt
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config)
from moss_speech_decoder_cosy_tpu.tokenizer import (
    WhisperVQEncoder, tiny_tokenizer_config)
from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator


def _inverse(fn, x):
    x = np.asarray(x)
    if fn is None:
        return x
    if fn is ckpt._t:
        return np.ascontiguousarray(x.T)
    if fn is ckpt._conv:
        return np.ascontiguousarray(x.transpose(2, 1, 0))
    if fn is ckpt._convT:
        return np.ascontiguousarray(x.transpose(1, 2, 0))
    if fn is ckpt._g:
        return np.ascontiguousarray(x.reshape(-1, 1, 1))
    if fn is ckpt._conv2:
        return np.ascontiguousarray(x.transpose(3, 2, 0, 1))
    if fn is ckpt._dense_from_conv1:
        return np.ascontiguousarray(x.T[..., None])
    raise AssertionError(fn)


def _roundtrip(kind, cfg, params, convert):
    flat = {"/".join(k): v for k, v in
            tu.flatten_dict(params["params"]).items()}
    plan = ckpt.conversion_plan(kind, cfg)
    dsts = [d for d, _, _ in plan]
    assert len(dsts) == len(set(dsts)), "duplicate destinations"
    # every flax param must be covered by the plan and vice versa
    assert set(dsts) == set(flat), (
        sorted(set(dsts) - set(flat))[:5], sorted(set(flat) - set(dsts))[:5])
    torch_sd = {src: _inverse(fn, flat[dst]) for dst, src, fn in plan}
    tree, unused = convert(torch_sd, cfg)
    assert unused == []
    got = {"/".join(k): v for k, v in
           tu.flatten_dict(tree["params"]).items()}
    for k in flat:
        np.testing.assert_array_equal(got[k], np.asarray(flat[k]), err_msg=k)


def test_flow_conversion_roundtrip():
    cfg = tiny_flow_config()
    m = CausalMaskedDiffWithXvec(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                    jnp.ones((1, 8), bool), jnp.zeros((1, 0, cfg.output_size)),
                    jnp.zeros((1, cfg.spk_embed_dim)))
    _roundtrip("flow", cfg, params, ckpt.convert_flow_state_dict)


def test_hift_conversion_roundtrip():
    cfg = tiny_hift_config()
    m = HiFTGenerator(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, cfg.in_channels)))
    _roundtrip("hift", cfg, params, ckpt.convert_hift_state_dict)


def test_tokenizer_conversion_roundtrip():
    cfg = tiny_tokenizer_config()
    m = WhisperVQEncoder(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 16, cfg.num_mel_bins)),
                    jnp.ones((1, 16), bool))
    _roundtrip("tokenizer", cfg, params, ckpt.convert_tokenizer_state_dict)


def test_shape_filtered_merge():
    params = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    loaded = {"a": np.ones((2, 3)), "b": {"c": np.ones(5)}}
    merged, skipped = ckpt.shape_filtered_merge(params, loaded)
    np.testing.assert_array_equal(merged["a"], np.ones((2, 3)))
    np.testing.assert_array_equal(merged["b"]["c"], np.zeros(4))
    assert skipped == ["b/c"]


def test_orbax_save_load(tmp_path):
    cfg = tiny_hift_config()
    m = HiFTGenerator(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8, cfg.in_channels)))
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, params, metadata={"step": 1})
    loaded = ckpt.load_checkpoint(path, like=params)
    a = tu.flatten_dict(params["params"])
    b = tu.flatten_dict(loaded["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_reference_yaml_parsing(tmp_path):
    """hyperpyyaml-style checkpoint config -> declarative dataclasses."""
    from moss_speech_decoder_cosy_tpu.utils.ref_config import (
        configs_from_reference_yaml)
    y = tmp_path / "config.yaml"
    y.write_text("""
sample_rate: 24000
flow: !new:cosyvoice.flow.flow.CausalMaskedDiffWithXvec
    input_size: 512
    output_size: 80
    spk_embed_dim: 192
    vocab_size: 16384
    input_frame_rate: 12.5
    token_mel_ratio: 4
    pre_lookahead_len: 3
    encoder: !new:cosyvoice.transformer.upsample_encoder.UpsampleConformerEncoder
        output_size: 512
        attention_heads: 8
        linear_units: 2048
        num_blocks: 6
        input_size: 512
        use_cnn_module: False
        macaron_style: False
        static_chunk_size: 25
        upsample_stride: 4
    decoder: !new:cosyvoice.flow.flow_matching.CausalConditionalCFM
        in_channels: 240
        cfm_params: !new:omegaconf.DictConfig
            content:
                sigma_min: 1e-06
                t_scheduler: cosine
                training_cfg_rate: 0.2
                inference_cfg_rate: 0.7
        estimator: !new:cosyvoice.flow.decoder.CausalConditionalDecoder
            in_channels: 320
            out_channels: 80
            channels: [256]
            attention_head_dim: 64
            n_blocks: 4
            num_mid_blocks: 12
            num_heads: 8
            act_fn: gelu
            static_chunk_size: 50
hift: !new:cosyvoice.hifigan.generator.HiFTGenerator
    in_channels: 80
    base_channels: 512
    nb_harmonics: 8
    sampling_rate: 24000
    upsample_rates: [8, 5, 3]
    upsample_kernel_sizes: [16, 11, 7]
    istft_params:
        n_fft: 16
        hop_len: 4
""")
    flow_cfg, hift_cfg = configs_from_reference_yaml(str(y))
    assert flow_cfg.vocab_size == 16384
    assert flow_cfg.token_mel_ratio == 4
    assert flow_cfg.encoder.upsample_stride == 4
    assert flow_cfg.estimator.num_mid_blocks == 12
    assert flow_cfg.estimator.causal is True
    assert hift_cfg.total_upsample == 480


def test_qwen2_conversion_roundtrip():
    from moss_speech_decoder_cosy_tpu.models.llm.qwen2 import (
        Qwen2Model, tiny_qwen2_config)
    cfg = tiny_qwen2_config()
    m = Qwen2Model(cfg)

    def prefill(mdl, ids):
        e = mdl.embed_tokens(ids)
        return mdl.forward_embeds(e, mdl.init_cache(1))

    params = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 4), jnp.int32), method=prefill)
    _roundtrip("qwen2", cfg, params, ckpt.convert_qwen2_state_dict)


def test_jsonl_opener(tmp_path):
    import json
    from moss_speech_decoder_cosy_tpu.data import processor
    p = tmp_path / "a.jsonl"
    rows = [{"utt": "u0", "speech_token": [1, 2]},
            {"utt": "u1", "speech_token": [3]}]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    out = list(processor.jsonl_opener(iter([{"src": str(p), "epoch": 0}])))
    assert [r["utt"] for r in out] == ["u0", "u1"]
    assert out[0]["epoch"] == 0


def test_average_checkpoints():
    from moss_speech_decoder_cosy_tpu.utils.export import (
        average_checkpoints)
    a = {"w": np.asarray([1.0, 2.0]), "b": {"x": np.asarray(2.0)}}
    b = {"w": np.asarray([3.0, 4.0]), "b": {"x": np.asarray(4.0)}}
    avg = average_checkpoints([a, b])
    np.testing.assert_allclose(np.asarray(avg["w"]), [2.0, 3.0])
    np.testing.assert_allclose(np.asarray(avg["b"]["x"]), 3.0)


def test_export_serialized_roundtrip():
    from moss_speech_decoder_cosy_tpu.utils.export import (
        export_serialized, load_serialized)
    fn = lambda x: x * 2.0 + 1.0  # noqa: E731
    x = jnp.ones((4,))
    data = export_serialized(fn, x)
    assert isinstance(data, bytes) and len(data) > 0
    restored = load_serialized(data)
    np.testing.assert_allclose(np.asarray(restored(x)),
                               np.asarray(fn(x)))


def test_speech_lm_conversion_roundtrip():
    from moss_speech_decoder_cosy_tpu.models.llm.speech_lm import (
        Qwen2SpeechLM, tiny_speech_lm_config)
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.zeros((1, 4), jnp.int32)
    ps = jnp.zeros((1, 2), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, ps, jax.random.PRNGKey(1),
                    max_len=4)
    _roundtrip("speech_lm", cfg, params, ckpt.convert_speech_lm_state_dict)


def test_campplus_conversion_roundtrip():
    """campplus: plan covers every flax param; conversion is exact."""
    from moss_speech_decoder_cosy_tpu.models.campplus import CAMPPlus
    block_layers = (2, 3)
    m = CAMPPlus(embedding_size=12, growth_rate=4, bn_size=2,
                 init_channels=8, block_layers=block_layers,
                 block_dilations=(1, 2))
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 20, 16)))
    _roundtrip("campplus", block_layers, params,
               ckpt.convert_campplus_state_dict)


def test_onnx_initializer_reader():
    """Hand-encode a tiny ONNX ModelProto on the wire and read it back."""
    from moss_speech_decoder_cosy_tpu.utils.onnx_io import (
        load_onnx_initializers)

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def field(num, wire, payload):
        return varint((num << 3) | wire) + payload

    def ld(num, payload):                       # length-delimited
        return field(num, 2, varint(len(payload)) + payload)

    rng = np.random.RandomState(0)
    w = rng.randn(3, 2, 4).astype(np.float32)
    ids = np.asarray([5, 600, 70000], np.int64)

    # TensorProto 1: raw_data float32
    t1 = (ld(1, varint(3) + varint(2) + varint(4))   # dims packed
          + field(2, 0, varint(1))                   # data_type FLOAT
          + ld(8, b"weight")
          + ld(9, w.tobytes()))
    # TensorProto 2: packed int64_data, unpacked dim
    t2 = (field(1, 0, varint(3))
          + field(2, 0, varint(7))                   # INT64
          + ld(7, b"".join(varint(int(v)) for v in ids))
          + ld(8, b"ids"))
    graph = ld(5, t1) + ld(5, t2)
    model = ld(7, graph) + ld(2, b"test-producer")   # graph + producer_name

    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".onnx", delete=False) as f:
        f.write(model)
        path = f.name
    try:
        init = load_onnx_initializers(path)
    finally:
        os.unlink(path)
    assert set(init) == {"weight", "ids"}
    np.testing.assert_array_equal(init["weight"], w)
    np.testing.assert_array_equal(init["ids"], ids)


def test_async_checkpoint_manager_keep_latest(tmp_path):
    """AsyncCheckpointManager: non-blocking saves commit on wait(), keep-N
    retention deletes older steps, restore_latest round-trips."""
    import numpy as np
    import jax.numpy as jnp
    from moss_speech_decoder_cosy_tpu.utils.checkpoint import (
        AsyncCheckpointManager)
    mgr = AsyncCheckpointManager(str(tmp_path / "ckpts"), keep=2)
    like = None
    for step in (10, 20, 30):
        params = {"w": jnp.full((4,), float(step)),
                  "b": jnp.zeros((2, 3))}
        like = params
        mgr.save(step, params, metadata={"epoch": step // 10})
    mgr.wait()
    assert mgr.steps() == [20, 30]          # keep=2 dropped step 10
    loaded, step = mgr.restore_latest(like=like)
    assert step == 30
    np.testing.assert_array_equal(np.asarray(loaded["w"]),
                                  np.full((4,), 30.0))
    import os, json
    meta = json.load(open(tmp_path / "ckpts" / "step_30" / "metadata.json"))
    assert meta == {"step": 30, "epoch": 3}
