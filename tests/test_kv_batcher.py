"""Continuous-batching KV flow decoder (pipeline/kv_batcher.py): lanes
admitted/pushed/finished at arbitrary times must produce EXACTLY the same
audio as independent per-stream KVStreamDecoder sessions — the audio
analogue of serving/lm_server.py's batcher-equals-generate test."""

import numpy as np
import jax.numpy as jnp
import pytest

from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
from moss_speech_decoder_cosy_tpu.utils.config import (
    tiny_flow_config, tiny_hift_config, PipelineConfig, CFMConfig)

import dataclasses
import jax


@pytest.fixture(scope="module")
def dec():
    cfg = dataclasses.replace(
        tiny_flow_config(),
        cfm=CFMConfig(n_timesteps=3, max_noise_len=2048))
    hcfg = tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(cfg)
    hift = HiFTGenerator(hcfg)
    rng = np.random.RandomState(0)
    tok0 = jnp.zeros((1, 8), jnp.int32)
    params = jax.jit(flow.init)(
        jax.random.PRNGKey(0), tok0, jnp.ones((1, 8), bool),
        jnp.zeros((1, 0, cfg.output_size)),
        jnp.zeros((1, cfg.spk_embed_dim)))
    hift_params = jax.jit(hift.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.output_size)))
    pipe = PipelineConfig(block_size=2, mel_cache_len=2, max_token_len=9)
    del rng
    return AudioDecoder(cfg, hcfg, params, hift_params, pipe)


def _stream(dec, prompt_token, prompt_feat, emb, tokens, hop, ring):
    """Reference: one independent sequential KV session, per-hop vocoding
    (the batcher vocodes per hop, so compare against bulk_voc=False)."""
    kv = dec.kv_stream_decoder(prompt_token, prompt_feat, emb,
                               block_size=hop, ring_tokens=ring,
                               token_cap=128)
    return kv.stream_decode(tokens, bulk_voc=False)


def _mk_stream(dec, rng, n_prompt, n_tokens):
    cfg = dec.flow_cfg
    r = cfg.token_mel_ratio
    ptok = rng.randint(0, cfg.vocab_size, (1, n_prompt)).astype(np.int32)
    pfeat = rng.randn(1, n_prompt * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    toks = rng.randint(0, cfg.vocab_size, (1, n_tokens)).astype(np.int32)
    return ptok, pfeat, emb, toks


def _drain(b, lane, chunks):
    """Pump until the lane frees, collecting its chunks."""
    for _ in range(64):
        out = b.pump(max_iters=4)
        for k, v in out.items():
            chunks.setdefault(k, []).append(v)
        if not b._lanes[lane].active:
            return
    raise AssertionError("lane never drained")


def test_staggered_lanes_match_independent_sessions(dec):
    rng = np.random.RandomState(7)
    # ring NOT a multiple of hop: the sequential reference session then
    # uses the same one-hot ring writes as the lanes wavefront (with
    # ring % hop == 0 it silently switches to rotated-DUS writes, which
    # are only reassociation-equal — the ODE amplifies that to ~1e-4)
    hop, ring = 2, 7
    A = _mk_stream(dec, rng, 3, 17)
    B = _mk_stream(dec, rng, 2, 11)
    C = _mk_stream(dec, rng, 4, 9)

    b = dec.kv_batcher(n_lanes=2, block_size=hop, ring_tokens=ring,
                       token_cap=64)
    chunks = {}

    la = b.admit(A[0], A[1], A[2])
    b.push(la, A[3][0, :5])
    out = b.pump(max_iters=2)
    for k, v in out.items():
        chunks.setdefault(k, []).append(v)

    lb = b.admit(B[0], B[1], B[2])          # admit B mid-stream of A
    b.push(lb, B[3][0, :4])
    b.push(la, A[3][0, 5:])
    b.finish(la)
    out = b.pump(max_iters=3)
    for k, v in out.items():
        chunks.setdefault(k, []).append(v)

    b.push(lb, B[3][0, 4:])
    b.finish(lb)
    _drain(b, la, chunks)
    _drain(b, lb, chunks)
    assert b.free_lanes == 2

    # lane reuse: admit C into the freed pool (gets a recycled lane id, so
    # collect its chunks separately from A's)
    lc = b.admit(C[0], C[1], C[2])
    assert lc in (la, lb)
    chunks_c = {}
    b.push(lc, C[3])
    b.finish(lc)
    _drain(b, lc, chunks_c)

    for bucket, lane, (ptok, pfeat, emb, toks) in (
            (chunks, la, A), (chunks, lb, B), (chunks_c, lc, C)):
        got = np.concatenate(bucket[lane], axis=1)
        want = _stream(dec, ptok, pfeat, emb, toks, hop, ring)
        assert got.shape == want.shape, (lane, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"lane {lane}")


def test_dispatch_meter_aggregate_flops(dec):
    """The batcher's DispatchMeter must account the exact executed
    program sequence: FLOPs positive, dispatch count equal to the number
    of metered jit calls, and a second identical run doubles the count
    without growing the signature table unboundedly."""
    rng = np.random.RandomState(11)
    cfg = dec.flow_cfg
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    toks = rng.randint(0, cfg.vocab_size, (1, 13)).astype(np.int32)
    zp_tok = np.zeros((1, 0), np.int32)
    zp_feat = np.zeros((1, 0, cfg.output_size), np.float32)
    b = dec.kv_batcher(n_lanes=2, block_size=2, ring_tokens=7,
                       token_cap=64)

    def run():
        lane = b.admit(zp_tok, zp_feat, emb)
        b.push(lane, toks)
        b.finish(lane)
        chunks = {}
        _drain(b, lane, chunks)

    run()                                   # warm programs
    b.meter.enabled = True
    b.meter.reset()
    run()
    n1 = b.meter.dispatches()
    f1 = b.measured_flops()
    assert n1 > 0 and f1 > 0
    run()
    b.meter.enabled = False
    assert b.meter.dispatches() == 2 * n1
    assert b.measured_flops() == pytest.approx(2 * f1)


def test_lanes_kernel_matches_xla_engine(dec):
    """The Pallas lanes wavefront (per-row write offsets,
    wave_lanes_step_pallas via kernel=True; interpret mode off-TPU) ==
    the XLA lanes engine, same staggered protocol."""
    rng = np.random.RandomState(21)
    hop, ring = 2, 6
    ptok, pfeat, emb, toks = _mk_stream(dec, rng, 3, 17)

    def run(kernel):
        b = dec.kv_batcher(n_lanes=2, block_size=hop, ring_tokens=ring,
                           token_cap=64, kernel=kernel)
        lane = b.admit(ptok, pfeat, emb)
        b.push(lane, toks)
        b.finish(lane)
        chunks = {}
        _drain(b, lane, chunks)
        return np.concatenate(chunks[lane], axis=1)

    ref = run(False)
    got = run(True)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_int8_ring_quant_session_and_batcher(dec):
    """int8-quantized estimator rings (the quality-ring HBM mitigation,
    kv_stream.py::quantize_ring_chunk): bounded deviation vs the float
    concat engine, batcher == independent quantized session, and the
    ring bytes actually shrink."""
    from moss_speech_decoder_cosy_tpu.models.flow.kv_stream import (
        init_kv_cache, est_cache_bytes)
    rng = np.random.RandomState(13)
    hop, ring = 2, 6
    ptok, pfeat, emb, toks = _mk_stream(dec, rng, 3, 17)

    ref = dec.kv_stream_decoder(ptok, pfeat, emb, block_size=hop,
                                ring_tokens=ring, token_cap=64,
                                fused=False).stream_decode(toks)
    kvq = dec.kv_stream_decoder(ptok, pfeat, emb, block_size=hop,
                                ring_tokens=ring, token_cap=64,
                                ring_quant=True)
    assert kvq._quant and not kvq._fused and not kvq._dus_ok
    q = kvq.stream_decode(toks)
    assert q.shape == ref.shape
    rel = float(np.abs(q - ref).mean() / (np.abs(ref).mean() + 1e-9))
    assert rel < 0.05, rel          # lossy but tightly bounded

    b = dec.kv_batcher(n_lanes=2, block_size=hop, ring_tokens=ring,
                       token_cap=64, ring_quant=True)
    lane = b.admit(ptok, pfeat, emb)
    b.push(lane, toks)
    b.finish(lane)
    chunks = {}
    _drain(b, lane, chunks)
    got = np.concatenate(chunks[lane], axis=1)
    np.testing.assert_allclose(got, q, atol=2e-5)

    full = est_cache_bytes(init_kv_cache(dec.flow_cfg, ring)["est"])
    quant = est_cache_bytes(
        init_kv_cache(dec.flow_cfg, ring, est_quant=True)["est"])
    assert quant < full


def test_hbm_spill_policy_plan():
    """serving/audio_batcher.plan_lanes: full rings when they fit, int8
    spill when not, lane cap as the last resort."""
    from moss_speech_decoder_cosy_tpu.serving.audio_batcher import (
        plan_lanes)

    class _Dec:                      # structural stand-in for AudioDecoder
        pass

    import dataclasses as _dc
    cfg = _dc.replace(tiny_flow_config(),
                      cfm=CFMConfig(n_timesteps=3, max_noise_len=2048))

    class P:
        block_size, max_token_len, mel_cache_len = 2, 9, 2
    d = _Dec()
    d.flow_cfg = cfg
    d.pipe_cfg = P()
    d.compute_dtype = None
    d.estimator_dtype = None
    d.ratio = cfg.token_mel_ratio

    n, quant, per_lane, note = plan_lanes(d, 4, 7, 2, 1 << 30)
    assert (n, quant) == (4, False) and per_lane > 0
    n2, quant2, per2, _ = plan_lanes(d, 4, 7, 2, 4 * per_lane - 1)
    assert quant2 and n2 == 4 and per2 < per_lane
    n3, quant3, _, note3 = plan_lanes(d, 4, 7, 2, 2 * per2)
    assert quant3 and n3 == 2 and "capped" in note3


def test_promptless_and_short_stream(dec):
    """A lane with no prompt, and a stream shorter than hop+lookahead
    (finalize-only, zero steady chunks)."""
    rng = np.random.RandomState(9)
    cfg = dec.flow_cfg
    hop, ring = 2, 7
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    toks = rng.randint(0, cfg.vocab_size, (1, 13)).astype(np.int32)
    short = rng.randint(0, cfg.vocab_size, (1, 3)).astype(np.int32)
    zp_tok = np.zeros((1, 0), np.int32)
    zp_feat = np.zeros((1, 0, cfg.output_size), np.float32)

    b = dec.kv_batcher(n_lanes=2, block_size=hop, ring_tokens=ring,
                       token_cap=64)
    l0 = b.admit(zp_tok, zp_feat, emb)
    l1 = b.admit(zp_tok, zp_feat, emb)
    b.push(l0, toks)
    b.finish(l0)
    b.push(l1, short)
    b.finish(l1)
    chunks = {}
    _drain(b, l0, chunks)
    _drain(b, l1, chunks)

    for lane, t in ((l0, toks), (l1, short)):
        got = np.concatenate(chunks[lane], axis=1)
        want = _stream(dec, zp_tok, zp_feat, emb, t, hop, ring)
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"lane {lane}")
