"""KV-cached incremental streaming flow: exact equivalence with the banded
chunk-causal full forward, and quantified deviation vs the reference's
windowed re-decode semantics (flow_inference.py:194-204)."""

import numpy as np
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.utils.config import tiny_flow_config
from moss_speech_decoder_cosy_tpu.models.flow import CausalMaskedDiffWithXvec
from moss_speech_decoder_cosy_tpu.models.flow.kv_stream import (
    KVFlowStep, init_kv_cache, pe_tables, fuse_qkv_params)
from moss_speech_decoder_cosy_tpu.ops.masks import banded_chunk_mask


def _setup(seed=0, p=6, n=23):
    cfg = tiny_flow_config()
    flow = CausalMaskedDiffWithXvec(cfg)
    rng = np.random.RandomState(seed)
    r = cfg.token_mel_ratio
    tokens = rng.randint(0, cfg.vocab_size, (1, p + n)).astype(np.int32)
    prompt_feat = rng.randn(1, p * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    valid = np.ones((1, p + n), bool)
    params = flow.init(jax.random.PRNGKey(1), jnp.asarray(tokens),
                       jnp.asarray(valid), jnp.asarray(prompt_feat),
                       jnp.asarray(emb))
    return cfg, flow, params, tokens, prompt_feat, emb, valid


def _schedule(p, n, hop, la):
    """Chunk end positions (token units): prompt, steady hops, tail."""
    bounds = [p]
    off = 0
    while n - off >= hop + la:
        off += hop
        bounds.append(p + off)
    return bounds, off


def _run_incremental(cfg, params, tokens, prompt_feat, emb, p, hop,
                     ring_tokens):
    la = cfg.pre_lookahead_len
    r = cfg.token_mel_ratio
    n = tokens.shape[1] - p
    step = KVFlowStep(cfg)
    params = fuse_qkv_params(params)
    apply = jax.jit(step.apply, static_argnames=("finalize",))
    cache = init_kv_cache(cfg, ring_tokens)
    pe_tok, pe_mel = pe_tables(cfg, 64)
    stream = tokens[:, p:]
    zeros_ctx = np.zeros((1, la), np.int32)

    _, cache = apply(params, tokens[:, :p], stream[:, :la],
                     prompt_feat, emb, cache, pe_tok, pe_mel,
                     finalize=False)
    mels = []
    off = 0
    while n - off >= hop + la:
        chunk = stream[:, off:off + hop]
        ctx = stream[:, off + hop:off + hop + la]
        cond = np.zeros((1, hop * r, cfg.output_size), np.float32)
        mel, cache = apply(params, chunk, ctx, cond, emb, cache,
                           pe_tok, pe_mel, finalize=False)
        mels.append(mel)
        off += hop
    tail = stream[:, off:]
    cond = np.zeros((1, tail.shape[1] * r, cfg.output_size), np.float32)
    mel, cache = apply(params, tail, zeros_ctx, cond, emb, cache,
                       pe_tok, pe_mel, finalize=True)
    mels.append(mel)
    return np.concatenate([np.asarray(m) for m in mels], axis=1)


def test_kv_incremental_matches_banded_forward():
    """Prefill + per-hop KV steps == ONE forward with the banded mask,
    token for token (the defining property of the KV streaming path)."""
    p, n, hop, ring_t = 6, 23, 4, 8
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    la = cfg.pre_lookahead_len
    r = cfg.token_mel_ratio
    t = p + n

    bounds, _ = _schedule(p, n, hop, la)
    m_tok = banded_chunk_mask(bounds, t, ring_t)
    m_mel = banded_chunk_mask([b * r for b in bounds], t * r, ring_t * r)
    full = flow.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                      jnp.asarray(prompt_feat), jnp.asarray(emb),
                      streaming=False, finalize=True,
                      kv_masks=(m_tok, m_mel, m_mel))
    inc = _run_incremental(cfg, params, tokens, prompt_feat, emb, p, hop,
                           ring_t)
    ref = np.asarray(full)[:, p * r:]
    assert inc.shape == ref.shape
    np.testing.assert_allclose(inc, ref, atol=5e-4, rtol=1e-3)


def test_kv_incremental_no_prompt():
    """Zero-length prompt: prefill degenerates away; first hop starts the
    rings from empty."""
    p, n, hop, ring_t = 0, 15, 4, 8
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    la = cfg.pre_lookahead_len
    r = cfg.token_mel_ratio
    bounds, _ = _schedule(p, n, hop, la)
    bounds = [b for b in bounds if b > 0]
    m_tok = banded_chunk_mask(bounds, n, ring_t)
    m_mel = banded_chunk_mask([b * r for b in bounds], n * r, ring_t * r)
    full = flow.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                      jnp.asarray(prompt_feat), jnp.asarray(emb),
                      streaming=False, finalize=True,
                      kv_masks=(m_tok, m_mel, m_mel))

    # incremental without prefill
    step = KVFlowStep(cfg)
    params = fuse_qkv_params(params)
    apply = jax.jit(step.apply, static_argnames=("finalize",))
    cache = init_kv_cache(cfg, ring_t)
    pe_tok, pe_mel = pe_tables(cfg, 64)
    mels = []
    off = 0
    while n - off >= hop + la:
        chunk = tokens[:, off:off + hop]
        ctx = tokens[:, off + hop:off + hop + la]
        cond = np.zeros((1, hop * r, cfg.output_size), np.float32)
        mel, cache = apply(params, chunk, ctx, cond, emb, cache,
                           pe_tok, pe_mel, finalize=False)
        mels.append(mel)
        off += hop
    tail = tokens[:, off:]
    cond = np.zeros((1, tail.shape[1] * r, cfg.output_size), np.float32)
    mel, cache = apply(params, tail, np.zeros((1, la), np.int32), cond,
                       emb, cache, pe_tok, pe_mel, finalize=True)
    mels.append(mel)
    inc = np.concatenate([np.asarray(m) for m in mels], axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), atol=5e-4, rtol=1e-3)


def test_kv_session_matches_banded_composition():
    """KVStreamDecoder.stream_decode (device session: prefill + scan-bucket
    hops + cached vocoder) == banded full-forward mel fed through the same
    per-hop vocoder chain."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    p, n, hop, ring_t = 2, 30, 3, 6
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    hcfg = tiny_hift_config()
    hift = HiFTGenerator(hcfg)
    r = cfg.token_mel_ratio
    la = cfg.pre_lookahead_len
    mel0 = jnp.zeros((1, 8, hcfg.in_channels))
    hift_params = hift.init(jax.random.PRNGKey(2), mel0)
    pipe = PipelineConfig(block_size=hop, mel_cache_len=2, max_token_len=9)
    dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)

    kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                               block_size=hop, ring_tokens=ring_t,
                               token_cap=64)
    got = kv.stream_decode(tokens[:, p:])

    # reference: banded full forward -> same per-hop vocoder chain
    bounds, _ = _schedule(p, n, hop, la)
    t = p + n
    m_tok = banded_chunk_mask(bounds, t, ring_t)
    m_mel = banded_chunk_mask([b * r for b in bounds], t * r, ring_t * r)
    full = flow.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                      jnp.asarray(prompt_feat), jnp.asarray(emb),
                      streaming=False, finalize=True,
                      kv_masks=(m_tok, m_mel, m_mel))
    mel = np.asarray(full)[:, p * r:]
    _, voc = kv.init_state()
    segs = []
    off = 0
    first = True
    for emit_tokens, finalize in kv.schedule(n):
        emit = jnp.asarray(mel[:, off * r:(off + emit_tokens) * r])
        seg, voc = kv._voc(hift_params, emit, voc,
                           first=first, finalize=finalize)
        segs.append(np.asarray(seg))
        off += emit_tokens
        first = False
    want = np.concatenate(segs, axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_bulk_vocode_matches_per_hop_chain():
    """stream_decode(bulk_voc=True): one batched HiFT pass + shifted head
    fixes == the sequential per-hop vocoder chain, sample for sample."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    p, n, hop, ring_t = 2, 34, 3, 6
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    hcfg = tiny_hift_config()
    hift = HiFTGenerator(hcfg)
    mel0 = jnp.zeros((1, 8, hcfg.in_channels))
    hift_params = hift.init(jax.random.PRNGKey(2), mel0)
    pipe = PipelineConfig(block_size=hop, mel_cache_len=2, max_token_len=9)
    dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)
    kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                               block_size=hop, ring_tokens=ring_t,
                               token_cap=64)
    seq = kv.stream_decode(tokens[:, p:], bulk_voc=False)
    bulk = kv.stream_decode(tokens[:, p:], bulk_voc=True)
    assert bulk.shape == seq.shape
    np.testing.assert_allclose(bulk, seq, atol=1e-5)


def test_wavefront_matches_sequential_kv():
    """Pipelined-ODE wavefront (all ODE steps in one batched estimator
    forward per iteration) == the sequential per-hop KV path, exactly."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    p, n, hop, ring_t = 2, 34, 3, 6
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    hcfg = tiny_hift_config()
    hift = HiFTGenerator(hcfg)
    hift_params = hift.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 8, hcfg.in_channels)))
    pipe = PipelineConfig(block_size=hop, mel_cache_len=2, max_token_len=9)
    dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)
    kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                               block_size=hop, ring_tokens=ring_t,
                               token_cap=64)
    seq = kv.stream_decode(tokens[:, p:], bulk_voc=True, wavefront=False)
    wave = kv.stream_decode(tokens[:, p:], bulk_voc=True, wavefront=True,
                            wave_stepped=False)
    assert wave.shape == seq.shape
    np.testing.assert_allclose(wave, seq, atol=1e-4)
    # donated-buffer stepped loop (one-hot writes) == the scan form
    # (shared-offset DUS writes when ring % hop == 0) up to float
    # reassociation of the ring-write op order
    stepped = kv.stream_decode(tokens[:, p:], bulk_voc=True,
                               wavefront=True, wave_stepped=True)
    np.testing.assert_allclose(stepped, wave, atol=1e-6)
    # and the one-hot scan agrees with the DUS scan the same way
    # (p=2 with cf=12 makes align=8 — exercises the two-part DUS split)
    assert kv._dus_ok and kv._align != 0
    # the write_mode perf knob: forcing onehot in the SCAN form matches
    # the DUS scan (same op set as stepped, exercised via the public API)
    kv1 = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, write_mode="onehot")
    assert not kv1._dus_ok
    onehot = kv1.stream_decode(tokens[:, p:], bulk_voc=True,
                               wavefront=True, wave_stepped=False)
    np.testing.assert_allclose(onehot, wave, atol=1e-6)
    # fused write-then-attend wavefront (rings extended to ring+chunk,
    # chunk K/V written into the ring inside the estimator, no
    # [ring ++ chunk] concat): same math up to the key-slot permutation
    # in the softmax reduction order.  DUS geometry with align != 0
    # exercises the split write; the onehot-fused variant covers
    # arbitrary geometry.
    kvf = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, fused=True)
    assert kvf._dus_ok and kvf._fused
    fused = kvf.stream_decode(tokens[:, p:], bulk_voc=True,
                              wavefront=True, wave_stepped=False)
    np.testing.assert_allclose(fused, wave, atol=1e-5)
    kvf1 = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                 block_size=hop, ring_tokens=ring_t,
                                 token_cap=64, write_mode="onehot",
                                 fused=True)
    assert not kvf1._dus_ok and kvf1._fused
    fused1 = kvf1.stream_decode(tokens[:, p:], bulk_voc=True,
                                wavefront=True, wave_stepped=False)
    np.testing.assert_allclose(fused1, wave, atol=1e-5)
    # stacked-layer wavefront (the homogeneous estimator layer groups
    # collapsed into lax.scans over stacked parameter leaves, fused DUS
    # writes composed on the stacked ring carries): BIT-exact vs the
    # unstacked fused wavefront — identical flax modules applied per
    # layer, identical op order.  p=2 with cf=6 gives align != 0, so the
    # split chunk write on the stacked buffer is exercised too.
    kvst = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                 block_size=hop, ring_tokens=ring_t,
                                 token_cap=64, fused=True, stacked=True)
    assert kvst._stacked and kvst._align != 0
    stacked = kvst.stream_decode(tokens[:, p:], bulk_voc=True,
                                 wavefront=True, wave_stepped=False)
    np.testing.assert_array_equal(np.asarray(stacked), np.asarray(fused))
    # Pallas fused-block wavefront (each resnet + transformer group as
    # ONE kernel launch, ops/pallas_block.py; interpret mode off-TPU):
    # tolerance-pinned vs the fused XLA engine — the kernel mirrors the
    # math op for op (f32 CPU measures ~1e-8; Mosaic-vs-XLA matmul
    # rounding differences on hardware stay within bf16 noise).
    # align != 0 exercises the wrapped static-offset chunk store.
    kvk = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, fused=True, kernel=True)
    assert kvk._kernel and kvk._kernel_explicit and kvk._align != 0
    kern = kvk.stream_decode(tokens[:, p:], bulk_voc=True,
                             wavefront=True, wave_stepped=False)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(fused),
                               atol=2e-5)
    # fused-conformer encoder hop (ops/pallas_conformer.py, opt-in —
    # measured neutral on hardware, kept for the op-collapse record)
    kve = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, fused=True, kernel=True,
                                enc_kernel=True)
    assert kve._enc_kernel
    enck = kve.stream_decode(tokens[:, p:], bulk_voc=True,
                             wavefront=True, wave_stepped=False)
    np.testing.assert_allclose(np.asarray(enck), np.asarray(fused),
                               atol=2e-5)
    # and at lockstep batch 2 (rows = S*2*B exercises the row tiling)
    toks2 = np.concatenate([tokens[:, p:], tokens[:, p:][:, ::-1]], axis=0)
    kvf2 = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                 block_size=hop, ring_tokens=ring_t,
                                 token_cap=64, fused=True, batch=2)
    kvk2 = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                 block_size=hop, ring_tokens=ring_t,
                                 token_cap=64, fused=True, kernel=True,
                                 batch=2)
    f2 = kvf2.stream_decode(toks2, bulk_voc=True, wavefront=True)
    k2 = kvk2.stream_decode(toks2, bulk_voc=True, wavefront=True)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(f2), atol=2e-5)


def test_wavefront_hop_aligned_prompts_match_sequential():
    """Wavefront == sequential also for hop-aligned / empty prompts
    (p=0 exercises the no-prefill entry; p=3 a hop-multiple prompt —
    complements the p=2 case above)."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    for p in (0, 3):                       # base_frames = 0, 12; cf = 12
        n, hop, ring_t = 34, 3, 6
        cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(
            p=p, n=n)
        hcfg = tiny_hift_config()
        hift = HiFTGenerator(hcfg)
        hift_params = hift.init(jax.random.PRNGKey(2),
                                jnp.zeros((1, 8, hcfg.in_channels)))
        pipe = PipelineConfig(block_size=hop, mel_cache_len=2,
                              max_token_len=9)
        dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)
        kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat,
                                   emb, block_size=hop,
                                   ring_tokens=ring_t, token_cap=64)
        seq = kv.stream_decode(tokens[:, p:], bulk_voc=True,
                               wavefront=False)
        wave = kv.stream_decode(tokens[:, p:], bulk_voc=True,
                                wavefront=True)
        assert wave.shape == seq.shape
        np.testing.assert_allclose(wave, seq, atol=1e-4,
                                   err_msg=f"p={p}")


def test_segmented_wavefront_matches_unsegmented():
    """stream_decode(segmented=True): the wavefront scan split into
    fixed-size resumable segments with per-segment bulk vocode + carry
    tails == the one-pass wavefront decode, for every segment size
    (incl. sizes that leave whole segments with no finished chunk and a
    first segment bearing a single chunk)."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    p, n, hop, ring_t = 2, 30, 3, 6
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    hcfg = tiny_hift_config()
    hift = HiFTGenerator(hcfg)
    hift_params = hift.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 8, hcfg.in_channels)))
    pipe = PipelineConfig(block_size=hop, mel_cache_len=2, max_token_len=9)
    dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)
    kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                               block_size=hop, ring_tokens=ring_t,
                               token_cap=64)
    want = kv.stream_decode(tokens[:, p:])
    for seg_iters in (2, 3, 5, 16):
        got = kv.stream_decode(tokens[:, p:], segmented=True,
                               seg_iters=seg_iters)
        assert got.shape == want.shape, (seg_iters, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=1e-6)
    # int16 output path + promptless session
    w16 = kv.stream_decode(tokens[:, p:], output="int16")
    g16 = kv.stream_decode(tokens[:, p:], output="int16",
                           segmented=True, seg_iters=3)
    np.testing.assert_array_equal(w16, g16)
    kvn = dec.kv_stream_decoder(block_size=hop, ring_tokens=ring_t,
                                token_cap=64)
    wn = kvn.stream_decode(tokens[:, p:])
    gn = kvn.stream_decode(tokens[:, p:], segmented=True, seg_iters=3)
    np.testing.assert_allclose(gn, wn, atol=1e-6)
    # fused write-then-attend session: segmented == unsegmented == the
    # concat-form stream (extended rings carry across donated segment
    # boundaries; _fin_est re-modulos them for the finalize hop)
    kvf = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, fused=True)
    wf = kvf.stream_decode(tokens[:, p:])
    np.testing.assert_allclose(wf, want, atol=1e-5)
    for seg_iters in (3, 16):
        gf = kvf.stream_decode(tokens[:, p:], segmented=True,
                               seg_iters=seg_iters)
        np.testing.assert_allclose(gf, wf, atol=1e-5)
    # incremental wavefront streaming: growing-segment chunk generator
    # concatenates to the same stream, first chunk after s_steps iters
    for seg_iters in (4, 8):
        chunks = list(kv.stream_chunks(tokens[:, p:], wavefront=True,
                                       seg_iters=seg_iters))
        assert len(chunks) >= 2
        np.testing.assert_allclose(np.concatenate(chunks, axis=1), want,
                                   atol=1e-6)


def test_kv_batched_streams_match_independent():
    """kv_stream_decoder(batch=B): B lockstep streams with distinct token
    sequences and speakers produce the SAME waveforms as B independent
    batch-1 sessions (both wavefront and sequential flow paths)."""
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_hift_config, PipelineConfig)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder

    p, n, hop, ring_t, b = 2, 34, 3, 6, 3
    cfg, flow, params, tokens, prompt_feat, emb, valid = _setup(p=p, n=n)
    rng = np.random.RandomState(7)
    toks_b = rng.randint(0, cfg.vocab_size, (b, p + n)).astype(np.int32)
    embs_b = rng.randn(b, cfg.spk_embed_dim).astype(np.float32)
    feat_b = np.repeat(prompt_feat, b, axis=0)

    hcfg = tiny_hift_config()
    hift = HiFTGenerator(hcfg)
    hift_params = hift.init(jax.random.PRNGKey(2),
                            jnp.zeros((1, 8, hcfg.in_channels)))
    pipe = PipelineConfig(block_size=hop, mel_cache_len=2, max_token_len=9)
    dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)

    kvb = dec.kv_stream_decoder(toks_b[:, :p], feat_b, embs_b,
                                block_size=hop, ring_tokens=ring_t,
                                token_cap=64, batch=b)
    for wavefront in (True, False):
        got = kvb.stream_decode(toks_b[:, p:], wavefront=wavefront)
        assert got.shape[0] == b
        for i in range(b):
            kv1 = dec.kv_stream_decoder(
                toks_b[i: i + 1, :p], prompt_feat, embs_b[i: i + 1],
                block_size=hop, ring_tokens=ring_t, token_cap=64)
            want = kv1.stream_decode(toks_b[i: i + 1, p:],
                                     wavefront=wavefront)
            np.testing.assert_allclose(got[i: i + 1], want, atol=1e-5,
                                       err_msg=f"wavefront={wavefront} "
                                               f"stream={i}")


def _mcd_db(a: np.ndarray, b: np.ndarray, k: int = 13) -> float:
    """Mel-cepstral distortion (dB) between two (B, T, n_mel) mel tensors:
    DCT-II cepstra per frame, coefficients 1..k-1, standard 10/ln10 *
    sqrt(2*sum dc^2) frame distance, averaged."""
    from scipy.fftpack import dct
    ca = dct(a, axis=-1, norm="ortho")[..., 1:k]
    cb = dct(b, axis=-1, norm="ortho")[..., 1:k]
    d = np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=-1))
    return float(np.mean((10.0 / np.log(10)) * d))


def test_kv_vs_windowed_deviation_quantified():
    """The KV path deviates from the reference's windowed re-decode by
    design (each frame is computed once under a banded mask instead of
    being recomputed under a shifted window).  Quantified at realistic
    scale — production topology (512-dim encoder, 256-ch estimator U-Net,
    10 ODE steps, hop 5 / ring 35 as served) with CONVERTED random torch
    weights, against the windowed output that test_golden_parity proves
    exact vs the reference torch module (so kv-vs-windowed IS
    kv-vs-reference):

    measured (seeds below): MCD 3.42 dB, per-band rel err max 0.20 /
    mean 0.13, overall rel MAE 0.13.  Random weights make the ODE
    dynamics chaotic, so this is an UPPER bound on the trained-weight
    deviation; thresholds sit ~1.5x above the measurement to catch
    regressions, and the figures are recorded next to the headline RTF in
    BENCH_NOTES.md (the golden-exact windowed engine remains the serving
    option when reference-exact output matters)."""
    from test_golden_parity import _make_flow_pair
    ref, mine, params, cfg, unused = _make_flow_pair(
        channels=(256,), macaron=False, use_cnn=False)
    rng = np.random.RandomState(5)
    p, n = 4, 48
    r = cfg.token_mel_ratio
    tokens = rng.randint(0, cfg.vocab_size, (1, p + n)).astype(np.int32)
    prompt_feat = rng.randn(1, p * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    valid = np.ones((1, p + n), bool)

    win = mine.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                     jnp.asarray(prompt_feat), jnp.asarray(emb),
                     streaming=True, finalize=True)
    win = np.asarray(win)[:, p * r:]
    inc = _run_incremental(cfg, params, tokens, prompt_feat, emb, p,
                           hop=5, ring_tokens=35)
    assert np.all(np.isfinite(inc)) and inc.shape == win.shape

    mcd = _mcd_db(win, inc)
    band = np.mean(np.abs(win - inc), axis=(0, 1)) \
        / (np.mean(np.abs(win), axis=(0, 1)) + 1e-9)
    rel_mae = float(np.mean(np.abs(win - inc)) / np.mean(np.abs(win)))
    assert mcd < 5.0, mcd
    assert float(band.max()) < 0.35, band.max()
    assert rel_mae < 0.25, rel_mae
