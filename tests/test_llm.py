"""Speech LM tests: backbone prefill/decode cache consistency, one-dispatch
generation, RAS sampling, bistream interleave."""

import numpy as np
import jax
import jax.numpy as jnp

from moss_speech_decoder_cosy_tpu.models.llm import Qwen2Model
from moss_speech_decoder_cosy_tpu.models.llm.qwen2 import tiny_qwen2_config
from moss_speech_decoder_cosy_tpu.models.llm.speech_lm import (
    Qwen2SpeechLM, BistreamSession, ras_sample, tiny_speech_lm_config)


def test_backbone_prefill_equals_stepwise():
    cfg = tiny_qwen2_config()
    m = Qwen2Model(cfg)
    rng = np.random.RandomState(0)
    emb = jnp.asarray(rng.randn(1, 12, cfg.hidden_size).astype(np.float32))
    cache0 = None

    def prefill(mdl, e):
        return mdl.forward_embeds(e, mdl.init_cache(1))

    params = m.init(jax.random.PRNGKey(0), emb, method=prefill)
    h_full, _ = m.apply(params, emb, method=prefill)

    # step one token at a time
    def step(mdl, e, c):
        return mdl.forward_embeds(e, c)
    cache = m.apply(params, 1, method=lambda mdl, b: mdl.init_cache(b))
    hs = []
    for i in range(12):
        h, cache = m.apply(params, emb[:, i:i + 1], cache, method=step)
        hs.append(np.asarray(h))
    h_steps = np.concatenate(hs, axis=1)
    np.testing.assert_allclose(h_steps, np.asarray(h_full), atol=2e-4)


def test_ras_sampling_valid_and_repetition_fallback():
    cfg = tiny_speech_lm_config()
    # p(7) ~= 0.85: nucleus(top_p=0.8) keeps ONLY token 7, while the plain
    # fallback still samples the full distribution
    logp = jnp.zeros(35)
    logp = logp.at[7].set(jnp.log(0.85 / 0.15 * 34.0))
    empty = jnp.full((cfg.win_size,), -1, jnp.int32)
    for i in range(10):
        assert int(ras_sample(jax.random.PRNGKey(i), logp, empty, cfg)) == 7
    hist = jnp.full((cfg.win_size,), 7, jnp.int32)
    counts = {}
    for i in range(60):
        t = int(ras_sample(jax.random.PRNGKey(i), logp, hist, cfg))
        counts[t] = counts.get(t, 0) + 1
    # with history full of 7, fallback sampling kicks in -> not always 7
    assert len(counts) > 1, counts


def test_generate_single_dispatch():
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.asarray(np.random.RandomState(0).randint(0, 100, (1, 6)))
    prompt_speech = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, prompt_speech,
                    jax.random.PRNGKey(1), max_len=8)
    gen = jax.jit(lambda p, t, ps, k: m.apply(p, t, ps, k, max_len=16))
    toks, n = gen(params, text, prompt_speech, jax.random.PRNGKey(2))
    toks, n = np.asarray(toks), int(n)
    assert toks.shape == (16,)
    assert 0 <= n <= 16
    assert (toks[:n] < cfg.speech_token_size).all()
    assert (toks[n:] == cfg.speech_token_size).all()


def test_generate_respects_min_len():
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.asarray(np.random.RandomState(1).randint(0, 100, (1, 4)))
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, ps, jax.random.PRNGKey(1),
                    max_len=8)
    embeds = m.apply(params, text, ps, method=m.prompt_embeds)
    toks, n = m.apply(params, embeds, jax.random.PRNGKey(3),
                      jnp.asarray(6, jnp.int32), 12, method=m.generate)
    assert int(n) >= 6


def test_bistream_session():
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.asarray(np.zeros((1, 4), np.int32))
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, ps, jax.random.PRNGKey(1),
                    max_len=4)
    sess = BistreamSession(m, params, jax.random.PRNGKey(5))
    chunks = sess.push_text(list(range(12)))        # 2 chunks of 5 text
    # mid-stream chunks end at the fill token or the mix-ratio budget
    # (llm.py:570-591), so each is <= mix_ratio[1] long and may be empty
    assert len(chunks) <= 2
    for c in chunks:
        assert 0 < c.shape[0] <= cfg.mix_ratio[1]
        assert (c < cfg.speech_token_size).all()


def test_transformer_lm_v1():
    """Legacy v1 TransformerLM: teacher-forced logits + scan generation."""
    from moss_speech_decoder_cosy_tpu.models.llm.transformer_lm import (
        TransformerLM, tiny_transformer_lm_config)
    cfg = tiny_transformer_lm_config()
    m = TransformerLM(cfg)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, cfg.text_token_size, (1, 5)))
    text_valid = jnp.ones((1, 5), bool)
    speech = jnp.asarray(rng.randint(0, cfg.speech_token_size, (1, 7)))
    speech_valid = jnp.ones((1, 7), bool)
    params = m.init(jax.random.PRNGKey(0), text, text_valid, speech,
                    speech_valid)
    logits, valid = m.apply(params, text, text_valid, speech, speech_valid)
    assert logits.shape == (1, 1 + 5 + 1 + 7, cfg.speech_token_size + 1)
    toks, n = m.apply(params, text, text_valid, jax.random.PRNGKey(1), 8,
                      method=m.generate)
    toks, n = np.asarray(toks), int(n)
    assert toks.shape == (8,)
    assert (toks[:n] < cfg.speech_token_size).all()
    assert (toks[n:] == cfg.speech_token_size).all()


def test_speech_synthesizer_end_to_end():
    """text ids -> LM tokens -> flow+hift waveform (inference_zero_shot
    role)."""
    import dataclasses
    from moss_speech_decoder_cosy_tpu.synthesizer import SpeechSynthesizer
    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.utils.config import (
        tiny_flow_config, tiny_hift_config, PipelineConfig)

    lm_cfg = tiny_speech_lm_config()
    # speech tokens must fit the tiny flow vocab (64 > 32+3)
    lm = Qwen2SpeechLM(lm_cfg)
    text = jnp.zeros((1, 4), jnp.int32)
    ps = jnp.zeros((1, 0), jnp.int32)
    lm_params = lm.init(jax.random.PRNGKey(0), text, ps,
                        jax.random.PRNGKey(1), max_len=4)

    flow_cfg, hift_cfg = tiny_flow_config(), tiny_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    fp = flow.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32),
                   jnp.ones((1, 8), bool),
                   jnp.zeros((1, 0, flow_cfg.output_size)),
                   jnp.zeros((1, flow_cfg.spk_embed_dim)))
    hift = HiFTGenerator(hift_cfg)
    hp = hift.init(jax.random.PRNGKey(3),
                   jnp.zeros((1, 8, hift_cfg.in_channels)))
    dec = AudioDecoder(flow_cfg, hift_cfg, fp, hp,
                       PipelineConfig(block_size=4, mel_cache_len=4,
                                      max_token_len=16))
    syn = SpeechSynthesizer(lm, lm_params, dec, max_tokens=12)
    text_ids = np.random.RandomState(0).randint(0, 100, (1, 5))
    wav = syn.tts(text_ids, seed=1)
    frame = hift_cfg.total_upsample
    assert wav.shape[1] % (dec.ratio * frame) == 0
    if wav.shape[1] > 0:
        assert np.isfinite(wav).all()
    # chunked producer/consumer path
    chunks = list(syn.tts_stream(text_ids, seed=1))
    wav2 = np.concatenate(chunks, axis=-1) if chunks else wav
    assert wav2.shape[1] == wav.shape[1]


def test_bistream_flush():
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    text = jnp.asarray(np.zeros((1, 4), np.int32))
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), text, ps, jax.random.PRNGKey(1),
                    max_len=4)
    sess = BistreamSession(m, params, jax.random.PRNGKey(6))
    chunks = sess.push_text([1, 2, 3])          # below mix ratio -> nothing
    assert chunks == []
    final = sess.flush(n_final=6)
    # flush decodes until eos (ignore_eos=False, llm.py:593-611) bounded
    # by n_final; an immediate eos yields no chunk
    assert len(final) <= 1
    if final:
        assert 0 < final[0].shape[0] <= 6
        assert (final[0] < cfg.speech_token_size).all()
    # flush with no text at all is a no-op
    sess2 = BistreamSession(m, params, jax.random.PRNGKey(7))
    assert sess2.flush() == []


def test_continuous_batcher_matches_generate():
    """ContinuousBatcher (serving/lm_server.py): requests admitted at
    different times into a shared slot pool produce token streams
    IDENTICAL to per-request Qwen2SpeechLM.generate with the same seed —
    co-batched neighbors, admission order, and slot reuse cannot change
    any request's output."""
    from moss_speech_decoder_cosy_tpu.serving.lm_server import (
        ContinuousBatcher)
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    rng = np.random.RandomState(3)
    texts = [rng.randint(0, 100, (1, n)) for n in (4, 6, 3)]
    seeds = [11, 22, 33]
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(texts[0]), ps,
                    jax.random.PRNGKey(1), max_len=8)

    want = []
    for text, seed in zip(texts, seeds):
        toks, n = m.apply(params, jnp.asarray(text), ps,
                          jax.random.PRNGKey(seed), max_len=48)
        want.append([int(t) for t in np.asarray(toks)[: int(n)]])

    # slots=2 forces request 2 to wait for a free slot (reuse path);
    # request 1 is admitted after request 0 already decoded a chunk
    bat = ContinuousBatcher(m, params, slots=2, step_chunk=4,
                            text_buckets=(8,), speech_buckets=(0,))
    s0 = bat.submit(texts[0], seed=seeds[0], max_len=48)
    bat.step()                                 # r0 decodes alone first
    s1 = bat.submit(texts[1], seed=seeds[1], max_len=48)
    s2 = None
    for _ in range(200):
        bat.step()
        if s2 is None and (bat.finished(s0) or bat.finished(s1)):
            s2 = bat.submit(texts[2], seed=seeds[2], max_len=48)
        if s2 is not None and all(bat.finished(s)
                                  for s in (s0, s1, s2)):
            break
    assert s2 is not None, "no slot freed for request 2"
    got = [bat.result(s0), bat.result(s1), bat.result(s2)]
    assert got[0] == want[0]
    assert got[1] == want[1]
    assert got[2] == want[2]


def test_continuous_batcher_two_tier_cache_matches():
    """Two-tier KV mode (recent ring + bulk flush): same token streams as
    the plain per-token-RMW mode and as per-request generate — flush
    boundaries land mid-stream for every request."""
    from moss_speech_decoder_cosy_tpu.serving.lm_server import (
        ContinuousBatcher)
    cfg = tiny_speech_lm_config()
    m = Qwen2SpeechLM(cfg)
    rng = np.random.RandomState(3)
    texts = [rng.randint(0, 100, (1, n)) for n in (4, 6)]
    seeds = [11, 22]
    ps = jnp.zeros((1, 0), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(texts[0]), ps,
                    jax.random.PRNGKey(1), max_len=8)
    want = []
    for text, seed in zip(texts, seeds):
        toks, n = m.apply(params, jnp.asarray(text), ps,
                          jax.random.PRNGKey(seed), max_len=48)
        want.append([int(t) for t in np.asarray(toks)[: int(n)]])

    bat = ContinuousBatcher(m, params, slots=2, step_chunk=4,
                            text_buckets=(8,), speech_buckets=(0,),
                            recent=6)          # flush every other chunk
    r0 = bat.submit(texts[0], seed=seeds[0], max_len=48)
    bat.step()
    r1 = bat.submit(texts[1], seed=seeds[1], max_len=48)
    for _ in range(200):
        bat.step()
        if bat.finished(r0) and bat.finished(r1):
            break
    assert bat.result(r0) == want[0]
    assert bat.result(r1) == want[1]
