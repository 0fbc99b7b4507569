"""Phase breakdown of KVStreamDecoder.stream_decode on the real TPU.

Replicates the wavefront stream_decode body with block_until_ready fences
between phases, to attribute the non-scan tail (BENCH_NOTES: the fused
wavefront lax.scan is ~0.28 s of the stream wall; everything else —
init, uploads, finalize hop, bulk vocode, fetch — is the tail).  Phases:
host-prep, token upload, init_state (one jitted dispatch), spk (cached
after first stream), wave-init (device-side x/mu build), wave-scan,
finalize hop, bulk vocode, pcm16, fetch.

Usage: python -m moss_speech_decoder_cosy_tpu.bin.profile_tail
"""
import dataclasses
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = "/root/repo/.jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from moss_speech_decoder_cosy_tpu.models.flow import (
        CausalMaskedDiffWithXvec)
    from moss_speech_decoder_cosy_tpu.models.hift import HiFTGenerator
    from moss_speech_decoder_cosy_tpu.pipeline import AudioDecoder
    from moss_speech_decoder_cosy_tpu.pipeline.device_session import (
        _parallel_fetch, _pcm16_device)
    from moss_speech_decoder_cosy_tpu.utils.config import (
        moss_flow_config, moss_hift_config, PipelineConfig, CFMConfig)

    seconds = 20.0
    n_tokens = int(seconds * 12.5)
    flow_cfg = dataclasses.replace(
        moss_flow_config(), cfm=CFMConfig(n_timesteps=10, max_noise_len=4096))
    hift_cfg = moss_hift_config()
    flow = CausalMaskedDiffWithXvec(flow_cfg)
    hift = HiFTGenerator(hift_cfg)
    tok0 = jnp.zeros((1, 8), jnp.int32)
    print("# init params...", file=sys.stderr, flush=True)
    flow_params = jax.jit(flow.init)(
        jax.random.PRNGKey(0), tok0, jnp.ones((1, 8), bool),
        jnp.zeros((1, 0, 80)), jnp.zeros((1, 192)))
    hift_params = jax.jit(hift.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 80)))
    dec = AudioDecoder(flow_cfg, hift_cfg, flow_params, hift_params,
                       PipelineConfig(block_size=5, mel_cache_len=8,
                                      max_token_len=40),
                       compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    tokens = rng.randint(0, flow_cfg.vocab_size, (1, n_tokens))
    kv = dec.kv_stream_decoder(token_cap=n_tokens + 16)

    print("# warmup...", file=sys.stderr, flush=True)
    kv.stream_decode(tokens, output="int16")
    kv.stream_decode(tokens, output="int16")

    from moss_speech_decoder_cosy_tpu.pipeline.bulk_voc import BulkVocoder

    def phased():
        t = {}
        t0 = time.perf_counter()

        def lap(name):
            nonlocal t0
            t1 = time.perf_counter()
            t[name] = t.get(name, 0.0) + (t1 - t0)
            t0 = t1

        toks = np.asarray(tokens)
        n = int(toks.shape[1])
        cap = n + kv.hop + kv.la + 1
        buf = np.zeros((kv.b, cap), np.int32)
        buf[:, :n] = toks
        lap("host_prep")
        token_buf = jnp.asarray(buf)
        jax.block_until_ready(token_buf)
        lap("upload")
        cache, voc = kv.init_state()
        jax.block_until_ready(cache["est"]["kv"][0])
        lap("init_state")
        plan = kv.schedule(n)
        # --- _flow_mels_wave body, phased (keep in sync with
        # pipeline/kv_session.py::_flow_mels_wave) ---
        cfg = dec.flow_cfg
        s_steps = cfg.cfm.n_timesteps
        cf = kv.hop * kv.ratio
        steady = [pl for pl in plan if not pl[1]]
        k = len(steady)
        base_frames = kv.p * kv.ratio
        if kv._spks_cached is None:
            kv._spks_cached = kv._spk(kv._fp, kv._emb)
        spks = kv._spks_cached
        jax.block_until_ready(spks)
        lap("spk")
        x_wave, mu_wave = kv._wave_init()
        jax.block_until_ready((x_wave, mu_wave))
        lap("wave_init")
        need = k + s_steps - 1
        n_iters = max(16, ((need + 15) // 16) * 16)
        mels_all, est, enc_cache, n_tok = kv._wave_scan(
            kv._fp, token_buf, x_wave, mu_wave, spks,
            cache["est"], cache["enc"], n_iters=n_iters,
            k_total=jnp.asarray(k, jnp.int32),
            base_frames=jnp.asarray(base_frames, jnp.int32),
            dus=kv._dus_ok)
        jax.block_until_ready(mels_all)
        lap("wave_scan")
        mels = [mels_all[s_steps - 1: s_steps - 1 + k]
                .transpose(1, 0, 2, 3).reshape(kv.b, -1, kv.n_mel)]
        cache = {"enc": enc_cache, "est": est, "n_tok": n_tok}
        if plan and plan[-1][1]:
            tail, _ = plan[-1]
            mel, cache = kv._hop(kv._fp, token_buf, cache,
                                 emit_tokens=tail, finalize=True)
            mels.append(mel)
        mel_full = jnp.concatenate(mels, axis=1)
        jax.block_until_ready(mel_full)
        lap("finalize_hop")
        if kv._bulk is None:
            kv._bulk = BulkVocoder(dec, kv.hop * kv.ratio)
        frames = tuple(e * kv.ratio for e, _ in plan)
        wav = kv._bulk.vocode(dec.hift_params, mel_full, frames)
        jax.block_until_ready(wav)
        lap("vocode")
        pcm = _pcm16_device(wav)
        jax.block_until_ready(pcm)
        lap("pcm16")
        out = _parallel_fetch(pcm)
        lap("fetch")
        t["total"] = sum(t.values())
        return t, out

    # one phased warmup (fence-program variants may recompile nothing but
    # block ordering differs)
    phased()
    accum = {}
    R = 5
    for _ in range(R):
        t, out = phased()
        for kk, v in t.items():
            accum[kk] = accum.get(kk, 0.0) + v
    print(json.dumps({kk: round(v / R * 1e3, 1) for kk, v in accum.items()})
          + "  # ms, mean of 5, fenced")

    # unfenced reference wall (async overlap intact)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        kv.stream_decode(tokens, output="int16")
        times.append(time.perf_counter() - t0)
    print(json.dumps({"unfenced_wall_ms":
                      round(float(np.median(times)) * 1e3, 1)}))


if __name__ == "__main__":
    main()
