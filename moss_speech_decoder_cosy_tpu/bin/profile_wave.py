"""Wavefront scan-portion profiler (real TPU).

Times ONLY the fused wavefront lax.scan (kv_session._wave_scan_impl) —
encoder hop + pipelined-ODE estimator + ring writes — at full MOSS size,
isolating the per-iteration cost from the bulk-vocoder/fetch tail that is
common to every configuration.  Sweeps write scheme x hop size x ring so
the serving default can be picked from one table (BENCH_NOTES round 3:
the per-layer ring split + shared-offset DUS writes changed which scheme
should win; the block-10 quality ablation in bin/ablate_block.py showed
block 10 is MCD-neutral, so if its scan cost wins it becomes the
throughput default).

Usage:  python -m moss_speech_decoder_cosy_tpu.bin.profile_wave \
            [--seconds 20] [--configs dus:5:35,onehot:5:35,...]

Prints one JSON line per configuration:
  {"write": "dus", "block": 5, "ring": 35, "iters": N,
   "scan_s": median_wall, "ms_per_iter": ..., "scan_rtf": ...}
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


DEFAULT_CONFIGS = ("dus:5:35", "onehot:5:35", "dus:10:30",
                   "dus:5:70", "dus:10:70")


def main():
    import jax
    import jax.numpy as jnp
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..models.flow import CausalMaskedDiffWithXvec
    from ..models.hift import HiFTGenerator
    from ..pipeline import AudioDecoder
    from ..utils.config import (moss_flow_config, moss_hift_config,
                                PipelineConfig, CFMConfig)

    seconds = (float(sys.argv[sys.argv.index("--seconds") + 1])
               if "--seconds" in sys.argv else 20.0)
    configs = (sys.argv[sys.argv.index("--configs") + 1].split(",")
               if "--configs" in sys.argv else list(DEFAULT_CONFIGS))
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

    for spec in configs:
        parts = spec.split(":")
        write, block, ring = parts[0], int(parts[1]), int(parts[2])
        unroll = int(parts[3]) if len(parts) > 3 else 1
        # "fused" = write-then-attend estimator rings (extended capacity,
        # no [ring ++ chunk] concat); uses DUS writes when geometry allows
        # "stacked" = fused + the homogeneous estimator layer groups
        # collapsed into lax.scans over stacked parameter leaves
        # "kernel" = fused + each transformer group as ONE Pallas kernel
        # launch (ops/pallas_block.py); "kernel2" = kernel + the fused-
        # conformer encoder hop (ops/pallas_conformer.py)
        kv = dec.kv_stream_decoder(token_cap=n_tokens + 16,
                                   block_size=block, ring_tokens=ring,
                                   write_mode=("onehot" if write == "onehot"
                                               else "auto"),
                                   fused=(write in ("fused", "stacked",
                                                    "kernel", "kernel2")),
                                   stacked=(write == "stacked"),
                                   kernel=(write in ("kernel", "kernel2")),
                                   enc_kernel=(write == "kernel2"))
        if write == "dus":
            assert kv._dus_ok, f"geometry {spec} cannot use DUS"

        # mirror _flow_mels_wave's setup, then time ONLY the scan call
        n = int(tokens.shape[1])
        buf = np.zeros((1, n + block + kv.la + 1), np.int32)
        buf[:, :n] = tokens
        token_buf = jnp.asarray(buf)
        cache, _ = kv.init_state()
        plan = kv.schedule(n)
        k = sum(1 for pl in plan if not pl[1])
        s_steps = flow_cfg.cfm.n_timesteps
        cf = block * kv.ratio
        need = k + s_steps - 1
        n_iters = max(16, ((need + 15) // 16) * 16)

        from ..models.flow.cfm import _fixed_noise
        spks = kv._spk(kv._fp, kv._emb)
        noise = _fixed_noise(flow_cfg.cfm.max_noise_len, kv.n_mel)
        x_wave = np.zeros((s_steps, 1, cf, kv.n_mel), np.float32)
        x_wave[0] = noise[:, :cf]
        x_wave = jnp.asarray(x_wave)
        mu_wave = jnp.zeros((s_steps, 1, cf, kv.n_mel), kv.est_dt)

        def run():
            mels, est, enc, n_tok = kv._wave_scan(
                kv._fp, token_buf, x_wave, mu_wave, spks,
                cache["est"], cache["enc"], n_iters=n_iters,
                k_total=jnp.asarray(k, jnp.int32),
                base_frames=jnp.asarray(0, jnp.int32),
                dus=kv._dus_ok, unroll=unroll, fused=kv._fused,
                stacked=kv._stacked, sp=kv._sp,
                kernel=kv._kernel, gp=kv._gp)
            jax.block_until_ready(mels)
            return mels

        print(f"# compile {spec}...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run()
        print(f"# compiled in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        print(json.dumps({
            "write": write, "block": block, "ring": ring, "unroll": unroll,
            "iters": n_iters, "scan_s": round(med, 4),
            "ms_per_iter": round(med / n_iters * 1e3, 3),
            "scan_rtf": round(med / seconds, 5),
            "runs": [round(t, 3) for t in times]}), flush=True)


if __name__ == "__main__":
    main()
