"""Optimized-HLO copy audit for the fused wavefront scan.

Compiles the full-size `_wave_scan` program (the headline serving loop,
kv_session.py:_wave_scan_impl) for the TPU backend and attributes every
`copy` / `copy-start` instruction inside the while body by shape and
total bytes — the measured ~2.7 ms/iter gap between the delivered scan
cost (4.4 ms/iter) and the estimator+encoder floor (~1.7 ms/iter) is
believed to be XLA double-buffering the scan-carried KV rings
(BENCH_NOTES round 3); this tool turns that belief into a per-shape
byte count so structural fixes (pallas aliased ring update, carry
re-layout) can be aimed at the actual offenders.

Usage:  python -m moss_speech_decoder_cosy_tpu.bin.analyze_wave_hlo \
            [--block 5] [--ring 35] [--seconds 20] [--dump FILE]

Prints one JSON line:
  {"copies": N, "bytes_per_iter": B, "by_shape": {...}, ...}
"""

from __future__ import annotations

import collections
import json
import re
import sys


def parse_copies(hlo_text: str):
    """Count copy instructions and bytes by shape from optimized HLO."""
    dt_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8}
    per_shape = collections.Counter()
    n = 0
    for m in re.finditer(
            r"=\s*(\w+)\[([\d,]*)\][^ ]*\s+copy(?:-start|-done)?\(",
            hlo_text):
        dt, dims = m.group(1), m.group(2)
        if dt not in dt_bytes:
            continue
        size = dt_bytes[dt]
        for d in dims.split(","):
            if d:
                size *= int(d)
        per_shape[f"{dt}[{dims}]"] += size
        n += 1
    return n, per_shape


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dataclasses
    import os
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from ..models.flow import CausalMaskedDiffWithXvec
    from ..models.hift import HiFTGenerator
    from ..pipeline import AudioDecoder
    from ..utils.config import (moss_flow_config, moss_hift_config,
                                PipelineConfig, CFMConfig)

    argv = sys.argv
    block = int(argv[argv.index("--block") + 1]) if "--block" in argv else 5
    ring = int(argv[argv.index("--ring") + 1]) if "--ring" in argv else 35
    seconds = (float(argv[argv.index("--seconds") + 1])
               if "--seconds" in argv else 20.0)
    dump = argv[argv.index("--dump") + 1] if "--dump" in argv else None
    fused = "--fused" in argv
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
    kv = dec.kv_stream_decoder(token_cap=n_tokens + 16, block_size=block,
                               ring_tokens=ring, fused=fused)

    n = n_tokens
    buf = np.zeros((1, n + block + kv.la + 1), np.int32)
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
    x_wave = jnp.asarray(
        np.zeros((s_steps, 1, cf, kv.n_mel), np.float32))
    mu_wave = jnp.zeros((s_steps, 1, cf, kv.n_mel), kv.est_dt)

    print("# lowering + compiling (TPU backend)...", file=sys.stderr,
          flush=True)
    lowered = jax.jit(
        kv._wave_scan_impl,
        static_argnames=("n_iters", "dus", "fused")).lower(
            kv._fp, token_buf, x_wave, mu_wave, spks,
            cache["est"], cache["enc"], n_iters=n_iters,
            k_total=jnp.asarray(k, jnp.int32),
            base_frames=jnp.asarray(0, jnp.int32), dus=kv._dus_ok,
            fused=kv._fused)
    compiled = lowered.compile()
    text = compiled.as_text()
    if dump:
        with open(dump, "w") as f:
            f.write(text)
        print(f"# optimized HLO -> {dump} ({len(text)} bytes)",
              file=sys.stderr)

    # isolate the while body: copies there run EVERY iteration
    n_all, shapes_all = parse_copies(text)
    body = ""
    for m in re.finditer(r"%?(\S*while\S*body\S*)\s*\([^)]*\)[^{]*{", text):
        start = m.end()
        depth = 1
        i = start
        while depth and i < len(text):
            depth += text[i] == "{"
            depth -= text[i] == "}"
            i += 1
        body += text[start:i]
    n_body, shapes_body = parse_copies(body)

    out = {
        "block": block, "ring": ring, "iters": n_iters,
        "copies_total": n_all,
        "copies_in_while_body": n_body,
        "body_copy_bytes_per_iter": int(sum(shapes_body.values())),
        "body_by_shape": {s: int(b) for s, b in
                          shapes_body.most_common(12)},
        "all_copy_bytes": int(sum(shapes_all.values())),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
