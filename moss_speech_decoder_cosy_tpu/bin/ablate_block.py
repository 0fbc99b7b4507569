"""KV block-size quality ablation: how does the banded-mask deviation
grow with the serving hop?

The KV wavefront computes each frame ONCE under a banded chunk-causal
mask; the deviation vs the reference's windowed re-decode
(flow_inference.py:194-204) grows with the chunk granularity (a bigger
hop = coarser causality boundary AND, under the serving default
``ring_tokens = max_token_len - block_size``, a smaller left context).
bench.py --block N measures the throughput side; this harness measures
the quality side with the SAME session defaults, so the two tables in
BENCH_NOTES.md line up.

Protocol: 120-token stream after a 4-token prompt; reference = the
windowed-semantics full forward (streaming=True, finalize=True —
golden-exact vs the reference torch module per tests/test_golden_parity.py),
KV = KVStreamDecoder mel at each block size.  Metrics: MCD (dB, DCT
cepstra 1..12), per-mel-band relative error (max/mean), overall relative
MAE — matching tests/test_kv_stream.py::test_kv_vs_windowed_deviation_
quantified, including its weights: CONVERTED torch-init weights at the
test's production topology when the reference checkout + torch are
importable (raw ``flow.init`` random weights make the ODE dynamics so
chaotic that windowed-vs-KV saturates at MCD ~6.9 regardless of hop —
measured, see BENCH_NOTES — which says nothing about the hop trend).

Run:  python -m moss_speech_decoder_cosy_tpu.bin.ablate_block [--cpu]
      [--random-init] [block sizes...]
      [--rings r1 r2 ...]            # ring sweep at block 5
      [--lengths 120,250,500,1000]   # deviation-vs-stream-length curve

``--lengths``: fixed block 5, rings {35, 70, 105}; for every length the
offline full forward is the golden, and alongside the KV engines the
REFERENCE-SEMANTICS windowed engine (window 40, the reference's own
serving path, flow_inference.py:194-204) is scored against the same
golden — the honest frame: the reference's streaming output ALSO
deviates from its offline forward, so the KV curve must be read against
the windowed curve, not against zero.
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np


def _mcd_db(a: np.ndarray, b: np.ndarray, k: int = 13) -> float:
    from scipy.fftpack import dct
    ca = dct(a, axis=-1, norm="ortho")[..., 1:k]
    cb = dct(b, axis=-1, norm="ortho")[..., 1:k]
    d = np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=-1))
    return float(np.mean((10.0 / np.log(10)) * d))


def _train_flow(flow, params, cfg, steps: int, seed: int = 0):
    """Fit the flow for a few hundred steps on a synthetic token->mel
    task (each token maps to a fixed mel prototype + small jitter) so
    the ODE dynamics are SMOOTH instead of chaotic — the round-4 drift
    table was measured on torch-init random weights whose chaotic
    dynamics inflate every absolute MCD (BENCH_NOTES); this
    conditions the protocol without needing real checkpoints.  Uses the
    repo's own training stack (training/train_step.py)."""
    import time
    import jax
    import jax.numpy as jnp
    from ..training.train_step import (make_optimizer, TrainState,
                                       make_flow_train_step)

    r = cfg.token_mel_ratio
    rng = np.random.RandomState(seed)
    proto = rng.randn(cfg.vocab_size, cfg.output_size).astype(
        np.float32) * 0.5
    bsz, tt = 8, 24

    def batch(i):
        rs = np.random.RandomState(seed + 1 + i)
        tok = rs.randint(0, cfg.vocab_size, (bsz, tt)).astype(np.int32)
        feat = np.repeat(proto[tok], r, axis=1)
        ramp = 0.1 * np.sin(np.linspace(0, 6.28, tt * r,
                                        dtype=np.float32))[None, :, None]
        feat = feat + ramp + 0.02 * rs.randn(*feat.shape).astype(
            np.float32)
        emb = rs.randn(bsz, cfg.spk_embed_dim).astype(np.float32)
        return {"speech_token": jnp.asarray(tok),
                "token_valid": jnp.ones((bsz, tt), bool),
                "speech_feat": jnp.asarray(feat),
                "feat_valid": jnp.ones((bsz, tt * r), bool),
                "embedding": jnp.asarray(emb)}

    opt = make_optimizer()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt.init(params))
    step_fn = make_flow_train_step(flow, opt)
    key = jax.random.PRNGKey(seed)
    t0 = time.time()
    for i in range(steps):
        state, metrics = step_fn(state, batch(i),
                                 jax.random.fold_in(key, i))
        if i % 50 == 0 or i == steps - 1:
            print(f"# train step {i}: loss={float(metrics['loss']):.4f} "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
    return state.params


def _length_sweep(cfg, flow, params, hcfg, hift, p, lengths, weights):
    """Deviation-vs-stream-length curve: per length, MCD of (a) the KV
    wavefront at rings {35, 70, 105} and (b) the reference-semantics
    windowed engine (window 40) against the offline full forward."""
    import time
    import jax
    import jax.numpy as jnp
    from ..pipeline import AudioDecoder
    from ..utils.config import PipelineConfig

    r = cfg.token_mel_ratio
    rng = np.random.RandomState(5)
    n_max = max(lengths)
    tokens_all = rng.randint(0, cfg.vocab_size,
                             (1, p + n_max)).astype(np.int32)
    prompt_feat = rng.randn(1, p * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)

    if params is None:
        params = jax.jit(flow.init)(
            jax.random.PRNGKey(0), jnp.asarray(tokens_all[:, :p + 8]),
            jnp.ones((1, p + 8), bool), jnp.asarray(prompt_feat),
            jnp.asarray(emb))
    hift_params = jax.jit(hift.init)(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 8, 80)))

    hop, window = 5, 40
    out = {"protocol": f"p={p} block={hop} window={window}, "
                       f"weights={weights}", "lengths": {}}
    for n in lengths:
        t0 = time.time()
        tokens = tokens_all[:, : p + n]
        valid = np.ones((1, p + n), bool)
        print(f"# n={n}: offline golden...", file=sys.stderr, flush=True)
        win = flow.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                         jnp.asarray(prompt_feat), jnp.asarray(emb),
                         streaming=True, finalize=True)
        win = np.asarray(win, np.float32)[:, p * r:]
        scale = float(np.mean(np.abs(win)))
        row = {"mean_abs_golden": round(scale, 5)}

        pipe = PipelineConfig(block_size=hop, mel_cache_len=8,
                              max_token_len=window)
        dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)

        # reference-semantics windowed engine, flow-side mel
        print(f"# n={n}: windowed engine...", file=sys.stderr, flush=True)
        ds = dec.device_stream_decoder(tokens[:, :p], prompt_feat, emb)
        cap = max(n + ds.window, ds.window)
        buf = np.zeros((1, cap), np.int32)
        buf[:, :n] = tokens[:, p:]
        token_buf = jnp.asarray(buf)
        off = jnp.zeros((), jnp.int32)
        mels = []
        for emit, _, fin in ds.schedule(n):
            if emit <= 0:
                continue
            mels.append(ds._flow_step(dec.flow_params, token_buf, off,
                                      emit_tokens=emit, finalize=fin))
            off = off + emit
        wmel = np.asarray(jnp.concatenate(mels, axis=1), np.float32)
        assert wmel.shape == win.shape, (wmel.shape, win.shape)
        row["windowed40"] = {
            "mcd_db": round(_mcd_db(win, wmel), 3),
            "rel_mae": round(float(np.mean(np.abs(win - wmel)) / scale), 4)}
        print(json.dumps({f"n={n} windowed40": row["windowed40"]}),
              file=sys.stderr, flush=True)

        for ring in (35, 70, 105):
            print(f"# n={n}: kv ring={ring}...", file=sys.stderr,
                  flush=True)
            kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                       block_size=hop, ring_tokens=ring,
                                       token_cap=p + n + 16)
            kcap = n + hop + kv.la + 1
            kbuf = np.zeros((1, kcap), np.int32)
            kbuf[:, :n] = tokens[:, p:]
            kbuf_j = jnp.asarray(kbuf)
            cache, _ = kv.init_state()
            cache = kv._prefill(kv._fp, kbuf_j, cache)
            mel, _ = kv._flow_mels(kbuf_j, cache, kv.schedule(n))
            inc = np.asarray(mel, np.float32)
            assert inc.shape == win.shape, (inc.shape, win.shape)
            row[f"ring{ring}"] = {
                "mcd_db": round(_mcd_db(win, inc), 3),
                "mcd_vs_windowed_db": round(_mcd_db(wmel, inc), 3),
                "rel_mae": round(
                    float(np.mean(np.abs(win - inc)) / scale), 4)}
            print(json.dumps({f"n={n} ring{ring}": row[f"ring{ring}"]}),
                  file=sys.stderr, flush=True)
        row["wall_s"] = round(time.time() - t0, 1)
        out["lengths"][n] = row
    print(json.dumps(out, indent=2))


def main():
    import jax
    if "--cpu" in sys.argv:
        # sitecustomize pre-sets JAX_PLATFORMS=axon; override after import
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ..models.flow import CausalMaskedDiffWithXvec
    from ..models.hift import HiFTGenerator
    from ..pipeline import AudioDecoder
    from ..utils.config import (moss_flow_config, moss_hift_config,
                                PipelineConfig, CFMConfig)

    blocks = [int(b) for b in sys.argv[1:] if b.isdigit()] or [5, 10, 15, 20]
    p, n = 4, 120
    hcfg = moss_hift_config()
    hift = HiFTGenerator(hcfg)

    cfg = params = None
    weights = "random flow.init"
    if "--random-init" not in sys.argv:
        try:
            # the golden suite's matched torch/flax pair (production
            # topology, converted torch-init weights) — same protocol as
            # test_kv_vs_windowed_deviation_quantified
            here = __file__
            import os
            sys.path.insert(0, os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(here)))), "tests"))
            from test_golden_parity import _make_flow_pair
            _, flow, params, cfg, _ = _make_flow_pair(
                channels=(256,), macaron=False, use_cnn=False)
            weights = "converted torch-init (test topology)"
            print(f"# {weights}", file=sys.stderr, flush=True)
        except Exception as e:  # torch / reference not importable
            print(f"# torch pair unavailable ({e!r}); falling back to "
                  "random init", file=sys.stderr, flush=True)
    if cfg is None:
        cfg = dataclasses.replace(
            moss_flow_config(), cfm=CFMConfig(n_timesteps=10,
                                              max_noise_len=4096))
        flow = CausalMaskedDiffWithXvec(cfg)
    r = cfg.token_mel_ratio

    # --trained N: fit the sweep weights for N steps on the synthetic
    # token->mel task first (de-chaosed drift protocol, round-5 task)
    if "--trained" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--trained") + 1])
        if params is None:
            import jax as _jax
            import jax.numpy as _jnp
            params = _jax.jit(flow.init)(
                _jax.random.PRNGKey(0), _jnp.zeros((1, 8), _jnp.int32),
                _jnp.ones((1, 8), bool),
                _jnp.zeros((1, 0, cfg.output_size)),
                _jnp.zeros((1, cfg.spk_embed_dim)))
        params = _train_flow(flow, params, cfg, n_steps)
        weights += f" + {n_steps} synthetic-fit steps"
        print(f"# {weights}", file=sys.stderr, flush=True)

    if "--lengths" in sys.argv:
        lengths = [int(x) for x in
                   sys.argv[sys.argv.index("--lengths") + 1].split(",")]
        return _length_sweep(cfg, flow, params, hcfg, hift, p, lengths,
                             weights)

    rng = np.random.RandomState(5)
    tokens = rng.randint(0, cfg.vocab_size, (1, p + n)).astype(np.int32)
    prompt_feat = rng.randn(1, p * r, cfg.output_size).astype(np.float32)
    emb = rng.randn(1, cfg.spk_embed_dim).astype(np.float32)
    valid = np.ones((1, p + n), bool)

    print("# init params...", file=sys.stderr, flush=True)
    if params is None:
        params = jax.jit(flow.init)(
            jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(valid),
            jnp.asarray(prompt_feat), jnp.asarray(emb))
    hift_params = jax.jit(hift.init)(jax.random.PRNGKey(1),
                                     jnp.zeros((1, 8, 80)))

    print("# windowed-semantics golden (full forward)...", file=sys.stderr,
          flush=True)
    win = flow.apply(params, jnp.asarray(tokens), jnp.asarray(valid),
                     jnp.asarray(prompt_feat), jnp.asarray(emb),
                     streaming=True, finalize=True)
    win = np.asarray(win, np.float32)[:, p * r:]
    scale = float(np.mean(np.abs(win)))

    # --rings: sweep the ring (left-context) size at fixed block 5 instead
    # of sweeping the hop at the serving-default ring — isolates how much
    # of the deviation is bounded context vs chunk granularity
    ring_sweep = None
    if "--rings" in sys.argv:
        ring_sweep = blocks or [35, 70, 105]
        blocks = [5] * len(ring_sweep)

    out = {"protocol": f"p={p} n={n}, weights={weights}",
           "mean_abs_golden": round(scale, 5), "blocks": {}}
    for bi, hop in enumerate(blocks):
        ring = (ring_sweep[bi] if ring_sweep
                else PipelineConfig().max_token_len - hop)  # serving default
        pipe = PipelineConfig(block_size=hop, mel_cache_len=8,
                              max_token_len=40)
        dec = AudioDecoder(cfg, hcfg, params, hift_params, pipe)
        kv = dec.kv_stream_decoder(tokens[:, :p], prompt_feat, emb,
                                   block_size=hop, ring_tokens=ring,
                                   token_cap=p + n + 16)
        print(f"# kv block={hop} ring={ring}...", file=sys.stderr,
              flush=True)
        # flow-side mel only (quality lives in the mel; HiFT is chunk-
        # agnostic given the same mel)
        cap = n + hop + kv.la + 1
        buf = np.zeros((1, cap), np.int32)
        buf[:, :n] = tokens[:, p:]
        token_buf = jnp.asarray(buf)
        cache, _ = kv.init_state()
        cache = kv._prefill(kv._fp, token_buf, cache)
        mel, _ = kv._flow_mels(token_buf, cache, kv.schedule(n))
        inc = np.asarray(mel, np.float32)
        assert inc.shape == win.shape, (inc.shape, win.shape)
        band = (np.mean(np.abs(win - inc), axis=(0, 1))
                / (np.mean(np.abs(win), axis=(0, 1)) + 1e-9))
        key = f"ring{ring}" if ring_sweep else hop
        out["blocks"][key] = {
            "ring_tokens": ring,
            "mcd_db": round(_mcd_db(win, inc), 3),
            "band_rel_max": round(float(band.max()), 4),
            "band_rel_mean": round(float(band.mean()), 4),
            "rel_mae": round(float(np.mean(np.abs(win - inc)) / scale), 4),
        }
        print(json.dumps({str(key): out["blocks"][key]}), file=sys.stderr,
              flush=True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
