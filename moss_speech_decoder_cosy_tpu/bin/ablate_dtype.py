"""bf16 serving-quality ablation: which f32 islands does the flow stack
need?

BENCH_NOTES.md round 1 measured full-size bf16-vs-f32 offline mel MAE 0.029
(3% rel) against the ~1e-3 BASELINE.md acceptance bar, without attributing
the error.  This harness bisects it by running the SAME offline decode
(250 tokens ~ 20 s of audio, full-size MOSS flow config, fixed random
weights) under one dtype recipe per variant:

  f32        — golden reference
  bf16_old   — everything bf16, ODE carry in bf16 (round-1 recipe)
  bf16_f32ode — everything bf16, Euler carry/CFG combine/t-schedule in f32
                (CFMConfig.solver_dtype="float32", the round-2 default)
  bf16_est   — encoder f32, estimator bf16 (+f32 ODE carry)
  bf16_enc   — encoder bf16, estimator f32

`bf16_est` vs `bf16_enc` attributes the residual error to mu quantization
vs estimator quantization; `bf16_old` vs `bf16_f32ode` isolates solver
accumulation.  Reference protocol: equal ODE steps, deterministic noise
(flow_matching.py:199-230), offline finalize pass (flow.py:237-283).

Run on the TPU:  python -m moss_speech_decoder_cosy_tpu.bin.ablate_dtype
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ..models.flow import CausalMaskedDiffWithXvec
    from ..utils.config import moss_flow_config, CFMConfig

    n_tokens = 250
    cfm = CFMConfig(n_timesteps=10, max_noise_len=4096)
    cfg = dataclasses.replace(moss_flow_config(), cfm=cfm)
    cfg_old = dataclasses.replace(
        cfg, cfm=dataclasses.replace(cfm, solver_dtype="compute"))

    flow = CausalMaskedDiffWithXvec(cfg)
    flow_old = CausalMaskedDiffWithXvec(cfg_old)

    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, n_tokens)))
    valid = jnp.ones((1, n_tokens), bool)
    prompt_feat = jnp.zeros((1, 0, cfg.output_size))
    emb = jnp.asarray(rng.standard_normal((1, cfg.spk_embed_dim)),
                      jnp.float32)

    print("# init params...", file=sys.stderr, flush=True)
    params = jax.jit(flow.init)(jax.random.PRNGKey(0), tokens, valid,
                                prompt_feat, emb)
    to_bf16 = lambda p: jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)

    def offline(mdl, p):
        dt = jax.tree.leaves(p)[0].dtype
        f = jax.jit(lambda pp: mdl.apply(pp, tokens, valid,
                                         prompt_feat.astype(dt),
                                         emb.astype(dt), streaming=False,
                                         finalize=True))
        return np.asarray(f(p), np.float32)

    def split_run(enc_params, dec_params, enc_dtype, dec_dtype):
        """Encoder and CFM decoder under different param dtypes, with the
        explicit activation cast at the boundary (mirrors flow.__call__)."""
        def impl(pe, pd):
            m_enc = flow.bind(pe)
            mu, mel_valid = m_enc.encode(tokens, valid, streaming=False,
                                         finalize=True)
            spks = m_enc._spk(emb.astype(enc_dtype))
            mu = mu.astype(dec_dtype)
            spks = spks.astype(dec_dtype)
            conds = jnp.zeros_like(mu)
            return flow.bind(pd).decoder(mu, mel_valid, spks=spks,
                                         cond=conds, streaming=False)
        return np.asarray(jax.jit(impl)(enc_params, dec_params), np.float32)

    print("# golden f32...", file=sys.stderr, flush=True)
    golden = offline(flow, params)
    scale = float(np.mean(np.abs(golden)))

    variants = {}
    bf16 = to_bf16(params)
    print("# bf16 old recipe...", file=sys.stderr, flush=True)
    variants["bf16_old"] = offline(flow_old, bf16)
    print("# bf16 + f32 ODE carry...", file=sys.stderr, flush=True)
    variants["bf16_f32ode"] = offline(flow, bf16)
    print("# encoder f32 / estimator bf16...", file=sys.stderr, flush=True)
    variants["bf16_est"] = split_run(params, bf16, jnp.float32,
                                     jnp.bfloat16)
    print("# encoder bf16 / estimator f32...", file=sys.stderr, flush=True)
    variants["bf16_enc"] = split_run(bf16, params, jnp.bfloat16,
                                     jnp.float32)

    out = {"mean_abs_golden": round(scale, 5)}
    for name, mel in variants.items():
        mae = float(np.mean(np.abs(mel - golden)))
        out[name] = {"mel_mae": round(mae, 6),
                     "rel": round(mae / scale, 5)}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
