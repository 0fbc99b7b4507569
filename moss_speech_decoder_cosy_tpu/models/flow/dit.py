"""DiT flow estimator — the cosyvoice1 DiffusionTransformer family.

Exact rebuild of the reference's stable-audio continuous-transformer
estimator path as exercised by ``flow_matching_dit.ConditionalCFM``
(cosyvoice1/flow/stable/dit.py:15-307 with
transformer_type='continuous_transformer', global_cond_type='prepend';
blocks in stable/transformer.py):

- Fourier timestep features -> 2-layer MLP; speaker x-vector through
  ``to_global_embed`` (2 bias-free linears + SiLU) ADDED to the timestep
  embed; the sum is prepended as one token (dit.py:205-225).
- input = [x ++ mu] channels, zero-init residual 1x1 pre/post convs
  (dit.py:152-155, 244-258).
- blocks: bias-free LayerNorm (scale only) -> fused-qkv self-attention
  with PARTIAL NeoX rotary (RotaryEmbedding(max(dk//2, 32)),
  transformer.py:89-171) and bias-free zero-init out -> bias-free GLU
  SwiGLU feed-forward (transformer.py:197-269, 589-705).
- NO final norm before the bias-free ``project_out``
  (transformer.py:823-831).

Golden parity vs a faithful torch shim is asserted in
tests/test_golden_parity.py (x_transformers isn't importable here, so the
shim re-states the reference blocks verbatim).
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .cfm import _fixed_noise, t_span_cosine
from ...utils.config import CFMConfig


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    io_channels: int = 80
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    ff_mult: int = 4
    spk_embed_dim: int = 80              # global_cond_dim (x-vector affine)
    timestep_features_dim: int = 256
    rope_base: float = 10000.0


def tiny_dit_config() -> DiTConfig:
    return DiTConfig(io_channels=16, embed_dim=128, depth=2, num_heads=2,
                     ff_mult=2, spk_embed_dim=12, timestep_features_dim=16)


class FourierFeatures(nn.Module):
    """stable-audio FourierFeatures: x -> [cos(2 pi f x), sin(2 pi f x)]
    with learned frequencies (blocks.FourierFeatures)."""

    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (B, 1)
        w = self.param("weight", nn.initializers.normal(self.std),
                       (self.out_features // 2, 1))
        f = 2.0 * np.pi * x @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


def _rope_partial(x: jnp.ndarray, base: float) -> jnp.ndarray:
    """Partial NeoX rotary over (B, H, T, dk): the reference builds
    RotaryEmbedding(max(dk//2, 32)), whose (duplicated) frequency vector
    spans rot_dim = max(dk//2, 32) channels; only the first rot_dim
    channels rotate, half/half split (rotate_half, transformer.py:89-171,
    computed in f32).  Requires dk >= rot_dim (true for dk >= 64; the
    reference broadcast fails below that too)."""
    dk = x.shape[-1]
    rot_dim = max(dk // 2, 32)           # == RotaryEmbedding dim
    assert dk >= rot_dim, (dk, rot_dim)
    half = rot_dim // 2
    pos = jnp.arange(x.shape[2], dtype=jnp.float32)
    inv = 1.0 / (base ** (np.arange(0, rot_dim, 2, dtype=np.float32)
                          / rot_dim))
    ang = pos[:, None] * inv[None, :]                   # (T, rot_dim/2)
    cos = jnp.cos(ang)[None, None]
    sin = jnp.sin(ang)[None, None]
    xf = x.astype(jnp.float32)
    x1 = xf[..., :half]
    x2 = xf[..., half: rot_dim]
    rot = jnp.concatenate([x1 * cos - x2 * sin,
                           x2 * cos + x1 * sin], axis=-1)
    return jnp.concatenate([rot, xf[..., rot_dim:]],
                           axis=-1).astype(x.dtype)


class ScaleOnlyLayerNorm(nn.Module):
    """Reference bias-less LayerNorm (transformer.py:174-194): learned
    gamma, fixed zero beta."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale


class DiTBlock(nn.Module):
    """TransformerBlock (transformer.py:589-705, no adaLN/cross/conformer):
    pre-LN fused-qkv attention + GLU SwiGLU feed-forward."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t, _ = x.shape
        nh, dk = c.num_heads, c.embed_dim // c.num_heads
        h = ScaleOnlyLayerNorm(name="pre_norm")(x)
        qkv = nn.Dense(3 * c.embed_dim, use_bias=False, name="to_qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        to_heads = lambda y: y.reshape(b, t, nh, dk).transpose(0, 2, 1, 3)
        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = _rope_partial(q, c.rope_base)
        k = _rope_partial(k, c.rope_base)
        s = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(dk) + bias
        a = jax.nn.softmax(s, axis=-1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        x = x + nn.Dense(c.embed_dim, use_bias=False, name="attn_out")(o)

        h = ScaleOnlyLayerNorm(name="ff_norm")(x)
        inner = c.embed_dim * c.ff_mult
        glu = nn.Dense(2 * inner, name="ff_in")(h)
        u, g = jnp.split(glu, 2, axis=-1)
        x = x + nn.Dense(c.embed_dim, name="ff_out")(u * jax.nn.silu(g))
        return x


class DiTEstimator(nn.Module):
    """Same interface as CausalConditionalDecoder: velocity estimator for
    the CFM.  spks rides the prepended global token (timestep + projected
    x-vector, dit.py:205-225); ``cond`` is accepted but unused — the
    reference CFM passes it but the DiT path ignores it
    (flow_matching_dit.py:57)."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, mu: jnp.ndarray,
                 t: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
                 streaming: bool = False) -> jnp.ndarray:
        del cond, streaming
        c = self.cfg
        b, tt, _ = x.shape
        h = jnp.concatenate([x, mu], axis=-1)     # input_concat_cond
        pre = nn.Dense(h.shape[-1], use_bias=False,
                       kernel_init=nn.initializers.zeros,
                       name="preprocess")(h)
        h = h + pre
        h = nn.Dense(c.embed_dim, use_bias=False, name="project_in")(h)

        ts = FourierFeatures(c.timestep_features_dim,
                             name="timestep_features")(
            t[:, None].astype(jnp.float32)).astype(h.dtype)
        g = nn.Dense(c.embed_dim, name="ts_embed_1")(ts)
        g = nn.Dense(c.embed_dim, name="ts_embed_2")(jax.nn.silu(g))
        ge = nn.Dense(c.embed_dim, use_bias=False,
                      name="global_embed_1")(spks)
        ge = nn.Dense(c.embed_dim, use_bias=False,
                      name="global_embed_2")(jax.nn.silu(ge))
        h = jnp.concatenate([(g + ge)[:, None, :], h], axis=1)  # prepend

        key_ok = jnp.concatenate(
            [jnp.ones((b, 1), bool), valid], axis=1)      # (B, T+1)
        bias = jnp.where(key_ok[:, None, None, :], 0.0, -1e10)
        for i in range(c.depth):
            h = DiTBlock(c, name=f"block_{i}")(h, bias)
        out = nn.Dense(c.io_channels, use_bias=False,
                       name="project_out")(h)[:, 1:]
        post = nn.Dense(c.io_channels, use_bias=False,
                        kernel_init=nn.initializers.zeros,
                        name="postprocess")(out)
        return (out + post) * valid[..., None]


class DiTConditionalCFM(nn.Module):
    """CFM Euler solver over the DiT estimator (the cosyvoice1
    flow_matching_dit.ConditionalCFM role)."""

    cfg: CFMConfig
    dit_cfg: DiTConfig

    def setup(self):
        self.estimator = DiTEstimator(self.dit_cfg, name="estimator")

    def __call__(self, mu: jnp.ndarray, valid: jnp.ndarray,
                 spks: jnp.ndarray, cond: jnp.ndarray,
                 streaming: bool = False,
                 temperature: float = 1.0) -> jnp.ndarray:
        c = self.cfg
        b, t, d = mu.shape
        sd = jnp.float32 if c.solver_dtype == "float32" else mu.dtype
        noise = jnp.asarray(_fixed_noise(c.max_noise_len, d)[:, :t])
        z = jnp.broadcast_to(noise, (b, t, d)).astype(sd) * temperature
        t_span = t_span_cosine(c.n_timesteps) if c.t_scheduler == "cosine" \
            else np.linspace(0, 1, c.n_timesteps + 1, dtype=np.float32)
        mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        valid_in = jnp.concatenate([valid, valid], axis=0)
        rate = jnp.asarray(c.inference_cfg_rate, sd)

        def body(mdl, x, ts):
            t_i, dt_i = ts
            x_in = jnp.concatenate([x, x], axis=0).astype(mu.dtype)
            t_in = jnp.full((2 * b,), t_i, mu.dtype)
            dphi = mdl.estimator(x_in, valid_in, mu_in, t_in, spks_in,
                                 cond_in, streaming=streaming).astype(sd)
            dphi = (1.0 + rate) * dphi[:b] - rate * dphi[b:]
            return x + dt_i * dphi, ()

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        x, _ = scan(self, z, (jnp.asarray(t_span[:-1], sd),
                              jnp.asarray(np.diff(t_span), sd)))
        return x.astype(jnp.float32)
