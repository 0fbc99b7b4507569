"""DiT flow estimator — the cosyvoice1 DiffusionTransformer family.

The reference's experimental fork drives its CFM with a stable-audio-style
continuous transformer (cosyvoice1/flow/stable/dit.py:15-307,
transformer.py): Fourier timestep features -> global embed prepended as a
token, zero-init pre/post 1x1 convs, rotary-position attention blocks with
swish-GLU feed-forwards.  Rebuilt here as a drop-in alternative estimator
for the CFM (same (x, valid, mu, t, spks, cond) interface as the U-Net),
TPU-first: feature-last, analytic masks, no flash-attn dependency.
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
    in_channels: int = 320               # x + mu + spks + cond
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    ff_mult: int = 4
    timestep_features_dim: int = 256
    rope_theta: float = 10000.0


def tiny_dit_config() -> DiTConfig:
    return DiTConfig(io_channels=16, in_channels=64, embed_dim=32,
                     depth=2, num_heads=4, ff_mult=2,
                     timestep_features_dim=16)


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


def _rope(x: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding over (B, H, T, dk), absolute positions 0..T-1."""
    dk = x.shape[-1]
    pos = jnp.arange(x.shape[2])
    inv = 1.0 / (theta ** (jnp.arange(0, dk, 2) / dk))
    ang = pos[:, None] * inv[None, :]
    cos = jnp.cos(ang)[None, None].astype(x.dtype)
    sin = jnp.sin(ang)[None, None].astype(x.dtype)
    x1, x2 = x[..., : dk // 2], x[..., dk // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1)


class DiTBlock(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = nn.LayerNorm(name="norm1")(x)
        b, t, _ = x.shape
        nh, dk = c.num_heads, c.embed_dim // c.num_heads
        q = nn.Dense(c.embed_dim, use_bias=False, name="to_q")(h)
        k = nn.Dense(c.embed_dim, use_bias=False, name="to_k")(h)
        v = nn.Dense(c.embed_dim, use_bias=False, name="to_v")(h)
        to_heads = lambda y: y.reshape(b, t, nh, dk).transpose(0, 2, 1, 3)
        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        q = _rope(q, c.rope_theta)
        k = _rope(k, c.rope_theta)
        s = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(dk) + bias
        a = jax.nn.softmax(s, axis=-1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(b, t, c.embed_dim)
        x = x + nn.Dense(c.embed_dim, name="attn_out")(o)

        h = nn.LayerNorm(name="norm2")(x)
        inner = c.embed_dim * c.ff_mult
        gate = nn.Dense(2 * inner, name="ff_in")(h)
        u, g = jnp.split(gate, 2, axis=-1)
        x = x + nn.Dense(c.embed_dim, name="ff_out")(jax.nn.silu(g) * u)
        return x


class DiTEstimator(nn.Module):
    """Same interface as CausalConditionalDecoder: velocity estimator for
    the CFM.  Global (timestep) conditioning is prepended as one token
    (dit.py global_cond_type='prepend')."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid: jnp.ndarray, mu: jnp.ndarray,
                 t: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
                 streaming: bool = False) -> jnp.ndarray:
        c = self.cfg
        b, tt, _ = x.shape
        spks_b = jnp.broadcast_to(spks[:, None, :],
                                  (b, tt, spks.shape[-1]))
        h = jnp.concatenate([x, mu, spks_b, cond], axis=-1)
        # zero-init residual pre-conv (dit.py:252-255)
        pre = nn.Dense(c.in_channels, use_bias=False,
                       kernel_init=nn.initializers.zeros,
                       name="preprocess")(h)
        h = h + pre
        h = nn.Dense(c.embed_dim, name="project_in")(h)

        ts = FourierFeatures(c.timestep_features_dim,
                             name="timestep_features")(
            t[:, None].astype(jnp.float32)).astype(h.dtype)
        g = nn.Dense(c.embed_dim, name="ts_embed_1")(ts)
        g = nn.Dense(c.embed_dim, name="ts_embed_2")(jax.nn.silu(g))
        h = jnp.concatenate([g[:, None, :], h], axis=1)   # prepend token

        key_ok = jnp.concatenate(
            [jnp.ones((b, 1), bool), valid], axis=1)      # (B, T+1)
        bias = jnp.where(key_ok[:, None, None, :], 0.0, -1e10)
        for i in range(c.depth):
            h = DiTBlock(c, name=f"block_{i}")(h, bias)
        h = nn.LayerNorm(name="norm_out")(h)
        out = nn.Dense(c.io_channels, name="project_out")(h)[:, 1:]
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
