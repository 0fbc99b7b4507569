"""v-prediction diffusion flow (the cosyvoice1 GradTTS/stable-audio fork).

Rebuilds the capabilities of cosyvoice1's score-based variant:

- ``flow_gradtts.MaskedDiffWithXvec`` (cosyvoice1/flow/flow_gradtts.py:24-142):
  token encoder + length regulator driving a diffusion decoder instead of
  the OT-CFM solver;
- ``Stable_Diffusion`` (cosyvoice1/flow/stable/stable_diffusion.py:28-110):
  v-objective training (alpha=cos(t*pi/2), sigma=sin(t*pi/2),
  v = eps*alpha - x0*sigma) with Sobol timestep draws and CFG dropout, over
  a DiffusionTransformer;
- the DDIM-style v-diffusion sampler and the discrete-Euler sampler
  (cosyvoice1/flow/stable/sampling.py:25-88).

TPU-first: the sampler is a single ``nn.scan`` over precomputed
alpha/sigma tables; the transformer is the rotary DiT from dit.py (the
active ``continuous_transformer`` branch of Stable_Diffusion — the
commented-out adp.py UNet1d path is dead code in the reference).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from .cfm import _fixed_noise
from .dit import DiTConfig, DiTEstimator
from .flow_v1 import ConformerEncoder, InterpolateRegulator
from ...utils.config import FlowConfig


def get_alphas_sigmas(t: np.ndarray):
    """sampling.py:8-11: cos/sin schedule."""
    return np.cos(t * np.pi / 2), np.sin(t * np.pi / 2)


def sobol_times(n: int, seed: int = 0) -> np.ndarray:
    """Scrambled Sobol timestep draws (stable_diffusion.py:57's
    torch.quasirandom.SobolEngine role) — host-side, feed into
    ``compute_loss(..., t=...)``."""
    from scipy.stats import qmc
    return qmc.Sobol(1, scramble=True, seed=seed).random(n)[:, 0] \
        .astype(np.float32)


class VDiffusion(nn.Module):
    """v-objective diffusion over a rotary DiT, CFG via cond dropout at
    train time and batch-of-2 at inference (stable_diffusion.py:28-110)."""

    dit: DiTConfig
    inference_cfg_rate: float = 0.0      # reference sample() runs uncond-free

    def setup(self):
        self.estimator = DiTEstimator(self.dit, name="estimator")

    def _v(self, x, valid, mu, t, spks, cond):
        return self.estimator(x, valid, mu, t, spks, cond)

    def compute_loss(self, x0: jnp.ndarray, valid: jnp.ndarray,
                     mu: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
                     rng: jax.Array, t=None,
                     cfg_dropout_prob: float = 0.1):
        """Masked MSE on v = eps*alpha - x0*sigma
        (stable_diffusion.py:71-93).  ``t`` (B,) optionally supplies Sobol
        draws; otherwise uniform from ``rng``."""
        b, tt, d = x0.shape
        k_t, k_eps, k_drop = jax.random.split(rng, 3)
        if t is None:
            t = jax.random.uniform(k_t, (b,), x0.dtype)
        alphas = jnp.cos(t * jnp.pi / 2)[:, None, None]
        sigmas = jnp.sin(t * jnp.pi / 2)[:, None, None]
        eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
        noised = x0 * alphas + eps * sigmas
        target = eps * alphas - x0 * sigmas
        if cfg_dropout_prob > 0:
            keep = (jax.random.uniform(k_drop, (b,)) > cfg_dropout_prob
                    ).astype(x0.dtype)
            mu = mu * keep[:, None, None]
            spks = spks * keep[:, None]
            cond = cond * keep[:, None, None]
        v = self._v(noised, valid, mu, t, spks, cond)
        m = valid[..., None].astype(x0.dtype)
        loss = jnp.sum(((v - target) * m) ** 2) / jnp.maximum(
            jnp.sum(m) * d, 1.0)
        return loss, v

    def __call__(self, mu: jnp.ndarray, valid: jnp.ndarray,
                 spks: jnp.ndarray, cond: jnp.ndarray,
                 n_timesteps: int = 10, eta: float = 0.0,
                 rng: jax.Array = None) -> jnp.ndarray:
        """DDIM-style v-diffusion sampler (sampling.py:48-88) as one
        nn.scan.  eta > 0 adds fresh noise per step (needs ``rng``)."""
        b, tt, d = mu.shape
        # DDIM state carried in f32 (cf. CFMConfig.solver_dtype rationale);
        # the estimator still runs in mu's compute dtype.
        sd = jnp.float32
        noise = jnp.asarray(_fixed_noise(16384, d)[:, :tt])
        x = jnp.broadcast_to(noise, (b, tt, d)).astype(sd)

        t = np.linspace(1.0, 0.0, n_timesteps + 1, dtype=np.float32)[:-1]
        alphas, sigmas = get_alphas_sigmas(t)
        a_next = np.concatenate([alphas[1:], [1.0]]).astype(np.float32)
        s_next = np.concatenate([sigmas[1:], [0.0]]).astype(np.float32)
        ddim = eta * np.sqrt(s_next ** 2 / np.maximum(sigmas ** 2, 1e-12)) \
            * np.sqrt(np.maximum(1 - alphas ** 2 /
                                 np.maximum(a_next ** 2, 1e-12), 0.0))
        adj = np.sqrt(np.maximum(s_next ** 2 - ddim ** 2, 0.0))
        last = np.zeros(n_timesteps, np.float32)
        last[-1] = 1.0
        keys = (jax.random.split(rng, n_timesteps) if rng is not None
                else jnp.zeros((n_timesteps, 2), jnp.uint32))

        rate = jnp.asarray(self.inference_cfg_rate, sd)
        use_cfg = self.inference_cfg_rate > 0
        if use_cfg:
            mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            spks_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
            cond_in = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
            valid_in = jnp.concatenate([valid, valid], axis=0)
        else:
            mu_in, spks_in, cond_in, valid_in = mu, spks, cond, valid

        def body(mdl, x, xs):
            a_i, s_i, a_n, adj_i, ddim_i, is_last, t_i, key = xs
            cd = mu_in.dtype
            if use_cfg:
                x_in = jnp.concatenate([x, x], axis=0).astype(cd)
                t_in = jnp.full((2 * b,), t_i, cd)
                v = mdl._v(x_in, valid_in, mu_in, t_in, spks_in, cond_in
                           ).astype(x.dtype)
                v = (1.0 + rate) * v[:b] - rate * v[b:]
            else:
                v = mdl._v(x.astype(cd), valid_in, mu_in,
                           jnp.full((b,), t_i, cd), spks_in, cond_in
                           ).astype(x.dtype)
            pred = x * a_i - v * s_i
            eps = x * s_i + v * a_i
            x_next = pred * a_n + eps * adj_i
            if rng is not None:
                x_next = x_next + jax.random.normal(key, x.shape,
                                                    x.dtype) * ddim_i
            x = jnp.where(is_last > 0, pred, x_next)
            return x, ()

        scan = nn.scan(body, variable_broadcast="params",
                       split_rngs={"params": False})
        xs = (jnp.asarray(alphas, mu.dtype), jnp.asarray(sigmas, mu.dtype),
              jnp.asarray(a_next, mu.dtype), jnp.asarray(adj, mu.dtype),
              jnp.asarray(ddim, mu.dtype), jnp.asarray(last, mu.dtype),
              jnp.asarray(t, mu.dtype), keys)
        x, _ = scan(self, x, xs)
        return x.astype(jnp.float32)


class GradTTSDiffWithXvec(nn.Module):
    """flow_gradtts.MaskedDiffWithXvec (cosyvoice1/flow/flow_gradtts.py):
    the v1 token encoder + interpolate length regulator feeding the
    v-diffusion decoder; mel length = token_len / frame_rate * sr / hop
    (22.05 kHz, hop 256)."""

    cfg: FlowConfig
    dit: DiTConfig
    sample_rate: int = 22050
    hop: int = 256

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size,
                                        name="input_embedding")
        self.spk_embed_affine_layer = nn.Dense(c.output_size,
                                               name="spk_embed_affine_layer")
        self.encoder = ConformerEncoder(c.encoder, name="encoder")
        self.encoder_proj = nn.Dense(c.output_size, name="encoder_proj")
        self.length_regulator = InterpolateRegulator(
            c.output_size, name="length_regulator")
        self.decoder = VDiffusion(self.dit, name="decoder")

    def _front(self, token, valid, embedding):
        norm = jnp.linalg.norm(embedding, axis=-1, keepdims=True)
        spks = self.spk_embed_affine_layer(
            embedding / jnp.maximum(norm, 1e-12))
        x = self.input_embedding(jnp.maximum(token, 0))
        x = x * valid[..., None].astype(x.dtype)
        h = self.encoder(x, valid)
        return self.encoder_proj(h), spks

    def mel_len(self, n_tokens: int) -> int:
        return int(n_tokens / self.cfg.input_frame_rate
                   * self.sample_rate / self.hop)

    def inference(self, token: jnp.ndarray, valid: jnp.ndarray,
                  prompt_feat: jnp.ndarray, embedding: jnp.ndarray,
                  mel_len: int, n_timesteps: int = 10) -> jnp.ndarray:
        """token already includes the prompt tokens (flow_gradtts.py:
        101-142); returns mel AFTER the prompt region."""
        h, spks = self._front(token, valid, embedding)
        h = self.length_regulator(h, mel_len)
        p = prompt_feat.shape[1]
        cond = jnp.zeros((h.shape[0], mel_len, self.cfg.output_size),
                         h.dtype)
        cond = cond.at[:, :p].set(prompt_feat.astype(h.dtype))
        feat_valid = jnp.ones((h.shape[0], mel_len), bool)
        mel = self.decoder(h, feat_valid, spks, cond,
                           n_timesteps=n_timesteps)
        return mel[:, p:]

    def loss(self, token: jnp.ndarray, token_valid: jnp.ndarray,
             feat: jnp.ndarray, feat_valid: jnp.ndarray,
             embedding: jnp.ndarray, rng: jax.Array,
             t=None) -> jnp.ndarray:
        """Training objective (flow_gradtts.py:55-99): conds are zeros (the
        prompt-prefix conditioning is commented out in the reference)."""
        h, spks = self._front(token, token_valid, embedding)
        h = self.length_regulator(h, feat.shape[1])
        cond = jnp.zeros_like(feat)
        loss, _ = self.decoder.compute_loss(feat, feat_valid, h, spks,
                                            cond, rng, t=t)
        return loss
