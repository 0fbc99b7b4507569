"""HiFT GAN fine-tuning: discriminators + losses + two-phase train step.

Rebuilds the reference GAN stack (cosyvoice/hifigan/discriminator.py:15-230,
hifigan.py:9-90, utils/losses.py:6-22, matcha hifigan LSGAN losses) in JAX:

- ``MultiPeriodDiscriminator`` (HiFiGAN periods 2/3/5/7/11)
- ``MultiResolutionDiscriminator`` (DAC DiscriminatorR over complex-STFT
  bands at fft 2048/1024/512)
- LSGAN generator/discriminator losses, x2 feature-matching loss, multi-mel
  L1 reconstruction (x45), TPR loss (tau 0.04), f0 L1
- ``make_gan_train_step``: the executor.train_one_epoc_gan two-step loop
  (disc turn then gen turn) as two jitted functions.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax
import flax.linen as nn
import optax

from ..ops.convs import Conv2d
from ..ops import stft as stft_ops

LRELU = 0.1


class DiscriminatorP(nn.Module):
    """HiFiGAN period discriminator: reshape audio into (T/p, p) and run
    (5,1)-kernel strided Conv2d stacks."""

    period: int
    channels: Sequence[int] = (32, 128, 512, 1024, 1024)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t = x.shape
        p = self.period
        pad = (-t) % p
        if pad:
            # torch reflect padding: mirror excluding the edge sample
            x = jnp.concatenate([x, x[:, t - 2: t - 2 - pad: -1]], axis=1)
        x = x.reshape(b, -1, p, 1)                     # (B, T/p, p, 1)
        fmap = []
        for i, ch in enumerate(self.channels):
            stride = (3, 1) if i < len(self.channels) - 1 else (1, 1)
            x = Conv2d(ch, (5, 1), stride, (2, 0), weight_norm=True,
                       name=f"conv_{i}")(x)
            x = jax.nn.leaky_relu(x, LRELU)
            fmap.append(x)
        x = Conv2d(1, (3, 1), (1, 1), (1, 0), weight_norm=True,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"disc_{i}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r); outs_g.append(o_g)
            fmaps_r.append(f_r); fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class DiscriminatorR(nn.Module):
    """DAC-style resolution discriminator on banded complex spectrograms
    (discriminator.py:80-150)."""

    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))

    def _spectrogram(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        x = 0.8 * x / (jnp.max(jnp.abs(x), axis=-1, keepdims=True) + 1e-9)
        w = self.window_length
        real, imag = stft_ops.stft(x, w, int(w * self.hop_factor),
                                   stft_ops.hann_window(w))
        return jnp.stack([real, imag], axis=-1)        # (B, T, F, 2)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        spec = self._spectrogram(x)                    # (B, T, F, 2)
        n_fft = self.window_length // 2 + 1
        bands = [(int(lo * n_fft), int(hi * n_fft)) for lo, hi in self.bands]
        fmap = []
        outs = []
        for bi, (lo, hi) in enumerate(bands):
            h = spec[:, :, lo:hi, :]
            for i in range(5):
                stride = (1, 2) if i in (1, 2, 3) else (1, 1)
                ks = (3, 9) if i < 4 else (3, 3)
                pad = (1, 4) if i < 4 else (1, 1)
                h = Conv2d(self.channels, ks, stride, pad, weight_norm=True,
                           name=f"band{bi}_conv{i}")(h)
                h = jax.nn.leaky_relu(h, LRELU)
                fmap.append(h)
            outs.append(h)
        x = jnp.concatenate(outs, axis=2)              # cat on freq
        x = Conv2d(1, (3, 3), (1, 1), (1, 1), weight_norm=True,
                   name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiResolutionDiscriminator(nn.Module):
    fft_sizes: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i, w in enumerate(self.fft_sizes):
            d = DiscriminatorR(w, name=f"disc_{i}")
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r); outs_g.append(o_g)
            fmaps_r.append(f_r); fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultipleDiscriminator(nn.Module):
    """MPD ++ MRD (discriminator.py:15-35)."""

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        r1, g1, fr1, fg1 = MultiPeriodDiscriminator(name="mpd")(y, y_hat)
        r2, g2, fr2, fg2 = MultiResolutionDiscriminator(name="mrd")(y, y_hat)
        return r1 + r2, g1 + g2, fr1 + fr2, fg1 + fg2


# ------------------------------------------------------------------ losses
def generator_loss(disc_outputs: List[jnp.ndarray]) -> jnp.ndarray:
    return sum(jnp.mean((1.0 - dg) ** 2) for dg in disc_outputs)


def discriminator_loss(real: List[jnp.ndarray],
                       gen: List[jnp.ndarray]) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(real, gen):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for fr, fg in zip(fmap_r, fmap_g):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def tpr_loss(real: List[jnp.ndarray], gen: List[jnp.ndarray],
             tau: float) -> jnp.ndarray:
    """Truncated pointwise relativistic loss (utils/losses.py:6-12)."""
    loss = 0.0
    for dr, dg in zip(real, gen):
        diff = dr - dg
        m = jnp.median(diff)
        below = diff < m
        sq = (diff - m) ** 2
        l_rel = jnp.sum(sq * below) / jnp.maximum(jnp.sum(below), 1)
        loss += tau - jax.nn.relu(tau - l_rel)
    return loss


def mel_l1_loss(real: jnp.ndarray, gen: jnp.ndarray,
                mel_transforms: Sequence[Callable]) -> jnp.ndarray:
    return sum(jnp.mean(jnp.abs(t(gen) - t(real))) for t in mel_transforms)


# -------------------------------------------------------------- train step
@flax.struct.dataclass
class GanTrainState:
    step: jnp.ndarray
    gen_params: flax.core.FrozenDict | dict
    disc_params: flax.core.FrozenDict | dict
    gen_opt: object
    disc_opt: object


def make_gan_train_step(generator, discriminator, mel_transforms,
                        gen_tx: optax.GradientTransformation,
                        disc_tx: optax.GradientTransformation,
                        mel_weight: float = 45.0, fm_weight: float = 2.0,
                        tpr_weight: float = 1.0, tpr_tau: float = 0.04):
    """Returns jitted (disc_step, gen_step) mirroring
    executor.train_one_epoc_gan's alternating turns (executor.py:94-180).

    batch: speech (B, L), speech_feat (B, T, 80), pitch_feat (B, T).
    """

    def synth(gen_params, batch, rng):
        return generator.apply(gen_params, batch["speech_feat"], rng,
                               method=generator.forward_train)

    def disc_loss_fn(disc_params, gen_params, batch, rng):
        wav, _ = synth(gen_params, batch, rng)
        wav = jax.lax.stop_gradient(wav)
        r, g, _, _ = discriminator.apply(disc_params, batch["speech"], wav)
        loss = discriminator_loss(r, g) + tpr_weight * tpr_loss(r, g, tpr_tau)
        return loss

    def gen_loss_fn(gen_params, disc_params, batch, rng):
        wav, f0 = synth(gen_params, batch, rng)
        r, g, fr, fg = discriminator.apply(disc_params, batch["speech"], wav)
        loss_gen = generator_loss(g)
        loss_fm = feature_loss(fr, fg)
        loss_mel = mel_l1_loss(batch["speech"], wav, mel_transforms)
        loss_tpr = tpr_loss(g, r, tpr_tau)
        loss_f0 = jnp.mean(jnp.abs(f0 - batch["pitch_feat"]))
        loss = (loss_gen + fm_weight * loss_fm + mel_weight * loss_mel
                + tpr_weight * loss_tpr + loss_f0)
        return loss, {"loss_gen": loss_gen, "loss_fm": loss_fm,
                      "loss_mel": loss_mel, "loss_f0": loss_f0}

    @jax.jit
    def disc_step(state: GanTrainState, batch, rng):
        loss, grads = jax.value_and_grad(disc_loss_fn)(
            state.disc_params, state.gen_params, batch, rng)
        updates, opt = disc_tx.update(grads, state.disc_opt,
                                      state.disc_params)
        return state.replace(
            disc_params=optax.apply_updates(state.disc_params, updates),
            disc_opt=opt), {"loss_disc": loss}

    @jax.jit
    def gen_step(state: GanTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params, state.disc_params,
                                       batch, rng)
        updates, opt = gen_tx.update(grads, state.gen_opt, state.gen_params)
        return state.replace(
            step=state.step + 1,
            gen_params=optax.apply_updates(state.gen_params, updates),
            gen_opt=opt), {"loss": loss, **metrics}

    return disc_step, gen_step
