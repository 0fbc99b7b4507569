"""Activation functions (feature-last layout).

Snake follows the reference's linear-scale variant
(cosyvoice/transformer/activation.py:34-79): ``x + (1/(a+1e-9)) sin^2(a x)``
with a per-channel trainable ``alpha`` initialized to 1.  Here tensors are
(..., C) so alpha broadcasts on the last axis (TPU lane dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def mish(x: jnp.ndarray) -> jnp.ndarray:
    """x * tanh(softplus(x)) — matches torch.nn.Mish."""
    return x * jnp.tanh(jax.nn.softplus(x))


def snake(x: jnp.ndarray, alpha: jnp.ndarray,
          no_div_by_zero: float = 1e-9) -> jnp.ndarray:
    """Snake activation, alpha shaped (C,) broadcasting over (..., C)."""
    s = jnp.sin(alpha * x)
    return x + s * s / (alpha + no_div_by_zero)


class Snake(nn.Module):
    """Per-channel snake with trainable alpha (linear scale, init 1)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        return snake(x, alpha)


def get_activation(name: str):
    """Registry mirroring cosyvoice/utils/class_utils.py activation map."""
    return {
        "relu": jax.nn.relu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "swish": jax.nn.silu,
        "silu": jax.nn.silu,
        "mish": mish,
        "tanh": jnp.tanh,
        "elu": jax.nn.elu,
    }[name]
