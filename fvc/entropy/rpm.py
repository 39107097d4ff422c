"""Recurrent Probability Model (RPM) — entropy_models.py:328-357.

Conditions (sigma, mu) of the current latent on the previous frame's quantized
latent through 4 convs -> ConvLSTM -> 4 convs. Hidden: [B, h/16, w/16, 2C].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.ops.conv import Conv
from fvc.ops.convlstm import ConvLSTM


class RPM(nn.Module):
    channels: int = 128

    @nn.compact
    def __call__(self, prior_latent, hidden):
        x = jax.nn.relu(Conv(self.channels)(prior_latent))
        x = jax.nn.relu(Conv(self.channels)(x))
        x = jax.nn.relu(Conv(self.channels)(x))
        x = jax.nn.relu(Conv(self.channels)(x))
        x, hidden = ConvLSTM(self.channels)(x, hidden)
        x = jax.nn.relu(Conv(self.channels)(x))
        x = jax.nn.relu(Conv(self.channels)(x))
        x = jax.nn.relu(Conv(self.channels)(x))
        sigma_mu = jax.nn.relu(Conv(2 * self.channels)(x))
        sigma, mu = jnp.split(sigma_mu, 2, axis=-1)
        return sigma, mu, hidden


def rpm_scale(sigma_raw: jax.Array) -> jax.Array:
    """RecProbModel post-processing: exp(max(sigma, -7)) / 10
    (entropy_models.py:60-62). Upper clamp prevents f32 exp overflow; the
    likelihood's sigma clip makes values beyond it equivalent anyway."""
    return jnp.exp(jnp.clip(sigma_raw, -7.0, 50.0)) / 10.0
