"""Convolutional LSTM cell (models.py:489-508).

State is a single array cat(c, h) on the channel axis, exactly like the
reference, so hidden pytrees stay flat and scan-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.ops.conv import Conv


class ConvLSTM(nn.Module):
    channels: int = 128
    forget_bias: float = 1.0

    @nn.compact
    def __call__(self, x, state):
        c, h = jnp.split(state, 2, axis=-1)
        y = Conv(4 * self.channels, kernel=3)(jnp.concatenate([x, h], axis=-1))
        j, i, f, o = jnp.split(y, 4, axis=-1)
        f = jax.nn.sigmoid(f + self.forget_bias)
        i = jax.nn.sigmoid(i)
        c = c * f + i * jax.nn.relu(j)
        o = jax.nn.sigmoid(o)
        h = o * jax.nn.relu(c)
        return h, jnp.concatenate([c, h], axis=-1)

    @staticmethod
    def zero_state(batch: int, h: int, w: int, channels: int, dtype=jnp.float32):
        return jnp.zeros((batch, h, w, 2 * channels), dtype)
