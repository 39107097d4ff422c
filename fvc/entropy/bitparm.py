"""Learned factorized CDF (BitEstimator), reference DVC/subnet/bitEstimator.py:6-42.

Four Bitparm stages; each computes x = x*softplus(h) + b, with a tanh gate
x += tanh(x)*tanh(a) on the first three, and sigmoid on the last. Evaluating at
x±0.5 yields per-symbol interval probabilities. Channel-parametric, spatially iid.

NHWC: parameters index the trailing channel axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bitparm(nn.Module):
    channels: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        # reference init: normal(0, 0.01**2) scaled h
        init = nn.initializers.normal(0.01)
        h = self.param("h", init, (self.channels,))
        b = self.param("b", init, (self.channels,))
        if self.final:
            return jax.nn.sigmoid(x * jax.nn.softplus(h) + b)
        a = self.param("a", init, (self.channels,))
        x = x * jax.nn.softplus(h) + b
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """CDF network F(x); interval likelihood = F(x+.5) - F(x-.5)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = Bitparm(self.channels)(x)
        x = Bitparm(self.channels)(x)
        x = Bitparm(self.channels)(x)
        return Bitparm(self.channels, final=True)(x)

    def likelihood(self, params, x):
        return self.apply(params, x + 0.5) - self.apply(params, x - 0.5)
