"""Generalized Divisive Normalization (GDN / IGDN).

Reference: DVC/subnet/GDN.py:26-93. y_i = x_i / sqrt(beta_i + sum_j gamma_ji x_j^2)
with sqrt-reparameterized beta/gamma, pedestal 2^-36, and the LowerBound
pass-through gradient (fvc.ops.math.lower_bound).

TPU note: the norm pool is a 1x1 conv over x^2 — a pure MXU matmul — followed by
rsqrt; XLA fuses the elementwise tail, so no hand-written kernel is needed here.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fvc.ops.math import lower_bound


class GDN(nn.Module):
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    reparam_offset: float = 2 ** -18

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_min + pedestal) ** 0.5
        gamma_bound = self.reparam_offset

        beta = self.param(
            "beta", lambda _: jnp.sqrt(jnp.ones((ch,)) + pedestal))
        gamma = self.param(
            "gamma", lambda _: jnp.sqrt(self.gamma_init * jnp.eye(ch) + pedestal))

        beta = lower_bound(beta, beta_bound) ** 2 - pedestal
        gamma = lower_bound(gamma, gamma_bound) ** 2 - pedestal

        from fvc.core.policy import pallas_gdn_enabled
        if pallas_gdn_enabled():
            from fvc.ops.pallas_kernels import gdn_pallas
            return gdn_pallas(x, gamma, beta, inverse=self.inverse)

        # norm pool: [.., ch] @ [ch, ch] on the MXU. Keep the output in the
        # input's dtype so a bf16 activation policy isn't silently promoted
        # back to f32 by the f32 parameters.
        norm = jnp.sqrt(jnp.square(x.astype(jnp.float32)) @ gamma + beta)
        y = x * norm.astype(x.dtype) if self.inverse else x / norm.astype(x.dtype)
        return y
