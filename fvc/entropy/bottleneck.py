"""Fully-factorized entropy bottleneck (Ballé et al. 2018 univariate density
model), the TPU-native equivalent of compressai's EntropyBottleneck used by the
reference at entropy_models.py:26-148 and throughout the SSF/ELFVC/MCVC models.

Per-channel monotone CDF built from a chain of tiny (<=3-wide) layers;
evaluation is pure elementwise math + channel-batched einsum — VPU/MXU friendly,
no per-symbol loops. Also exports quantized CDF tables for the native rANS coder
(fvc.entropy.coder).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fvc.ops.math import lower_bound

LIKELIHOOD_BOUND = 1e-9


class EntropyBottleneck(nn.Module):
    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        K = len(self.filters)
        dims = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1.0 / (K + 1))
        mats, biases, factors = [], [], []
        for k in range(K + 1):
            init_m = math.log(math.expm1(1.0 / scale / dims[k + 1]))
            mats.append(self.param(
                f"matrix_{k}", lambda rng, s, v=init_m: jnp.full(s, v),
                (self.channels, dims[k + 1], dims[k])))
            biases.append(self.param(
                f"bias_{k}", nn.initializers.uniform(1.0),  # offset below to (-.5,.5)
                (self.channels, dims[k + 1], 1)))
            if k < K:
                factors.append(self.param(
                    f"factor_{k}", nn.initializers.zeros,
                    (self.channels, dims[k + 1], 1)))
        self._mats = mats
        self._biases = biases
        self._factors = factors
        self.quantiles = self.param(
            "quantiles",
            lambda rng, s: jnp.tile(
                jnp.asarray([-self.init_scale, 0.0, self.init_scale]), (self.channels, 1, 1)),
            (self.channels, 1, 3))

    def _logits_cumulative(self, x, stop_gradient: bool):
        """x: [C, 1, N] -> logits [C, 1, N]."""
        v = x
        K = len(self.filters)
        for k in range(K + 1):
            m = self._mats[k]
            b = self._biases[k] - 0.5  # uniform(0,1) init shifted to (-.5,.5)
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            v = jnp.einsum("coi,cin->con", jax.nn.softplus(m), v) + b
            if k < K:
                a = self._factors[k]
                if stop_gradient:
                    a = jax.lax.stop_gradient(a)
                v = v + jnp.tanh(a) * jnp.tanh(v)
        return v

    def medians(self):
        return self.quantiles[:, 0, 1]

    def _likelihood_flat(self, v):
        """v: [C, 1, N] (already median-offset values). -> interval likelihood."""
        upper = self._logits_cumulative(v + 0.5, stop_gradient=False)
        lower = self._logits_cumulative(v - 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(upper + lower))
        p = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        return p

    def __call__(self, x, *, training: bool, rng=None):
        """x: [..., C]. Returns (x_hat, likelihood) with median-offset round (eval)
        or additive-noise (training) quantization — compressai semantics."""
        C = x.shape[-1]
        flat = jnp.moveaxis(x, -1, 0).reshape(C, 1, -1)
        medians = self.medians().reshape(C, 1, 1)
        if training:
            if rng is None:
                raise ValueError("EntropyBottleneck training forward needs rng")
            v = flat + jax.random.uniform(rng, flat.shape, flat.dtype, -0.5, 0.5)
        else:
            v = jnp.round(flat - medians) + medians
        p = self._likelihood_flat(v)
        p = lower_bound(p, LIKELIHOOD_BOUND)
        # reshape back: v is [C,1,N] -> [..., C]
        x_hat = jnp.moveaxis(v.reshape(C, *x.shape[:-1]), 0, -1)
        likelihood = jnp.moveaxis(p.reshape(C, *x.shape[:-1]), 0, -1)
        return x_hat, likelihood

    def aux_loss(self):
        """Drives quantiles to the (tail, median, 1-tail) targets
        (compressai CompressionModel.aux_loss equivalent)."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2.0 / self.tail_mass - 1.0)
        targets = jnp.asarray([-t, 0.0, t])
        return jnp.sum(jnp.abs(logits - targets[None, None, :]))

    # ------------------------------------------------------------------
    # CDF table export for real entropy coding (host-side, numpy)
    # ------------------------------------------------------------------

    def cdf_tables(self, variables) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Build per-channel quantized CDFs. Returns (cdf [C, Lmax+2] int32,
        cdf_length [C], offset [C]) — the compressai `update()` contract that
        the rANS coder consumes."""
        params = {"params": variables["params"]} if "params" in variables else variables

        def logits_fn(v):
            return self.apply(params, v, stop_gradient=True, method=EntropyBottleneck._logits_cumulative)

        quantiles = np.asarray(params["params"]["quantiles"])
        medians = quantiles[:, 0, 1]
        minima = np.ceil(medians - quantiles[:, 0, 0]).astype(np.int32)
        maxima = np.ceil(quantiles[:, 0, 2] - medians).astype(np.int32)
        minima = np.maximum(minima, 0)
        maxima = np.maximum(maxima, 0)
        offset = -minima
        lengths = minima + maxima + 1
        max_len = int(lengths.max())
        C = self.channels

        # sample grid [C, 1, max_len]
        samples = np.arange(max_len, dtype=np.float32)[None, None, :]
        samples = samples + (-minima + medians)[:, None, None]
        v = jnp.asarray(samples)
        upper = np.asarray(jax.nn.sigmoid(logits_fn(v + 0.5)))[:, 0, :]
        lower = np.asarray(jax.nn.sigmoid(logits_fn(v - 0.5)))[:, 0, :]
        pmf = upper - lower
        tail = lower[:, 0] + (1.0 - upper[:, -1])

        from fvc.entropy.coder import pmf_to_quantized_cdf
        cdf = np.zeros((C, max_len + 2), dtype=np.int32)
        for c in range(C):
            L = int(lengths[c])
            cdf[c, : L + 2] = pmf_to_quantized_cdf(pmf[c, :L], float(tail[c]))
        return cdf, lengths + 2, offset
