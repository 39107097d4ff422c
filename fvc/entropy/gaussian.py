"""Conditional Gaussian/Laplace entropy models.

- `gaussian_conditional_*`: compressai GaussianConditional equivalent used by
  RecProbModel (entropy_models.py:37,63) and MeanScaleHyperPriors (:162):
  interval likelihood under N(mu, sigma^2), scale-table indexing for the rANS
  coder, median-offset quantization.
- `laplace_conditional_bits`: the LSVC path (models.py:1216-1245) — Laplace with
  mu=0, sigma clamp [1e-5, 1e10], clamp-bpp estimator.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from fvc.ops.math import (
    bits_from_likelihood,
    gaussian_interval_likelihood,
    laplace_interval_likelihood,
    lower_bound,
)

SCALES_MIN = 0.11
SCALES_MAX = 256.0
SCALES_LEVELS = 64
LIKELIHOOD_BOUND = 1e-9


def scale_table() -> np.ndarray:
    """exp(linspace(log .11, log 256, 64)) — entropy_models.py:18-23."""
    return np.exp(np.linspace(math.log(SCALES_MIN), math.log(SCALES_MAX), SCALES_LEVELS))


def build_indexes(sigma: jax.Array) -> jax.Array:
    """Index of the smallest table scale >= sigma (compressai build_indexes)."""
    table = jnp.asarray(scale_table(), sigma.dtype)
    s = jnp.clip(sigma, SCALES_MIN, None)
    # number of table entries strictly below s = index
    return jnp.sum(s[..., None] > table[:-1], axis=-1).astype(jnp.int32)


def gaussian_conditional(
    x: jax.Array,
    sigma: jax.Array,
    mu: jax.Array | None = None,
    *,
    training: bool,
    rng: jax.Array | None = None,
):
    """Returns (x_hat, likelihood). Training: additive noise; eval: round around
    the mean (x_hat = round(x - mu) + mu)."""
    if training:
        if rng is None:
            raise ValueError("gaussian_conditional training needs rng")
        x_hat = x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)
    else:
        x_hat = jnp.round(x - (0.0 if mu is None else mu)) + (0.0 if mu is None else mu)
    p = gaussian_interval_likelihood(x_hat, sigma, mu)
    p = lower_bound(p, LIKELIHOOD_BOUND)
    return x_hat, p


def laplace_conditional_bits(feature_hat: jax.Array, sigma: jax.Array):
    """(total_bits, probs) under Laplace(0, sigma) with the reference's clamp
    estimator — models.py:1216-1245 feature_probs_based_sigma."""
    p = laplace_interval_likelihood(feature_hat, sigma)
    return bits_from_likelihood(p), p


# ------------------------------------------------------------------
# CDF tables for the rANS coder (host side)
# ------------------------------------------------------------------

def gaussian_cdf_tables(tail_mass: float = 1e-9):
    """Per-table-scale quantized CDFs over a symmetric support
    (compressai GaussianConditional.update equivalent).
    Returns (cdf [64, Lmax+2] int32, cdf_length [64], offset [64])."""
    from fvc.entropy.coder import pmf_to_quantized_cdf
    from scipy.stats import norm  # scipy ships with the baked numpy stack

    scales = scale_table()
    multiplier = -norm.ppf(tail_mass / 2.0)
    pmf_center = np.ceil(scales * multiplier).astype(np.int32)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())
    cdf = np.zeros((SCALES_LEVELS, max_length + 2), dtype=np.int32)
    for i, s in enumerate(scales):
        c = pmf_center[i]
        samples = np.arange(-c, c + 1, dtype=np.float64)
        upper = norm.sf((samples - 0.5) / s)
        low = norm.sf((samples + 0.5) / s)
        pmf = upper - low
        tail = 2.0 * norm.sf((c + 0.5) / s)
        cdf[i, : pmf_length[i] + 2] = pmf_to_quantized_cdf(pmf, tail)
    return cdf, pmf_length + 2, -pmf_center
