"""Core numeric primitives shared across the codec stack.

Reference semantics reproduced here (citations into /root/reference):
- LowerBound straight-through gradient rule: DVC/subnet/GDN.py:9-23
- bits estimator  sum(clamp(-log(p+1e-5)/log 2, 0, 50)): models.py:517, models.py:1235-1245
- Laplace interval likelihood with sigma clamp [1e-5, 1e10]: models.py:1236-1240
- quantization: additive U(-.5,.5) noise in training, round in eval (models.py:600-607);
  straight-through round `quantize_ste`: models.py:1983
- PSNR: models.py:460-473
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2 = math.log(2.0)


# ---------------------------------------------------------------------------
# Bound ops with straight-through-style gradients
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lower_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """max(x, bound) with the pass-through gradient rule.

    Gradient flows to ``x`` when x >= bound OR when the incoming gradient pushes
    x upward (grad < 0) — matching DVC/subnet/GDN.py:17-23.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


@jax.custom_vjp
def upper_bound(x: jax.Array, bound: jax.Array) -> jax.Array:
    """min(x, bound) with the symmetric pass-through gradient rule."""
    return jnp.minimum(x, bound)


def _upper_bound_fwd(x, bound):
    return jnp.minimum(x, bound), (x, bound)


def _upper_bound_bwd(res, g):
    x, bound = res
    pass_through = (x <= bound) | (g > 0)
    return (jnp.where(pass_through, g, 0.0), None)


upper_bound.defvjp(_upper_bound_fwd, _upper_bound_bwd)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

def quantize_ste(x: jax.Array) -> jax.Array:
    """round(x) with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_noise(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Additive uniform(-0.5, 0.5) noise — the training-time quantizer."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def quantize(x: jax.Array, training: bool, rng: jax.Array | None = None) -> jax.Array:
    """Training: additive noise; eval: hard round (models.py:600-607)."""
    if training:
        if rng is None:
            raise ValueError("quantize(training=True) needs an rng key")
        return quantize_noise(x, rng)
    return jnp.round(x)


# ---------------------------------------------------------------------------
# Likelihood / bits math
# ---------------------------------------------------------------------------

def laplace_interval_likelihood(
    x: jax.Array, sigma: jax.Array, mu: jax.Array | None = None
) -> jax.Array:
    """P(x - 0.5 < X <= x + 0.5) under Laplace(mu, sigma).

    sigma is clamped to [1e-5, 1e10] as in models.py:1236-1240. Computed in a
    numerically robust closed form (no cdf subtraction cancellation):
    for |c| = |x-mu|, p = exp(-(|c|-.5)/s)*(1-exp(-1/s))/2 when |c|>=.5,
    else p = 1 - (exp(-(.5-|c|)/s)+exp(-(.5+|c|)/s))/2.
    """
    x = x.astype(jnp.float32)
    sigma = jnp.clip(sigma.astype(jnp.float32), 1e-5, 1e10)
    c = x if mu is None else x - mu.astype(jnp.float32)
    a = jnp.abs(c)
    inv_s = 1.0 / sigma
    # Safe-where: each branch must be FINITE (value AND grad) even where it
    # is not selected — jnp.where multiplies the unselected branch's cotangent
    # by 0, and 0*inf = NaN. Without the max() clamps, the tail branch
    # computes exp(+(0.5-a)/sigma) for a < 0.5 (overflow at small sigma) and
    # the center branch exp(+(a-0.5)/sigma) for a > 0.5. This NaN silently
    # froze ALL transform-path gradients through bpp_res for a whole training
    # stage (zero_nans ate it); keep the clamps.
    d_tail = jnp.maximum(a - 0.5, 0.0)
    p_tail = 0.5 * jnp.exp(-d_tail * inv_s) * (-jnp.expm1(-inv_s))
    d_center = jnp.maximum(0.5 - a, 0.0)
    p_center = 1.0 - 0.5 * (jnp.exp(-d_center * inv_s)
                            + jnp.exp(-(0.5 + a) * inv_s))
    return jnp.where(a >= 0.5, p_tail, p_center)


def gaussian_interval_likelihood(
    x: jax.Array, sigma: jax.Array, mu: jax.Array | None = None,
    likelihood_lower_bound: float = 1e-9,
) -> jax.Array:
    """P(x - 0.5 < X <= x + 0.5) under N(mu, sigma^2), computed via the
    complementary CDF of |x-mu| for numerical stability (the standard
    survival-function trick used by learned-compression entropy models)."""
    x = x.astype(jnp.float32)
    sigma = jnp.clip(sigma.astype(jnp.float32), 0.11, 1e10)
    c = x if mu is None else x - mu.astype(jnp.float32)
    a = jnp.abs(c)
    upper = _std_normal_sf((a - 0.5) / sigma)
    lower = _std_normal_sf((a + 0.5) / sigma)
    return jnp.maximum(upper - lower, likelihood_lower_bound)


def _std_normal_sf(z: jax.Array) -> jax.Array:
    """Standard normal survival function 1 - Phi(z) = erfc(z/sqrt2)/2."""
    return 0.5 * jax.lax.erfc(z / math.sqrt(2.0))


def bits_from_likelihood(p: jax.Array, *, axis=None) -> jax.Array:
    """Reference bits estimator: sum(clamp(-log(p + 1e-5)/log 2, 0, 50)).

    models.py:517 / models.py:1235-1245 — the universal bpp estimator. Keeping
    the +1e-5 and the [0, 50] clamp exactly preserves RD-curve comparability.
    """
    bits = jnp.clip(-jnp.log(p.astype(jnp.float32) + 1e-5) / LOG2, 0.0, 50.0)
    return jnp.sum(bits, axis=axis)


def bits_from_log_likelihood(p: jax.Array, *, axis=None) -> jax.Array:
    """Unclamped estimator sum(-log2 p) used by MeanScaleHyperPriors
    (entropy_models.py:231-238)."""
    return jnp.sum(-jnp.log(p) / LOG2, axis=axis)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def mse(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(a - b))


def psnr(raw: jax.Array, com: jax.Array, *, axis=None) -> jax.Array:
    """10*log10(1/mse) on [0,1] images (models.py:460-467)."""
    err = jnp.mean(jnp.square((raw - com).astype(jnp.float32)), axis=axis)
    return 10.0 * jnp.log(1.0 / jnp.maximum(err, 1e-12)) / math.log(10.0)


def psnr_per_frame(raw: jax.Array, com: jax.Array) -> jax.Array:
    """Per-leading-dim PSNR list (models.py:468-473)."""
    n = raw.shape[0]
    return psnr(raw.reshape(n, -1), com.reshape(n, -1), axis=-1)
