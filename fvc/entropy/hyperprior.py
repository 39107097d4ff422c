"""Mean-scale hyperprior entropy models.

- `MeanScaleHyperprior`: stride-1 conv hyper transforms over an already
  down-sampled latent (entropy_models.py:150-324) — the MCVC/recurrent-free path.
- `SSFHyperprior`: the ScaleSpaceFlow-style hyperprior with stride-2
  hyper-transforms, QReLU scale decoder, and optional SPnet super-precision
  latent predictor (models.py:1958-1999).

Both return (y_hat, likelihoods dict) and expose the pieces needed for real
coding (z latent, sigma/mu heads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.gaussian import gaussian_conditional
from fvc.ops.conv import Conv, Deconv
from fvc.ops.math import quantize_ste


class MeanScaleHyperprior(nn.Module):
    """h_a (4 convs s1) -> z -> factorized EB -> h_s (4 convs s1) -> (sigma, mu)
    -> conditional Gaussian on y. sigma = exp(max(raw, -7))."""

    channels: int = 128

    @nn.compact
    def __call__(self, y, *, training: bool, rng=None):
        C = self.channels
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        z = Conv(C)(y)
        z = jax.nn.leaky_relu(z, 0.01)
        z = Conv(C)(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = Conv(C)(z)
        z = jax.nn.leaky_relu(z, 0.01)
        z = Conv(C)(z)

        eb = EntropyBottleneck(C, name="entropy_bottleneck")
        z_hat, z_likelihood = eb(z, training=training, rng=r1)

        g = jax.nn.leaky_relu(Conv(C)(z_hat), 0.01)
        g = jax.nn.leaky_relu(Conv(C)(g), 0.01)
        g = jax.nn.leaky_relu(Conv(C)(g), 0.01)
        params = Conv(2 * C)(g)
        sigma_raw, mu = jnp.split(params, 2, axis=-1)
        # reference: exp(max(raw, -7)); upper clamp avoids f32 exp overflow
        sigma = jnp.exp(jnp.clip(sigma_raw, -7.0, 50.0))
        y_hat, y_likelihood = gaussian_conditional(y, sigma, mu, training=training, rng=r2)
        return y_hat, {"y": y_likelihood, "z": z_likelihood,
                       "sigma": sigma, "mu": mu, "z_latent": z}


class _HyperEncoder(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv(self.planes, kernel=5, stride=2)(x))
        x = jax.nn.relu(Conv(self.planes, kernel=5, stride=2)(x))
        return Conv(self.planes, kernel=5, stride=2)(x)


class _HyperDecoder(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Deconv(self.planes, kernel=5)(x))
        x = jax.nn.relu(Deconv(self.planes, kernel=5)(x))
        return Deconv(self.planes, kernel=5)(x)


def qrelu(x, bit_depth: int = 8, beta: float = 100.0):
    """compressai QReLU forward: clamp to [0, 2^bit_depth - 1]; backward uses a
    smooth surrogate — approximated here by clamp with pass-through handled via
    a straight-through estimator on the clamp."""
    hi = 2.0 ** bit_depth - 1.0
    clipped = jnp.clip(x, 0.0, hi)
    return x + jax.lax.stop_gradient(clipped - x)


class _HyperDecoderQReLU(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = qrelu(Deconv(self.planes, kernel=5)(x))
        x = qrelu(Deconv(self.planes, kernel=5)(x))
        return qrelu(Deconv(self.planes, kernel=5)(x))


class SPnet(nn.Module):
    """Super-precision latent predictor (super_precision.py:129-166): 7x7 init
    conv -> ResnetBlock, spatial attention, ResnetBlock -> concat skip -> 1x1."""

    dim: int = 64
    out_channels: int = 192
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        from fvc.models.attention import SpatialAttention  # local to avoid cycle

        mid = 8 * self.dim
        x = Conv(mid, kernel=7)(x)
        r = x
        x = _ResnetBlock(mid, self.groups)(x)
        x = x + SpatialAttention(mid)(nn.GroupNorm(num_groups=1)(x))
        x = _ResnetBlock(mid, self.groups)(x)
        x = jnp.concatenate([x, r], axis=-1)
        x = _ResnetBlock(self.dim, self.groups)(x)
        return Conv(self.out_channels, kernel=1)(x)


class _ResnetBlock(nn.Module):
    features: int
    groups: int = 8

    @nn.compact
    def __call__(self, x):
        h = Conv(self.features, kernel=3)(x)
        h = nn.GroupNorm(num_groups=self.groups)(h)
        h = jax.nn.silu(h)
        h = Conv(self.features, kernel=3)(h)
        h = nn.GroupNorm(num_groups=self.groups)(h)
        h = jax.nn.silu(h)
        if x.shape[-1] != self.features:
            x = Conv(self.features, kernel=1)(x)
        return x + h


class SSFHyperprior(nn.Module):
    """ELFVC/SSF hyperprior (models.py:1958-1999): stride-2 hyper transforms,
    separate mean / QReLU-scale decoders, STE quantization, optional SPnet
    super-precision predicting the unquantized latent from rounded latents.

    `q_prior`: previous frame's rounded latent (zeros for the first frame);
    returns it updated for scan chaining. `encode_z` / `params_from_z` are the
    standalone halves the real-bitstream path needs (decode recomputes
    (scales, means) from the entropy-decoded z).
    """

    planes: int = 192
    super_prec: bool = False
    sp_active: bool = False  # use predictor output as y_hat (spstage gating)
    use_context: bool = False  # ContextVP causal entropy-parameter refinement
    context_views: int = 1

    def setup(self):
        self.hyper_encoder = _HyperEncoder(self.planes)
        self.entropy_bottleneck = EntropyBottleneck(self.planes)
        self.hyper_decoder_scale = _HyperDecoderQReLU(self.planes)
        self.hyper_decoder_mean = _HyperDecoder(self.planes)
        if self.super_prec:
            self.y_predictor = SPnet(out_channels=self.planes)
        if self.use_context:
            from fvc.models.context_vp import ContextVP
            self.context_model = ContextVP(
                in_channels=self.planes, out_channels=2 * self.planes,
                num_views=self.context_views)

    def encode_z(self, y):
        return self.hyper_encoder(y)

    def params_from_z(self, z_hat):
        return self.hyper_decoder_scale(z_hat), self.hyper_decoder_mean(z_hat)

    def __call__(self, y, q_prior=None, *, training: bool, rng=None):
        r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
        z = self.hyper_encoder(y)
        z_hat, z_likelihood = self.entropy_bottleneck(z, training=training, rng=r1)
        scales, means = self.params_from_z(z_hat)
        if self.use_context:
            # Causal refinement of the CODING distribution only: the context
            # sees the rounded latent (shift-token => token t conditions on
            # tokens < t, so a decoder can reproduce it token-serially). The
            # symbols stay round(y - hyper_means) — quantization offset and
            # reconstruction are untouched, the context just reshapes the
            # probability those symbols are coded under (decode-consistent).
            from fvc.ops.math import gaussian_interval_likelihood, lower_bound

            y_round = jax.lax.stop_gradient(jnp.round(y - means) + means)
            delta = self.context_model(y_round)
            d_scale, d_mean = jnp.split(delta, 2, axis=-1)
            scales_c = jnp.maximum(scales + d_scale, 0.04)
            means_c = means + d_mean
            if training:
                if r2 is None:
                    raise ValueError("context hyperprior training needs rng")
                y_sym = y + jax.random.uniform(r2, y.shape, y.dtype, -0.5, 0.5)
            else:
                y_sym = y_round
            y_likelihood = lower_bound(
                gaussian_interval_likelihood(y_sym, scales_c, means_c), 1e-9)
        else:
            _, y_likelihood = gaussian_conditional(
                y, scales, means, training=training, rng=r2)
        y_hat = quantize_ste(y - means) + means
        q_y = jnp.round(y - means) + means
        q_err_y = q_y - y

        pred_err_y = None
        if self.super_prec:
            if q_prior is None:
                q_prior = jnp.zeros_like(y)
            round_y = jnp.round(y - means)
            pred = self.y_predictor(
                jnp.concatenate([round_y, q_prior], axis=-1))
            pred_y = pred + round_y + jax.lax.stop_gradient(means)
            pred_err_y = pred_y - jax.lax.stop_gradient(y)
            if self.sp_active:
                y_hat = jax.lax.stop_gradient(pred_y)
            q_prior = round_y
        return y_hat, {"y": y_likelihood, "z": z_likelihood,
                       "pred_err_y": pred_err_y, "Q_err_y": q_err_y,
                       "sigma": scales, "mu": means, "z_latent": z}, q_prior
