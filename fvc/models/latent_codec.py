"""LatentCodec — the TPU-native Coder2D (models.py:520-681).

4x stride-2 conv+GDN analysis / mirrored deconv+IGDN synthesis over an input
(motion field or residual), optional ConvLSTM recurrence after the 2nd conv on
both sides (RLVC mode), and three entropy modes:

- 'factorized': BitEstimator interval likelihood on every frame (DVC mode).
- 'rpm2':       RLVC2 — BitEstimator on non-RPM frames; Laplace(0, exp(max(s,-7))/10)
                with sigma from the RPM net on RPM frames (models.py:608-630).
- 'rpm':        RLVC — factorized EntropyBottleneck on frame 1, Gaussian
                conditional with RPM-derived (sigma, mu) afterwards
                (entropy_models.py:54-69).

All recurrent state is explicit and scan-friendly. Bits are estimated with the
reference's clamp estimator; real coding goes through fvc.entropy.coder.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from fvc.entropy.bitparm import BitEstimator
from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.gaussian import gaussian_conditional
from fvc.entropy.rpm import RPM, rpm_scale
from fvc.ops.conv import Conv, Deconv
from fvc.ops.convlstm import ConvLSTM
from fvc.ops.gdn import GDN
from fvc.ops.math import bits_from_likelihood, laplace_interval_likelihood, quantize


@struct.dataclass
class CoderState:
    """Recurrent state for one LatentCodec instance."""

    rae: jax.Array          # [B, H/4, W/4, 4C] cat(enc_c, enc_h, dec_c, dec_h)
    rpm: jax.Array          # [B, H/16, W/16, 2C]
    prior_latent: jax.Array  # [B, H/16, W/16, C] previous rounded latent

    @staticmethod
    def zeros(batch: int, h: int, w: int, channels: int, dtype=jnp.float32):
        return CoderState(
            rae=jnp.zeros((batch, h // 4, w // 4, 4 * channels), dtype),
            rpm=jnp.zeros((batch, h // 16, w // 16, 2 * channels), dtype),
            prior_latent=jnp.zeros((batch, h // 16, w // 16, channels), dtype),
        )


class LatentCodec(nn.Module):
    in_features: int
    channels: int = 128
    kernel: int = 3
    recurrent: bool = False
    entropy: str = "factorized"  # 'factorized' | 'rpm' | 'rpm2'

    @nn.compact
    def __call__(self, x, state: CoderState, rpm_flag, *, training: bool, rng=None):
        """Returns (hat, new_state, out) where out carries bits_est/likelihood.
        rpm_flag may be a traced bool (scan step > 0)."""
        C = self.channels
        k = self.kernel

        # ----- analysis -----
        enc_state, dec_state = jnp.split(state.rae, 2, axis=-1)
        y = GDN()(Conv(C, kernel=k, stride=2)(x))
        y = GDN()(Conv(C, kernel=k, stride=2)(y))
        if self.recurrent:
            y, enc_state = ConvLSTM(C, name="enc_lstm")(y, enc_state)
        y = GDN()(Conv(C, kernel=k, stride=2)(y))
        latent = Conv(C, kernel=k, stride=2, use_bias=False)(y)

        # ----- quantization + likelihood -----
        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        if self.entropy == "rpm":
            # RLVC: EB on first P-frame, RPM Gaussian afterwards. Both branches
            # are traced; lax.cond selects at runtime (scan-compatible).
            eb = EntropyBottleneck(C, name="entropy_bottleneck")
            rpm_net = RPM(C, name="rpm")
            latent_eb, p_eb = eb(latent, training=training, rng=rngs[0])
            sigma_raw, mu, rpm_state = rpm_net(state.prior_latent, state.rpm)
            sigma = rpm_scale(sigma_raw)
            latent_g, p_g = gaussian_conditional(
                latent, sigma, mu, training=training, rng=rngs[1])
            latent_hat = _select(rpm_flag, latent_g, latent_eb)
            likelihood = _select(rpm_flag, p_g, p_eb)
            new_rpm = _select(rpm_flag, rpm_state, state.rpm)
            aux = {"sigma": sigma, "mu": mu}
        elif self.entropy == "rpm2":
            be = BitEstimator(C, name="bit_estimator")
            rpm_net = RPM(C, name="rpm")
            latent_hat = quantize(latent, training, rngs[0])
            p_fac = _bitparm_likelihood(be, latent_hat)
            sigma_raw, _mu_unused, rpm_state = rpm_net(state.prior_latent, state.rpm)
            sigma = rpm_scale(sigma_raw)
            # reference forces mu = 0 (models.py:616-620)
            p_rpm = laplace_interval_likelihood(latent_hat, sigma)
            likelihood = _select(rpm_flag, p_rpm, p_fac)
            new_rpm = _select(rpm_flag, rpm_state, state.rpm)
            aux = {"sigma": sigma}
        else:  # factorized
            be = BitEstimator(C, name="bit_estimator")
            latent_hat = quantize(latent, training, rngs[0])
            likelihood = _bitparm_likelihood(be, latent_hat)
            new_rpm = state.rpm
            aux = {}

        prior_latent = jax.lax.stop_gradient(jnp.round(latent))
        bits_est = bits_from_likelihood(likelihood)

        # ----- synthesis -----
        z = GDN(inverse=True)(Deconv(C, kernel=k)(latent_hat))
        z = GDN(inverse=True)(Deconv(C, kernel=k)(z))
        if self.recurrent:
            z, dec_state = ConvLSTM(C, name="dec_lstm")(z, dec_state)
        z = GDN(inverse=True)(Deconv(C, kernel=k)(z))
        hat = Deconv(self.in_features, kernel=k)(z)

        new_state = CoderState(
            rae=jax.lax.stop_gradient(jnp.concatenate([enc_state, dec_state], axis=-1)),
            rpm=jax.lax.stop_gradient(new_rpm),
            prior_latent=prior_latent,
        )
        out = {"bits_est": bits_est, "likelihood": likelihood,
               "latent": latent, "latent_hat": latent_hat, **aux}
        return hat, new_state, out


def _bitparm_likelihood(be: BitEstimator, latent_hat):
    return be(latent_hat + 0.5) - be(latent_hat - 0.5)


def _select(flag, a, b):
    """where(flag, a, b) for traced scalar flags over pytree-shaped arrays."""
    return jnp.where(flag, a, b)
