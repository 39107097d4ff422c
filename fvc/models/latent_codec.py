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

`analysis` / `synthesis` are standalone methods so the real-bitstream paths
(fvc.models.bitstream) can run encoder-only / decoder-only programs on device
around the host rANS coder — the compress_slow/decompress_slow split
(entropy_models.py:97-148) without per-stage host round-trips.

All recurrent state is explicit and scan-friendly.
"""

from __future__ import annotations

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

    def setup(self):
        C, k = self.channels, self.kernel
        self.enc_conv1 = Conv(C, kernel=k, stride=2)
        self.enc_conv2 = Conv(C, kernel=k, stride=2)
        self.enc_conv3 = Conv(C, kernel=k, stride=2)
        self.enc_conv4 = Conv(C, kernel=k, stride=2, use_bias=False)
        self.enc_gdn1 = GDN()
        self.enc_gdn2 = GDN()
        self.enc_gdn3 = GDN()
        self.dec_conv1 = Deconv(C, kernel=k)
        self.dec_conv2 = Deconv(C, kernel=k)
        self.dec_conv3 = Deconv(C, kernel=k)
        self.dec_conv4 = Deconv(self.in_features, kernel=k)
        self.dec_gdn1 = GDN(inverse=True)
        self.dec_gdn2 = GDN(inverse=True)
        self.dec_gdn3 = GDN(inverse=True)
        if self.recurrent:
            self.enc_lstm = ConvLSTM(C)
            self.dec_lstm = ConvLSTM(C)
        if self.entropy == "rpm":
            self.entropy_bottleneck = EntropyBottleneck(C)
            self.rpm_net = RPM(C)
        elif self.entropy == "rpm2":
            self.bit_estimator = BitEstimator(C)
            self.rpm_net = RPM(C)
        else:
            self.bit_estimator = BitEstimator(C)

    # ------------------------------------------------------------------
    # transform halves
    # ------------------------------------------------------------------

    def analysis(self, x, enc_state):
        y = self.enc_gdn1(self.enc_conv1(x))
        y = self.enc_gdn2(self.enc_conv2(y))
        if self.recurrent:
            y, enc_state = self.enc_lstm(y, enc_state)
        y = self.enc_gdn3(self.enc_conv3(y))
        return self.enc_conv4(y), enc_state

    def synthesis(self, latent_hat, dec_state):
        z = self.dec_gdn1(self.dec_conv1(latent_hat))
        z = self.dec_gdn2(self.dec_conv2(z))
        if self.recurrent:
            z, dec_state = self.dec_lstm(z, dec_state)
        z = self.dec_gdn3(self.dec_conv3(z))
        return self.dec_conv4(z), dec_state

    def factorized_cdf(self, x):
        """Evaluate the learned CDF F(x) (for host-side table building)."""
        return self.bit_estimator(x)

    def rpm_params(self, prior_latent, rpm_state):
        sigma_raw, mu, rpm_state = self.rpm_net(prior_latent, rpm_state)
        return rpm_scale(sigma_raw), mu, rpm_state

    # ------------------------------------------------------------------
    # full forward (training / estimate mode)
    # ------------------------------------------------------------------

    def __call__(self, x, state: CoderState, rpm_flag, *, training: bool, rng=None):
        enc_state, dec_state = jnp.split(state.rae, 2, axis=-1)
        latent, enc_state = self.analysis(x, enc_state)

        rngs = jax.random.split(rng, 2) if rng is not None else (None, None)
        if self.entropy == "rpm":
            latent_eb, p_eb = self.entropy_bottleneck(
                latent, training=training, rng=rngs[0])
            sigma, mu, rpm_state = self.rpm_params(state.prior_latent, state.rpm)
            latent_g, p_g = gaussian_conditional(
                latent, sigma, mu, training=training, rng=rngs[1])
            latent_hat = _select(rpm_flag, latent_g, latent_eb)
            likelihood = _select(rpm_flag, p_g, p_eb)
            new_rpm = _select(rpm_flag, rpm_state, state.rpm)
            aux = {"sigma": sigma, "mu": mu}
        elif self.entropy == "rpm2":
            latent_hat = quantize(latent, training, rngs[0])
            p_fac = self.factorized_cdf(latent_hat + 0.5) - \
                self.factorized_cdf(latent_hat - 0.5)
            sigma, _mu, rpm_state = self.rpm_params(state.prior_latent, state.rpm)
            # reference forces mu = 0 (models.py:616-620)
            p_rpm = laplace_interval_likelihood(latent_hat, sigma)
            likelihood = _select(rpm_flag, p_rpm, p_fac)
            new_rpm = _select(rpm_flag, rpm_state, state.rpm)
            aux = {"sigma": sigma}
        else:  # factorized
            latent_hat = quantize(latent, training, rngs[0])
            likelihood = self.factorized_cdf(latent_hat + 0.5) - \
                self.factorized_cdf(latent_hat - 0.5)
            new_rpm = state.rpm
            aux = {}

        prior_latent = jax.lax.stop_gradient(jnp.round(latent))
        bits_est = bits_from_likelihood(likelihood)

        hat, dec_state = self.synthesis(latent_hat, dec_state)

        new_state = CoderState(
            rae=jax.lax.stop_gradient(jnp.concatenate([enc_state, dec_state], axis=-1)),
            rpm=jax.lax.stop_gradient(new_rpm),
            prior_latent=prior_latent,
        )
        out = {"bits_est": bits_est, "likelihood": likelihood,
               "latent": latent, "latent_hat": latent_hat, **aux}
        return hat, new_state, out


def _select(flag, a, b):
    """where(flag, a, b) for traced scalar flags over arrays."""
    return jnp.where(flag, a, b)
