"""Learned I-frame codec — a mean-scale hyperprior image codec.

Replaces the reference's BPG subprocess I-frame path (I_compression,
models.py:412-429) with a TPU-native learned intra codec (SURVEY §2.4: the
build supports both; the BPG binding lives in fvc.anchors). Architecture is the
SSF keyframe branch (img_encoder/img_decoder + hyperprior), which is also what
MCVC's forward_keyframe uses (models.py:2354-2364).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.entropy.hyperprior import SSFHyperprior
from fvc.ops.conv import Conv, Deconv
from fvc.ops.math import bits_from_likelihood, psnr


class SSFEncoder(nn.Module):
    """4x (k5 s2) conv + ReLU chain: in -> 128 -> 128 -> 128 -> out(192)."""

    mid: int = 128
    out: int = 192

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv(self.mid, kernel=5, stride=2)(x))
        x = jax.nn.relu(Conv(self.mid, kernel=5, stride=2)(x))
        x = jax.nn.relu(Conv(self.mid, kernel=5, stride=2)(x))
        return Conv(self.out, kernel=5, stride=2)(x)


class SSFDecoder(nn.Module):
    """4x deconv (k5, exact 2x) + ReLU chain: in -> 128^3 -> out."""

    mid: int = 128
    out: int = 3

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Deconv(self.mid, kernel=5)(x))
        x = jax.nn.relu(Deconv(self.mid, kernel=5)(x))
        x = jax.nn.relu(Deconv(self.mid, kernel=5)(x))
        return Deconv(self.out, kernel=5)(x)


class IFrameCodec(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x, *, training: bool, rng=None):
        y = SSFEncoder(out=self.planes, name="img_encoder")(x)
        y_hat, lk, _ = SSFHyperprior(self.planes, name="img_hyperprior")(
            y, None, training=training, rng=rng)
        x_hat = SSFDecoder(out=x.shape[-1], name="img_decoder")(y_hat)
        B, H, W, _ = x.shape
        bits = bits_from_likelihood(lk["y"]) + bits_from_likelihood(lk["z"])
        out = {
            "bpp_est": bits / float(H * W * B),
            "psnr": psnr(x, jnp.clip(x_hat, 0.0, 1.0)),
            "likelihoods": lk,
        }
        return jnp.clip(x_hat, 0.0, 1.0), out
