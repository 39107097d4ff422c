"""Convolution wrappers (NHWC) with exact geometry control.

The reference's encoders use stride-2 convs with SAME-style odd kernels and its
decoders use ConvTranspose2d(k, s=2, p=k//2, output_padding=1) which produce an
exact 2x upsample (models.py:526-547). Here the transposed conv is expressed as
an input-dilated convolution (lhs_dilation) so XLA lowers it onto the MXU as a
regular convolution — the idiomatic TPU formulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

# NHWC activations, HWIO weights.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def _operands(x, w):
    """Apply the active precision policy: bf16 operands and bf16-native output
    (the TPU MXU accumulates bf16 contractions in f32 internally, so this is
    the standard mixed-precision recipe; forcing preferred_element_type=f32
    instead breaks the conv transpose rule under autodiff with mixed dtypes).
    Without a policy, convs run f32 with explicit f32 accumulation."""
    from fvc.core.policy import compute_dtype

    dt = compute_dtype()
    if dt is not None:
        return x.astype(dt), w.astype(dt), dt
    return x, w, None


def conv2d(x, w, b=None, *, stride: int = 1, padding="SAME"):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    x, w, dt = _operands(x, w)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=dt if dt is not None else jnp.float32,
    )
    if b is not None:
        y = y + (b.astype(dt) if dt is not None else b)
    return y


def deconv2d_x2(x, w, b=None, *, kernel: int):
    """Exact-2x transposed conv: PyTorch ConvTranspose2d(k, 2, k//2, output_padding=1)
    geometry, expressed as lhs-dilated conv. out = 2 * in for any input size."""
    p = kernel // 2
    lo = kernel - 1 - p
    hi = kernel - 1 - p + 1  # output_padding = 1
    x, w, dt = _operands(x, w)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        lhs_dilation=(2, 2), dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=dt if dt is not None else jnp.float32,
    )
    if b is not None:
        y = y + (b.astype(dt) if dt is not None else b)
    return y


class Conv(nn.Module):
    """Stride-s conv, SAME padding for odd kernels at stride 1; for stride 2 the
    PyTorch padding=k//2 geometry (out = ceil(in/2)) is used.

    `zero_init` zero-initializes the kernel — used for final projection convs
    of refinement nets (WarpNet, MEBasic, GenNet) so a fresh model starts as
    an identity refinement: the reference's xavier init makes the fresh-init
    motion-compensation output swamp the warped frame (mc_loss >> warp_loss),
    a training-stability hazard the TPU build removes."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"))
        w = self.param(
            "kernel", init,
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return conv2d(x, w, b, stride=self.stride, padding=p)


class Deconv(nn.Module):
    """Exact-2x learned upsampler (transposed-conv geometry)."""

    features: int
    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"),
            (self.kernel, self.kernel, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return deconv2d_x2(x, w, b, kernel=self.kernel)
