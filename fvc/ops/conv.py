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


# ---------------------------------------------------------------------------
# Space-to-depth packed convolution (MXU-utilization transform)
#
# A stride-1 k x k conv with tiny channel counts (SpyNet's 7x7 stacks: 8..64
# channels) wastes most of the 128x128 MXU tile. Packing r x r spatial phases
# into channels ([B,H,W,C] -> [B,H/r,W/r,r²C]) turns it into an EXACTLY
# equivalent conv with r²-times the channels at 1/r² the positions — measured
# 1.7-2.1x faster for the MEBasic shapes on v5e despite the (k'² r²)/(k² )
# structural-zero FLOP overhead.
# ---------------------------------------------------------------------------

def space_to_depth(x, r: int = 2):
    """[B,H,W,C] -> [B,H/r,W/r,r*r*C]; packed channel index = (c*r+d)*C + ci
    for spatial phase (c, d)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // r, W // r, r * r * C)


def depth_to_space(x, r: int = 2):
    B, H, W, Cp = x.shape
    C = Cp // (r * r)
    x = x.reshape(B, H, W, r, r, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H * r, W * r, C)


def _s2d_indices(k: int, r: int):
    """Static index/mask arrays mapping canonical [k,k,ci,co] weights onto the
    packed kernel. Returns (P, p_min, u_idx[P,r,r], mask[P,r,r]) for one axis:
    packed tap p uses canonical tap u = r*(p+p_min) + c - a + k//2 for input
    phase c and output phase a (zero where out of range)."""
    import numpy as np

    pad = k // 2
    p_min = -((pad + r - 1) // r)
    p_max = (r - 1 + k - 1 - pad) // r
    P = p_max - p_min + 1
    ps = np.arange(p_min, p_max + 1)[:, None, None]
    cs = np.arange(r)[None, :, None]   # input phase
    aa = np.arange(r)[None, None, :]   # output phase
    u = r * ps + cs - aa + pad
    mask = (u >= 0) & (u < k)
    return P, p_min, np.clip(u, 0, k - 1), mask


def pack_s2d_weights(w, r: int = 2):
    """Canonical HWIO [k,k,ci,co] -> packed [P,P,r²ci,r²co] (+ the conv padding
    tuple). Pure gather+mask, so gradients flow back to the canonical weight."""
    k = w.shape[0]
    ci, co = w.shape[2], w.shape[3]
    P, p_min, u_idx, u_mask = _s2d_indices(k, r)

    # [P,c,a,k,ci,co] -> take along canonical u; then along canonical v
    wu = jnp.take(w, jnp.asarray(u_idx.reshape(-1)), axis=0).reshape(
        P, r, r, k, ci, co)
    wu = wu * jnp.asarray(u_mask, w.dtype)[..., None, None, None]
    # now take along the v (second canonical) axis -> [P,c,a,Q,d,b,ci,co]
    wv = jnp.take(wu, jnp.asarray(u_idx.reshape(-1)), axis=3).reshape(
        P, r, r, P, r, r, ci, co)
    wv = wv * jnp.asarray(u_mask, w.dtype)[None, None, None, ..., None, None]
    # target layout: [P, Q, (c,d,ci), (a,b,co)]
    wp = wv.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(
        P, P, r * r * ci, r * r * co)
    pad = (-p_min, P - 1 + p_min)
    return wp, pad


class Conv(nn.Module):
    """Stride-s conv, SAME padding for odd kernels at stride 1; for stride 2 the
    PyTorch padding=k//2 geometry (out = ceil(in/2)) is used.

    `zero_init` zero-initializes the kernel — used for final projection convs
    of refinement nets (WarpNet, MEBasic, GenNet) so a fresh model starts as
    an identity refinement: the reference's xavier init makes the fresh-init
    motion-compensation output swamp the warped frame (mc_loss >> warp_loss),
    a training-stability hazard the TPU build removes.

    `s2d=r`: the input is space_to_depth(r)-packed; parameters keep their
    canonical [k,k,cin,cout] shape (checkpoint- and .npy-loader-compatible)
    and are repacked on the fly (stride 1 only)."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    zero_init: bool = False
    s2d: int = 1

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.variance_scaling(1.0, "fan_avg", "uniform"))
        r = self.s2d
        cin = x.shape[-1] if r == 1 else x.shape[-1] // (r * r)
        w = self.param(
            "kernel", init, (self.kernel, self.kernel, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        if r == 1:
            return conv2d(x, w, b, stride=self.stride, padding=p)
        assert self.stride == 1, "s2d packing supports stride 1 only"
        wp, pad = pack_s2d_weights(w, r)
        bp = jnp.tile(b, r * r) if b is not None else None
        return conv2d(x, wp, bp, stride=1, padding=(pad, pad))


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
