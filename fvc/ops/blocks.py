"""Shared residual blocks and the motion-compensation refinement net.

- ResBlock: pre-activation 2-conv residual block (models.py:771-794)
- WarpNet:  U-shaped MC refinement net (Warp_net, models.py:796-830): 3 scales,
  avg-pool down / bilinear(align_corners=True) up with additive skips.
- motion_compensation: warp + refine glue (models.py:889-893).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.ops.conv import Conv
from fvc.ops.resize import avg_pool2, upsample2x
from fvc.ops.warp import flow_warp


class ResBlock(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        from fvc.core.policy import compute_dtype, pallas_warpnet_enabled

        if (pallas_warpnet_enabled() and not self.is_initializing()
                and self.kernel == 3 and x.shape[-1] == self.features):
            # fused two-conv VMEM-resident kernel (exact incl. borders) —
            # the E-MC occupancy fix, fvc/ops/pallas_warpnet.py
            from fvc.ops.pallas_warpnet import fused_resblock

            dt = compute_dtype()
            return fused_resblock(
                x, self.variables["params"],
                compute_dtype=dt).astype(dt or x.dtype)
        y = jax.nn.relu(x)
        y = Conv(self.features, kernel=self.kernel)(y)
        y = jax.nn.relu(y)
        y = Conv(self.features, kernel=self.kernel)(y)
        if x.shape[-1] != self.features:
            x = Conv(self.features, kernel=1)(x)
        # shortcut follows the conv-path dtype (keeps bf16 streams bf16)
        return x.astype(y.dtype) + y


class WarpNet(nn.Module):
    """MC refinement: input cat(warped, ref) [B,H,W,6] -> residual [B,H,W,3]."""

    channels: int = 64
    out_features: int = 3

    @nn.compact
    def __call__(self, x):
        f = jax.nn.relu(Conv(self.channels, kernel=3)(x))
        c0 = ResBlock(self.channels)(f)
        c1 = ResBlock(self.channels)(avg_pool2(c0))
        c2 = ResBlock(self.channels)(avg_pool2(c1))
        c3 = ResBlock(self.channels)(c2)
        c3u = c1 + upsample2x(c3, align_corners=True)
        c4 = ResBlock(self.channels)(c3u)
        c4u = c0 + upsample2x(c4, align_corners=True)
        c5 = ResBlock(self.channels)(c4u)
        # zero-init: MC starts exactly at the warped frame (see Conv.zero_init)
        return Conv(self.out_features, kernel=3, zero_init=True)(c5)


def motion_compensation(warpnet_apply, ref, mv):
    """warped = warp(ref, mv); MC = warpnet(cat(warped, ref)) + warped."""
    warped = flow_warp(ref, mv)
    refined = warpnet_apply(jnp.concatenate([warped, ref], axis=-1))
    return refined + warped, warped
