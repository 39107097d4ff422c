"""Attention blocks used by SPnet and the multiview (MCVC) decoders.

Reference: super_precision.py:94-125. qkv via 1x1 convs; `SpatialAttention`
(atype=0) attends over one frame's pixels; `ViewAttention` (atype=2) attends
jointly across all camera views — the only cross-view op in MCVC, and therefore
the op that defines the cross-view collective when views are sharded
(SURVEY §2.5: all-gather over the view axis).

TPU shape discipline: tokens = pixels; everything is batched matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.ops.conv import Conv


class SpatialAttention(nn.Module):
    """Per-image attention: d = c-per-head token dim, sequence = H*W pixels."""

    dim: int
    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hidden = self.heads * self.dim_head
        qkv = Conv(hidden * 3, kernel=1, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [b,h,w,(H d)] -> [b, H, h*w, d]
            return t.reshape(b, h * w, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q = heads(q) * (self.dim_head ** -0.5)
        k = heads(k)
        v = heads(v)
        # NOTE the reference contracts over the *channel* dim with pixel-pairs
        # as the attention matrix (super_precision.py:117-120): sim[i,j] over
        # token dim d. Same as standard attention with tokens=pixels.
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, hidden)
        return Conv(self.dim, kernel=1)(out)


class ViewAttention(nn.Module):
    """Cross-view attention: batch is (b*views); tokens = views*H*W
    (super_precision.py:113 '(b v) (h c) x y -> b h c (v x y)')."""

    dim: int
    num_views: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        bv, h, w, _ = x.shape
        v_ = self.num_views
        b = bv // v_
        hidden = self.heads * self.dim_head
        qkv = Conv(hidden * 3, kernel=1, use_bias=False)(x)
        q, k, vv = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # [(b v),h,w,(H d)] -> [b, H, v*h*w, d]
            t = t.reshape(b, v_, h * w, self.heads, self.dim_head)
            return t.transpose(0, 3, 1, 2, 4).reshape(b, self.heads, v_ * h * w, self.dim_head)

        q = heads(q) * (self.dim_head ** -0.5)
        k = heads(k)
        vv = heads(vv)
        attn = jax.nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vv)
        out = out.reshape(b, self.heads, v_, h * w, self.dim_head)
        out = out.transpose(0, 2, 3, 1, 4).reshape(bv, h, w, hidden)
        return Conv(self.dim, kernel=1)(out)


class Residual(nn.Module):
    inner: nn.Module

    @nn.compact
    def __call__(self, x):
        return x + self.inner(x)
