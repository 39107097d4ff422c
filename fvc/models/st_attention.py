"""Space-time attention stack for LSVC '-A'/'-S' variants.

Reference: DVC/subnet/basics.py:130-363 — 12 alternating [temporal-attention,
spatial-attention, GEGLU feed-forward] blocks over the latent grid, prenormed,
with rotary position embeddings: 1-D rotary over the frame axis for temporal
attention, axial (2-D) rotary over pixels for spatial attention. The token
layout treats the GOP's frames x pixels jointly; attention factorizes into
(frames at fixed pixel) and (pixels at fixed frame) — exactly the axes that
shard across devices (SURVEY §5 long-context note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rotary(x, freqs):
    """x: [..., n, d]; freqs: [n, d] angles."""
    return x * jnp.cos(freqs) + _rotate_half(x) * jnp.sin(freqs)


def rotary_freqs_1d(n: int, dim: int, dtype=jnp.float32):
    inv = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=dtype) / dim))
    t = jnp.arange(n, dtype=dtype)
    f = jnp.einsum("n,d->nd", t, inv)
    return jnp.tile(f, (1, 2))  # [n, dim]


def rotary_freqs_axial(h: int, w: int, dim: int, dtype=jnp.float32):
    """Half the head dim rotates with row position, half with column."""
    half = dim // 2
    fy = rotary_freqs_1d(h, half, dtype)   # [h, half]
    fx = rotary_freqs_1d(w, half, dtype)   # [w, half]
    fy = jnp.broadcast_to(fy[:, None, :], (h, w, half))
    fx = jnp.broadcast_to(fx[None, :, :], (h, w, half))
    return jnp.concatenate([fy, fx], axis=-1).reshape(h * w, dim)


class _MHA(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, freqs=None):
        """x: [batch, n, dim]; freqs: [n, dim_head] rotary angles or None."""
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = x.shape

        def split_heads(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        if freqs is not None:
            q = _apply_rotary(q, freqs)
            k = _apply_rotary(k, freqs)
        attn = jax.nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, hidden)
        return nn.Dense(self.dim)(out)


class _GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        a = nn.Dense(inner * 2)(x)
        a, gate = jnp.split(a, 2, axis=-1)
        return nn.Dense(self.dim)(a * jax.nn.gelu(gate))


class SpaceTimeAttentionBlock(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        """x: [F, H, W, C] — frames of one GOP at latent resolution."""
        F, H, W, C = x.shape
        t_freqs = rotary_freqs_1d(F, self.dim_head, x.dtype)
        s_freqs = rotary_freqs_axial(H, W, self.dim_head, x.dtype)

        # temporal: tokens = frames, batch = pixels
        t = x.reshape(F, H * W, C).transpose(1, 0, 2)  # [HW, F, C]
        t = t + _MHA(self.dim, self.heads, self.dim_head, name="t_attn")(
            nn.LayerNorm(name="t_norm")(t), t_freqs)
        x = t.transpose(1, 0, 2).reshape(F, H, W, C)

        # spatial: tokens = pixels, batch = frames
        s = x.reshape(F, H * W, C)
        s = s + _MHA(self.dim, self.heads, self.dim_head, name="s_attn")(
            nn.LayerNorm(name="s_norm")(s), s_freqs)
        x = s.reshape(F, H, W, C)

        f = x.reshape(F, H * W, C)
        f = f + _GEGLUFeedForward(self.dim, name="ff")(nn.LayerNorm(name="f_norm")(f))
        return f.reshape(F, H, W, C)


class SpaceTimeAttentionStack(nn.Module):
    dim: int
    depth: int = 12
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = SpaceTimeAttentionBlock(
                self.dim, self.heads, self.dim_head, name=f"block_{i}")(x)
        return x
