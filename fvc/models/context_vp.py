"""VPCT / ContextVP — GPT-style causal context model over view x H x W token
grids (super_precision.py:250-444). Present in the reference as a candidate
autoregressive entropy-context model (not wired into any codec); provided here
with the same contract so it can back a context-conditioned entropy stage.

Shift-token trick: outputs are shifted right by one with a learned start token
so position t's prediction conditions only on tokens < t (entroformer-style) —
making the logits usable as causal entropy parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

GPT_CONFIGS = {
    "gpt-nano": dict(n_layer=3, n_head=3, n_embd=48),
    "gpt-micro": dict(n_layer=4, n_head=4, n_embd=128),
    "gpt-mini": dict(n_layer=7, n_head=12, n_embd=384),
}


class CausalSelfAttention(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        qkv = nn.Dense(3 * self.n_embd)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hs = self.n_embd // self.n_head

        def heads(t):
            return t.reshape(B, T, self.n_head, hs).transpose(0, 2, 1, 3)

        q, k, v = map(heads, (q, k, v))
        att = jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(float(hs))
        mask = jnp.tril(jnp.ones((T, T), bool))
        att = jnp.where(mask[None, None], att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhij,bhjd->bhid", att, v)
        y = y.transpose(0, 2, 1, 3).reshape(B, T, self.n_embd)
        return nn.Dense(self.n_embd)(y)


class Block(nn.Module):
    n_embd: int
    n_head: int

    @nn.compact
    def __call__(self, x):
        x = x + CausalSelfAttention(self.n_embd, self.n_head)(nn.LayerNorm()(x))
        h = nn.Dense(4 * self.n_embd)(nn.LayerNorm()(x))
        h = nn.gelu(h)
        return x + nn.Dense(self.n_embd)(h)


class VPCT(nn.Module):
    """Causal transformer over [B, T, vocab] continuous tokens; returns
    shift-by-one logits [B, T, out_size]."""

    vocab_size: int
    block_size: int
    out_size: int
    model_type: str = "gpt-nano"

    @nn.compact
    def __call__(self, idx):
        cfg = GPT_CONFIGS[self.model_type]
        B, T, _ = idx.shape
        tok = nn.Dense(cfg["n_embd"], name="wte")(idx)
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (self.block_size, cfg["n_embd"]))
        x = tok + wpe[None, :T]
        for i in range(cfg["n_layer"]):
            x = Block(cfg["n_embd"], cfg["n_head"], name=f"h_{i}")(x)
        x = nn.LayerNorm(name="ln_f")(x)
        logits = nn.Dense(self.out_size, use_bias=False, name="lm_head")(x)
        start = self.param("param_token", nn.initializers.normal(1.0),
                           (1, 1, self.out_size))
        return jnp.concatenate(
            [jnp.broadcast_to(start, (B, 1, self.out_size)), logits[:, :-1]],
            axis=1)


class ContextVP(nn.Module):
    """Wrap VPCT over a [(B*V), H, W, C] latent grid: tokens = v*h*w raster
    order, causal across the whole multiview grid."""

    in_channels: int
    out_channels: int
    num_views: int = 4
    width: int = 16
    height: int = 16
    model_type: str = "gpt-nano"

    @nn.compact
    def __call__(self, x):
        bv, h, w, c = x.shape
        v = self.num_views
        b = bv // v
        tokens = x.reshape(b, v * h * w, c)
        # block_size (positional table) follows the actual grid; the `width`/
        # `height` fields are defaults used only for shape-free construction
        out = VPCT(self.in_channels, v * h * w,
                   self.out_channels, self.model_type)(tokens)
        return out.reshape(b * v, h, w, self.out_channels)
