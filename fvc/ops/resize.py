"""Pooling / bilinear resize ops with exact PyTorch-interpolate semantics.

The reference codec mixes both align_corners conventions (SURVEY §7 "hard parts"):
- `bilinearupsacling`  = F.interpolate(..., 'bilinear')                # align_corners=False, models.py:754-759
- `bilinearupsacling2` = F.interpolate(..., 'bilinear', align_corners=True)  # models.py:760-765
- avg_pool2d(2,2) in the SpyNet pyramid (models.py:873-875) and Warp_net.

All ops are NHWC and resolution-static (shapes known at trace time).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2 (floor semantics for odd sizes).
    Dtype-preserving (bf16 stays bf16 under the activation policy)."""
    zero = np.zeros((), np.dtype(x.dtype))[()]
    return jax.lax.reduce_window(
        x, zero, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID") * jnp.asarray(0.25, x.dtype)


def _linear_weights(out_size: int, in_size: int, align_corners: bool):
    if align_corners and out_size > 1:
        pos = jnp.arange(out_size, dtype=jnp.float32) * (
            (in_size - 1) / max(out_size - 1, 1)
        )
    else:
        scale = in_size / out_size
        pos = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        pos = jnp.clip(pos, 0.0, in_size - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = pos - lo.astype(jnp.float32)
    return lo, hi, frac


def bilinear_resize(x: jax.Array, out_h: int, out_w: int, *, align_corners: bool) -> jax.Array:
    """Bilinear resize matching torch.nn.functional.interpolate bit-for-bit in
    both align_corners conventions. Separable: gather+lerp per axis."""
    _, h, w, _ = x.shape
    lo_h, hi_h, fh = _linear_weights(out_h, h, align_corners)
    lo_w, hi_w, fw = _linear_weights(out_w, w, align_corners)
    # lerp weights ride the activation dtype so bf16 streams stay bf16
    fh = fh.astype(x.dtype)
    fw = fw.astype(x.dtype)
    # rows
    top = jnp.take(x, lo_h, axis=1)
    bot = jnp.take(x, hi_h, axis=1)
    rows = top + (bot - top) * fh[None, :, None, None]
    # cols
    left = jnp.take(rows, lo_w, axis=2)
    right = jnp.take(rows, hi_w, axis=2)
    return left + (right - left) * fw[None, None, :, None]


def upsample2x(x: jax.Array, *, align_corners: bool = False) -> jax.Array:
    """2x bilinear upsample (`bilinearupsacling` / `bilinearupsacling2`)."""
    _, h, w, _ = x.shape
    return bilinear_resize(x, 2 * h, 2 * w, align_corners=align_corners)
