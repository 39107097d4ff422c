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
    both align_corners conventions. Integer upscale factors with
    align_corners=False take the gather-free shift+interleave path
    (_axis_upsample_k, the TPU-fast formulation); everything else is the
    general separable gather+lerp."""
    _, h, w, _ = x.shape
    if (not align_corners and out_h % h == 0 and out_w % w == 0
            and (out_h > h or out_w > w)):
        if out_h > h:
            x = _axis_upsample_k(x, 1, out_h // h, False)
        if out_w > w:
            x = _axis_upsample_k(x, 2, out_w // w, False)
        return x
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


def _axis_upsample_k(x: jax.Array, axis: int, k: int,
                     align_corners: bool) -> jax.Array:
    """Exact integer-factor linear upsample along `axis` WITHOUT gathers.

    TPU note: XLA lowers jnp.take to a gather that runs ~6-10x below HBM
    bandwidth on v5e (measured scripts/microbench_up2.py: 11 ms for one
    640x960x64 2x upsample vs ~2 ms for shift+select). For a fixed integer
    ratio k the source row of output j is always j//k + d with d in {-1, 0}
    (align_corners=False: pos = (j+.5)/k - .5 deviates from j//k by at most
    .5 - .5/k; align_corners=True at k=2: pos = j(n-1)/(2n-1) in
    [j/2 - .5, j/2]), so the lerp operands are just edge-padded shifts of x
    selected by a static per-phase mask — pure streaming ops XLA fuses —
    followed by a k-phase interleave (one relayout).
    """
    assert k == 2 or not align_corners, "align_corners path only needs k=2"
    n = x.shape[axis]
    m = k * n
    # numpy twin of _linear_weights (static shapes; jit-safe constants) —
    # computed in float32 to match the jnp path (and torch) bit-for-bit
    if align_corners and m > 1:
        pos = np.arange(m, dtype=np.float32) * np.float32((n - 1) / (m - 1))
    else:
        pos = np.clip(
            (np.arange(m, dtype=np.float32) + np.float32(0.5))
            * np.float32(n / m) - np.float32(0.5),
            np.float32(0.0), np.float32(n - 1)).astype(np.float32)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    frac = (pos - lo).astype(np.float32)
    d = lo - np.arange(m) // k
    assert d.min() >= -1 and d.max() <= 0, "upsample window exceeded"

    def shift(v, delta):
        # v[i] -> v[clip(i+delta)]: edge-replicated static shift along axis
        if delta == 0:
            return v
        if delta == -1:
            head = jax.lax.slice_in_dim(v, 0, 1, axis=axis)
            body = jax.lax.slice_in_dim(v, 0, n - 1, axis=axis)
            return jnp.concatenate([head, body], axis=axis)
        body = jax.lax.slice_in_dim(v, 1, n, axis=axis)
        tail = jax.lax.slice_in_dim(v, n - 1, n, axis=axis)
        return jnp.concatenate([body, tail], axis=axis)

    x_m1 = shift(x, -1)
    x_p1 = shift(x, +1)

    def bshape(arr):
        sh = [1] * x.ndim
        sh[axis] = n
        return jnp.asarray(arr).reshape(sh)

    phases = []
    for p in range(k):
        dp = d[p::k]
        fp = frac[p::k].astype(np.float32)
        mask = bshape(dp == -1)
        lo_val = jnp.where(mask, x_m1, x)
        hi_val = jnp.where(mask, x, x_p1)
        f = bshape(fp).astype(x.dtype)
        phases.append(lo_val + (hi_val - lo_val) * f)
    y = jnp.stack(phases, axis=axis + 1)  # [.., n, k, ..]
    sh = list(x.shape)
    sh[axis] = m
    return y.reshape(sh)


def upsample2x(x: jax.Array, *, align_corners: bool = False) -> jax.Array:
    """2x bilinear upsample (`bilinearupsacling` / `bilinearupsacling2`),
    matching torch F.interpolate bit-for-bit in both conventions (tested
    against the take-based `bilinear_resize`, itself torch-golden)."""
    y = _axis_upsample_k(x, 1, 2, align_corners)
    return _axis_upsample_k(y, 2, 2, align_corners)
