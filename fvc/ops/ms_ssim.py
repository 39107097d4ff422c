"""MS-SSIM metric/loss in pure JAX.

Implements the math specified by the reference's DVC/subnet/ms_ssim_torch.py:36-197
(and pytorch_msssim used at models.py:475-487): 11x11 Gaussian window sigma 1.5,
K=(0.01, 0.03), 5 scales with weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
2x avg-pool between scales, product of contrast-structure terms times the final
luminance term. Inputs NHWC in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5, dtype=jnp.float32):
    x = jnp.arange(size, dtype=dtype) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _filter2d_sep(x: jax.Array, k: jax.Array) -> jax.Array:
    """Depthwise separable valid-conv with the 1-D window along H then W."""
    C = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, C))
    y = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=C)
    return jax.lax.conv_general_dilated(y, kw, (1, 1), "VALID",
                                        dimension_numbers=dn, feature_group_count=C)


def _ssim_terms(x, y, k, data_range=1.0, K=(0.01, 0.03)):
    c1 = (K[0] * data_range) ** 2
    c2 = (K[1] * data_range) ** 2
    mu_x = _filter2d_sep(x, k)
    mu_y = _filter2d_sep(y, k)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter2d_sep(x * x, k) - mu_xx
    sigma_yy = _filter2d_sep(y * y, k) - mu_yy
    sigma_xy = _filter2d_sep(x * y, k) - mu_xy
    cs = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def _pad_reflect_pool(x):
    """avg_pool2d(2,2) with single-pixel reflect pad for odd sizes."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    win = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return win * 0.25


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-batch-element MS-SSIM. x, y: [B,H,W,C] in [0, data_range]."""
    k = _gaussian_window(dtype=x.dtype)
    levels = len(_WEIGHTS)
    weights = jnp.asarray(_WEIGHTS, x.dtype)
    mcs = []
    for i in range(levels):
        ssim_val, cs = _ssim_terms(x, y, k, data_range)
        if i < levels - 1:
            mcs.append(cs)
            x = _pad_reflect_pool(x)
            y = _pad_reflect_pool(y)
    # clamp at a small EPS, not 0: d/dx x**w at x=0 (0<w<1) is infinite, so
    # one contrast-structure term dipping <= 0 on a degraded model poisons
    # the whole gradient with NaN (observed: the M ladder's rollback loop on
    # the round-5 hard corpus). At eps=1e-6 the metric is unchanged for any
    # non-broken reconstruction (cs ~ 0.5+).
    mcs_stack = jnp.maximum(jnp.stack(mcs + [ssim_val], axis=0), 1e-6)
    return jnp.prod(mcs_stack ** weights[:, None], axis=0)


def ms_ssim_db(x: jax.Array, y: jax.Array) -> jax.Array:
    """-10 log10(1 - msssim), the reference's MS-SSIM "quality" (models.py:475-487)."""
    q = ms_ssim(x, y)
    return -10.0 * jnp.log(jnp.maximum(1.0 - q, 1e-12)) / jnp.log(10.0)


# ---------------------------------------------------------------------------
# Host-side float64 evaluation path.
#
# In f32 the metric saturates: near-perfect reconstructions give
# 1 - msssim ~ 1e-7, which is pure mantissa rounding noise, so the dB
# transform returns garbage in the 70+ dB range that jumps across adjacent
# rate points. Eval therefore computes the REPORTED metric on host in f64
# (resolution ~1e-16) and caps the dB transform where even f64 is noise.
# ---------------------------------------------------------------------------

def _conv_valid_np(x, k, axis):
    """np.convolve(..., 'valid') along one axis of a batched array,
    vectorized. Matches convolve's commutative semantics exactly: when the
    signal is SHORTER than the kernel (deep pyramid levels of small frames)
    the roles swap and the output has length k.size - L + 1."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    L = x.shape[axis]
    k = np.asarray(k, x.dtype)
    if k.size <= L:
        return sliding_window_view(x, k.size, axis=axis) @ k[::-1]
    w = sliding_window_view(k, L, axis=0)[:, ::-1]  # [K-L+1, L]
    xm = np.moveaxis(x, axis, -1)
    return np.moveaxis(xm @ w.T, -1, axis)


def _filt_np(x, k):
    """Separable 'valid' filter along H then W, vectorized with sliding
    windows (np.apply_along_axis ran a Python-level np.convolve per
    row/column — minutes per family-eval frame at 2048x1024)."""
    return _conv_valid_np(_conv_valid_np(x, k, 1), k, 2)


def _pool_np(x):
    import numpy as np

    _, h, w, _ = x.shape
    if h % 2 or w % 2:
        x = np.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    return 0.25 * (x[:, ::2, ::2] + x[:, 1::2, ::2]
                   + x[:, ::2, 1::2] + x[:, 1::2, 1::2])


def ms_ssim_np(x, y, data_range: float = 1.0):
    """float64 host MS-SSIM, same math as `ms_ssim`. x, y: [B,H,W,C]."""
    import numpy as np

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    size, sigma = 11, 1.5
    t = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(t ** 2) / (2.0 * sigma ** 2))
    k /= k.sum()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    weights = np.asarray(_WEIGHTS, np.float64)
    mcs = []
    for i in range(len(weights)):
        mu_x, mu_y = _filt_np(x, k), _filt_np(y, k)
        sxx = _filt_np(x * x, k) - mu_x * mu_x
        syy = _filt_np(y * y, k) - mu_y * mu_y
        sxy = _filt_np(x * y, k) - mu_x * mu_y
        cs = (2.0 * sxy + c2) / (sxx + syy + c2)
        ssim = ((2.0 * mu_x * mu_y + c1)
                / (mu_x * mu_x + mu_y * mu_y + c1)) * cs
        cs_m = np.maximum(cs.mean(axis=(1, 2, 3)), 0.0)
        ssim_m = np.maximum(ssim.mean(axis=(1, 2, 3)), 0.0)
        if i < len(weights) - 1:
            mcs.append(cs_m)
            x, y = _pool_np(x), _pool_np(y)
    stack = np.stack(mcs + [ssim_m], axis=0)  # [L, B]
    return np.prod(stack ** weights[:, None], axis=0)


def ms_ssim_db_np(x, y):
    """Host-f64 -10 log10(1 - msssim), capped at 1e-10 (100 dB) where the
    residual is numerically indistinguishable from zero."""
    import numpy as np

    q = ms_ssim_np(x, y)
    return -10.0 * np.log10(np.maximum(1.0 - q, 1e-10))
