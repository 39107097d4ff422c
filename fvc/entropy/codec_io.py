"""Real-bitstream helpers: CDF-table construction for every entropy model the
codecs use, plus latent encode/decode glue.

This is the host half of the TPU real-coding design (SURVEY §7 hard-part 1):
the device computes rounded latents and entropy parameters under XLA; one D2H
transfer hands (symbols, cdf indexes) to the C++ rANS coder.

Table builders:
- `bitparm_cdf_tables`: per-channel CDFs from a learned BitEstimator
  (the torchac getrealbits path, models.py:1249-1299, mxrange=150 -> here a
  per-channel adaptive range).
- `laplace_cdf_tables`: scale-indexed Laplace(0, sigma) tables for the LSVC
  residual path (feature_probs_based_sigma, models.py:1216-1245).
- `gaussian_cdf_tables` (fvc.entropy.gaussian): scale-indexed N(mu, sigma)
  tables for hyperprior/RPM paths.
"""

from __future__ import annotations

import math
import numpy as np

from fvc.entropy.coder import RansCoder, pmf_to_quantized_cdf
from fvc.entropy.gaussian import SCALES_LEVELS, scale_table


def bitparm_cdf_tables(cdf_fn, channels: int, mxrange: int = 150,
                       tail_mass: float = 1e-6,
                       support_eps: float = 1e-8) -> RansCoder:
    """Build per-channel quantized CDFs from a learned CDF network.

    cdf_fn(x: np.ndarray[batch-of-values, ..., channels]) -> F(x) in [0,1].
    Evaluates F on the integer grid [-mxrange, mxrange] (models.py:1177),
    TRIMS each channel's table to its effective support (pmf > support_eps)
    and quantizes interval masses; symbols outside the trimmed range ride
    the coder's bypass escape.

    The trim is the difference between est and actual bits at low rates:
    with the full 2*mxrange+1 grid every ~zero symbol still gets the
    16-bit coder's minimum freq of 1, stealing ~(2*mxrange)/2^16 ~ 0.5% of
    probability mass from the peak — ~0.005 bits/symbol across tens of
    thousands of almost-always-zero latents (+18% measured on a 0.045 bpp
    DVC stream).

    DETERMINISM INVARIANT: encoder and decoder MUST rebuild these tables
    from bit-identical cdf_fn evaluations (same params, same backend /
    precision) — the whole table layout (lo/hi window AND quantized freqs)
    derives from them, and any divergence desyncs the stream. To keep the
    table pipeline itself deterministic given identical cdf_fn outputs, the
    pmf is computed in float64 and snapped to a 2^-30 grid before the
    support test and quantization, so no downstream float wobble can flip
    a grid point at the support_eps threshold.
    """
    import jax.numpy as jnp

    grid = np.arange(-mxrange, mxrange + 1, dtype=np.float32)
    # evaluate F at k +/- 0.5 for all channels at once: [G, C]
    xs = np.broadcast_to(grid[:, None], (grid.size, channels)).copy()
    upper = np.asarray(cdf_fn(jnp.asarray(xs + 0.5)), np.float64)
    lower = np.asarray(cdf_fn(jnp.asarray(xs - 0.5)), np.float64)
    pmf = np.clip(upper - lower, 0.0, 1.0)  # [G, C]
    pmf = np.round(pmf * (1 << 30)) / float(1 << 30)
    L = grid.size
    center = mxrange  # grid index of symbol 0
    los = np.zeros(channels, np.int64)
    his = np.zeros(channels, np.int64)
    for c in range(channels):
        keep = np.flatnonzero(pmf[:, c] > support_eps)
        if keep.size == 0:
            los[c] = his[c] = center
        else:
            los[c], his[c] = keep[0], keep[-1]
    widths = his - los + 1
    Lmax = int(widths.max())
    cdf = np.zeros((channels, Lmax + 2), np.int32)
    for c in range(channels):
        lo, hi = int(los[c]), int(his[c])
        seg = pmf[lo: hi + 1, c]
        # all mass outside the trimmed window (incl. beyond +/-mxrange)
        tail = max(float(1.0 - seg.sum()), tail_mass)
        w = hi - lo + 1
        cdf[c, : w + 2] = pmf_to_quantized_cdf(seg, tail)
    lengths = (widths + 2).astype(np.int32)
    offsets = (los - mxrange).astype(np.int32)
    return RansCoder(cdf, lengths, offsets)


def laplace_cdf_tables(tail_mass: float = 1e-9) -> RansCoder:
    """Scale-indexed Laplace(0, s) tables over the reference scale ladder."""
    scales = scale_table()
    # Laplace sf(x) = 0.5 * exp(-x/s) for x >= 0
    multiplier = -math.log(tail_mass)  # x s.t. sf ~ tail/2
    centers = np.ceil(scales * multiplier).astype(np.int32)
    max_len = int(2 * centers.max() + 1)
    cdf = np.zeros((SCALES_LEVELS, max_len + 2), np.int32)
    lengths = np.zeros(SCALES_LEVELS, np.int32)
    offsets = np.zeros(SCALES_LEVELS, np.int32)
    for i, s in enumerate(scales):
        c = int(centers[i])
        xs = np.arange(-c, c + 1, dtype=np.float64)
        a = np.abs(xs)
        # interval mass under Laplace(0, s)
        p_tail = 0.5 * np.exp(-(a - 0.5) / s) * (1.0 - np.exp(-1.0 / s))
        p_center = 1.0 - np.exp(-0.5 / s)
        pmf = np.where(a >= 0.5, p_tail, p_center)
        tail = np.exp(-(c + 0.5) / s)
        cdf[i, : 2 * c + 3] = pmf_to_quantized_cdf(pmf, max(tail, 1e-12))
        lengths[i] = 2 * c + 3
        offsets[i] = -c
    return RansCoder(cdf, lengths, offsets)


def encode_channelwise(coder: RansCoder, symbols: np.ndarray) -> bytes:
    """Code [..., C] integer symbols with per-channel tables in one rANS call
    (batched like the reference's entropy_trick)."""
    C = symbols.shape[-1]
    idx = np.broadcast_to(np.arange(C, dtype=np.int32), symbols.shape)
    return coder.encode_with_indexes(symbols.astype(np.int32), np.ascontiguousarray(idx))


def decode_channelwise(coder: RansCoder, data: bytes, shape) -> np.ndarray:
    C = shape[-1]
    idx = np.ascontiguousarray(
        np.broadcast_to(np.arange(C, dtype=np.int32), shape))
    return coder.decode_with_indexes(data, idx)
