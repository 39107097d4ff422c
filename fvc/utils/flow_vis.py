"""Optical-flow visualization (reference DVC/subnet/flowlib.py role): map a
flow field to the standard HSV color wheel (hue = direction, saturation =
magnitude) for eyeballing SpyNet/codec motion fields."""

from __future__ import annotations

import colorsys

import numpy as np


def flow_to_image(flow: np.ndarray, max_mag: float | None = None) -> np.ndarray:
    """flow: [H, W, 2] (u, v) in pixels -> uint8 RGB [H, W, 3]."""
    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u * u + v * v)
    ang = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    if max_mag is None:
        max_mag = max(float(mag.max()), 1e-6)
    sat = np.clip(mag / max_mag, 0, 1)
    hue = (ang + 1.0) / 2.0

    h = hue.reshape(-1)
    s = sat.reshape(-1)
    rgb = np.empty((h.size, 3), np.float32)
    # vectorized HSV->RGB (value fixed at 1)
    i = np.floor(h * 6.0).astype(int) % 6
    f = h * 6.0 - np.floor(h * 6.0)
    p = 1.0 - s
    q = 1.0 - f * s
    t = 1.0 - (1.0 - f) * s
    one = np.ones_like(s)
    lut = np.stack([
        np.stack([one, t, p], -1), np.stack([q, one, p], -1),
        np.stack([p, one, t], -1), np.stack([p, q, one], -1),
        np.stack([t, p, one], -1), np.stack([one, p, q], -1)], 0)
    rgb = lut[i, np.arange(h.size)]
    return (rgb.reshape(*flow.shape[:2], 3) * 255).astype(np.uint8)
