"""Static-shape helpers: GOP-tail padding and resolution alignment.

XLA wants static shapes (SURVEY §7 "Dynamic shapes"): the reference handles
ragged GOP tails dynamically (eof handling eval.py:283-286) and arbitrary H×W;
here tails are padded-and-masked and frames padded to the transform alignment
(64 = 16x transforms × 4x hyper), with metrics computed on the valid region
only.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


ALIGN = 64  # LSVC/DVC transform alignment; SSF-family needs 128
SSF_ALIGN = 128


def pad_to_multiple(frames: np.ndarray, multiple: int = ALIGN,
                    mode: str = "edge") -> Tuple[np.ndarray, Tuple[int, int]]:
    """frames: [..., H, W, C]. Pads H and W up to `multiple` (edge-replicate,
    the padding that least disturbs boundary statistics). Returns
    (padded, (orig_h, orig_w))."""
    H, W = frames.shape[-3], frames.shape[-2]
    ph = (-H) % multiple
    pw = (-W) % multiple
    if ph == 0 and pw == 0:
        return frames, (H, W)
    pad = [(0, 0)] * (frames.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(frames, pad, mode=mode), (H, W)


def crop_to(frames: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    H, W = hw
    return frames[..., :H, :W, :]


def pad_gop_tail(frames: np.ndarray, gop_size: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """frames: [T, ...] with T <= gop_size. Pads the time axis by repeating the
    last frame; returns (padded [gop_size, ...], valid mask [gop_size])."""
    T = frames.shape[0]
    assert T >= 1
    if T >= gop_size:
        return frames[:gop_size], np.ones(gop_size, np.float32)
    reps = np.repeat(frames[-1:], gop_size - T, axis=0)
    mask = np.zeros(gop_size, np.float32)
    mask[:T] = 1.0
    return np.concatenate([frames, reps], axis=0), mask


def masked_mean(values: np.ndarray, mask: np.ndarray) -> float:
    """Mean of per-frame scalars over the valid tail mask (P-frames only:
    mask[1:] aligns with values over frames[1:])."""
    m = mask[1:] if len(mask) == len(values) + 1 else mask
    denom = max(float(m.sum()), 1.0)
    return float((np.asarray(values) * m).sum() / denom)


def iter_gops_padded(clip: np.ndarray, gop_size: int):
    """Yield (gop [gop_size, H, W, 3], mask) covering ALL frames of the clip —
    unlike iter_gops, the ragged tail is padded-and-masked, not dropped."""
    for s in range(0, len(clip), gop_size):
        chunk = clip[s: s + gop_size]
        if len(chunk) < 2:  # a lone I-frame tail codes nothing
            break
        yield pad_gop_tail(chunk, gop_size)
