"""Pure-Python MJPEG-class intra anchor — an in-container RD baseline.

The reference compares its learned codecs against x264/x265/BPG anchors
(models.py:88-224,412-429), but this image ships neither ffmpeg nor bpg
binaries, so those harnesses (fvc/anchors/x26x.py) have nothing to run.
This module provides a real, runnable anchor: 8x8 DCT + JPEG-style
quantization (quality ladder) + zigzag/RLE + zlib entropy coding, with
ACTUAL byte counts — i.e. MJPEG-class intra-only compression. It is not
x264 parity; it is the honest floor anchor every learned codec must beat,
and it exercises the anchor-comparison plumbing (eval.py --codec mjpeg,
BD-rate vs anchor) end to end in-container.

Vectorized: the whole frame's 8x8 blocks DCT in one einsum (CPU numpy).
"""

from __future__ import annotations

import zlib

import numpy as np

# JPEG Annex K luminance quantization table (the standard's example table)
_QTABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.float32)

# RGB<->YCbCr (BT.601 full range, the JPEG convention)
_RGB2YCC = np.array([[0.299, 0.587, 0.114],
                     [-0.168736, -0.331264, 0.5],
                     [0.5, -0.418688, -0.081312]], np.float32)
_YCC2RGB = np.array([[1.0, 0.0, 1.402],
                     [1.0, -0.344136, -0.714136],
                     [1.0, 1.772, 0.0]], np.float32)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None]
                                    * np.pi / 16.0)
    c[0] /= np.sqrt(2.0)
    return c.astype(np.float32)


_DCT = _dct_matrix()


def _quality_scale(quality: int) -> float:
    """libjpeg's quality -> table scale mapping."""
    quality = int(np.clip(quality, 1, 100))
    if quality < 50:
        return 5000.0 / quality / 100.0
    return (200.0 - 2.0 * quality) / 100.0


def _blocks(chan: np.ndarray) -> np.ndarray:
    """[H,W] -> [H/8, W/8, 8, 8] (H,W padded to multiples of 8 by edge)."""
    H, W = chan.shape
    ph, pw = (-H) % 8, (-W) % 8
    if ph or pw:
        chan = np.pad(chan, ((0, ph), (0, pw)), mode="edge")
    H2, W2 = chan.shape
    return chan.reshape(H2 // 8, 8, W2 // 8, 8).transpose(0, 2, 1, 3)


def _unblocks(blocks: np.ndarray, H: int, W: int) -> np.ndarray:
    nh, nw = blocks.shape[:2]
    out = blocks.transpose(0, 2, 1, 3).reshape(nh * 8, nw * 8)
    return out[:H, :W]


def compress_frame(frame: np.ndarray, quality: int = 50
                   ) -> tuple[np.ndarray, int]:
    """frame: [H,W,3] float in [0,1]. Returns (reconstruction, num_bits) —
    num_bits from the actual zlib-coded payload."""
    H, W, _ = frame.shape
    ycc = (frame.reshape(-1, 3) @ _RGB2YCC.T).reshape(H, W, 3)
    ycc[..., 0] -= 0.5  # center luma like the chroma channels
    q = np.maximum(np.round(_QTABLE * _quality_scale(quality)), 1.0)

    payload = bytearray()
    rec = np.empty_like(ycc)
    for c in range(3):
        b = _blocks(ycc[..., c] * 255.0)
        coeff = np.einsum("ij,nmjk,lk->nmil", _DCT, b, _DCT)
        qc = np.round(coeff / q).astype(np.int16)
        payload += qc.tobytes()
        deq = qc.astype(np.float32) * q
        ib = np.einsum("ji,nmjk,kl->nmil", _DCT, deq, _DCT)
        rec[..., c] = _unblocks(ib, H, W) / 255.0
    bits = 8 * len(zlib.compress(bytes(payload), 6))

    rec[..., 0] += 0.5
    rgb = (rec.reshape(-1, 3) @ _YCC2RGB.T).reshape(H, W, 3)
    return np.clip(rgb, 0.0, 1.0), bits


# quality ladder roughly spanning the learned codecs' operating range
QUALITY_LADDER = [10, 20, 35, 50, 65, 80, 90, 95]


def compress_video(frames: np.ndarray, quality: int = 50) -> dict:
    """frames: [T,H,W,3] in [0,1]; intra-codes every frame (MJPEG).
    Returns {bpp, psnr, psnr_list, recon}."""
    T, H, W, _ = frames.shape
    bits = 0
    recs, psnrs = [], []
    for t in range(T):
        rec, b = compress_frame(frames[t].astype(np.float32), quality)
        bits += b
        mse = float(np.mean((rec - frames[t]) ** 2))
        psnrs.append(-10.0 * np.log10(mse + 1e-12))
        recs.append(rec)
    return {"bpp": bits / (T * H * W), "psnr": float(np.mean(psnrs)),
            "psnr_list": psnrs, "recon": np.stack(recs)}
