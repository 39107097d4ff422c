"""Anchor codecs: x264/x265 via ffmpeg, BPG I-frames — subprocess harness.

Behavioral port of compress_whole_video (models.py:88-224) and I_compression
(models.py:412-429): pipe raw RGB frames into ffmpeg with
preset in {veryfast, medium, veryslow}, zerolatency tune, CRF rate control and
GOP keyint, read decoded frames back, report bpp + PSNR. Multiview frame
packing modes (frame_comb 0-3: none/horizontal/vertical/grid) reproduced for
MCVC anchor comparisons.

Everything degrades gracefully when binaries are absent (this image has no
ffmpeg/bpg) — callers check `ffmpeg_available()` / `bpg_available()`.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Tuple

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def bpg_available() -> bool:
    return shutil.which("bpgenc") is not None and shutil.which("bpgdec") is not None


def pack_views(frames: np.ndarray, mode: int) -> np.ndarray:
    """frames: [T, V, H, W, 3] -> packed [T, H', W', 3]
    (frame_comb modes, models.py:125-168): 0 = sequential (interleave views on
    time axis), 1 = horizontal strip, 2 = vertical strip, 3 = 2-column grid."""
    T, V, H, W, _ = frames.shape
    if mode == 0:
        return frames.reshape(T * V, H, W, 3)
    if mode == 1:
        return frames.transpose(0, 2, 1, 3, 4).reshape(T, H, V * W, 3)
    if mode == 2:
        return frames.reshape(T, V * H, W, 3)
    if mode == 3:
        cols = 2
        rows = (V + cols - 1) // cols
        pad = rows * cols - V
        if pad:
            frames = np.concatenate(
                [frames, np.zeros((T, pad, H, W, 3), frames.dtype)], axis=1)
        grid = frames.reshape(T, rows, cols, H, W, 3)
        return grid.transpose(0, 1, 3, 2, 4, 5).reshape(T, rows * H, cols * W, 3)
    raise ValueError(mode)


def compress_whole_video(frames: np.ndarray, *, codec: str = "x264",
                         preset: str = "veryslow", crf: int = 23,
                         gop: int = 16, fps: int = 25
                         ) -> Tuple[np.ndarray, float, float]:
    """frames: [T, H, W, 3] float in [0,1]. Returns (decoded, bpp, psnr).
    Mirrors models.py:88-224's ffmpeg invocation (zerolatency, keyint=GOP)."""
    if not ffmpeg_available():
        raise RuntimeError("ffmpeg not available")
    T, H, W, _ = frames.shape
    lib = {"x264": "libx264", "x265": "libx265"}[codec]
    raw = (np.clip(frames, 0, 1) * 255).astype(np.uint8).tobytes()
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "out.mkv")
        enc_cmd = [
            "ffmpeg", "-y", "-s", f"{W}x{H}", "-pixel_format", "rgb24",
            "-f", "rawvideo", "-r", str(fps), "-i", "-",
            "-vcodec", lib, "-pix_fmt", "yuv420p", "-preset", preset,
            "-tune", "zerolatency", "-crf", str(crf),
            "-x265-params" if codec == "x265" else "-x264-params",
            f"keyint={gop}:verbose=0" if codec == "x265" else f"keyint={gop}",
            out]
        subprocess.run(enc_cmd, input=raw, capture_output=True, check=True)
        nbytes = os.path.getsize(out)
        dec = subprocess.run(
            ["ffmpeg", "-i", out, "-f", "rawvideo", "-pix_fmt", "rgb24", "-"],
            capture_output=True, check=True).stdout
    decoded = np.frombuffer(dec[: T * H * W * 3], np.uint8).reshape(T, H, W, 3)
    decoded = decoded.astype(np.float32) / 255.0
    bpp = nbytes * 8.0 / (T * H * W)
    mse = np.mean((decoded - frames) ** 2)
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    return decoded, bpp, float(psnr)


def bpg_compress_frame(frame: np.ndarray, q_level: int
                       ) -> Tuple[np.ndarray, float]:
    """BPG I-frame path (I_compression models.py:412-429): bpgenc -f 444 -m 9
    -q <level>; returns (reconstruction, bpp)."""
    if not bpg_available():
        raise RuntimeError("bpg binaries not available")
    from PIL import Image

    H, W, _ = frame.shape
    with tempfile.TemporaryDirectory() as td:
        png = os.path.join(td, "in.png")
        bpg = os.path.join(td, "out.bpg")
        dec = os.path.join(td, "dec.png")
        Image.fromarray((np.clip(frame, 0, 1) * 255).astype(np.uint8)).save(png)
        subprocess.run(["bpgenc", "-f", "444", "-m", "9", png, "-o", bpg,
                        "-q", str(q_level)], check=True, capture_output=True)
        nbytes = os.path.getsize(bpg)
        subprocess.run(["bpgdec", bpg, "-o", dec], check=True, capture_output=True)
        recon = np.asarray(Image.open(dec).convert("RGB"), np.float32) / 255.0
    return recon, nbytes * 8.0 / (H * W)
