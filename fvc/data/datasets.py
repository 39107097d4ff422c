"""Data layer (L0) — reference dataset.py re-done as host-side pipelines
feeding device arrays.

- VideoDataset      (dataset.py:25-127): frame iterator over test videos.
  Here: raw .yuv (pure numpy, 4:2:0 and 4:4:4), PNG/JPG frame directories
  (PIL), or .mp4 via an ffmpeg pipe when the binary exists. No OpenCV
  dependency (not in this image).
- FrameDataset      (dataset.py:129-171): Vimeo-90k-style septuplets with a
  shared random resized crop across frames.
- MultiViewVideoDataset (dataset.py:175-266): MMPTracking-style multi-camera
  GOP tensors + the streaming-rate sampling-pool emulation (sample_interval /
  c2s_ratio / max_pool_size).
- SyntheticVideoDataset: deterministic moving-pattern clips so every pipeline
  is testable hermetically (no dataset downloads in this environment).

All loaders yield numpy float32 NHWC in [0, 1]; batching/sharding happens in
fvc.train / fvc.dist.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------

def read_yuv(path: str, width: int, height: int, *, fmt: str = "420",
             max_frames: Optional[int] = None) -> np.ndarray:
    """Raw YUV reader -> [T, H, W, 3] RGB float32 in [0,1] (BT.601)."""
    ysize = width * height
    if fmt == "420":
        csize = ysize // 4
        cw, ch = width // 2, height // 2
    elif fmt == "444":
        csize = ysize
        cw, ch = width, height
    else:
        raise ValueError(fmt)
    frame_bytes = ysize + 2 * csize
    frames = []
    with open(path, "rb") as f:
        while max_frames is None or len(frames) < max_frames:
            buf = f.read(frame_bytes)
            if len(buf) < frame_bytes:
                break
            raw = np.frombuffer(buf, np.uint8)
            y = raw[:ysize].reshape(height, width).astype(np.float32)
            u = raw[ysize:ysize + csize].reshape(ch, cw).astype(np.float32)
            v = raw[ysize + csize:].reshape(ch, cw).astype(np.float32)
            if fmt == "420":
                u = u.repeat(2, 0).repeat(2, 1)
                v = v.repeat(2, 0).repeat(2, 1)
            frames.append(_yuv_to_rgb(y, u, v))
    return np.stack(frames) if frames else np.zeros((0, height, width, 3), np.float32)


def _yuv_to_rgb(y, u, v):
    y = y / 255.0
    u = u / 255.0 - 0.5
    v = v / 255.0 - 0.5
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.stack([r, g, b], -1), 0.0, 1.0).astype(np.float32)


def read_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def read_video_ffmpeg(path: str, *, width: Optional[int] = None,
                      height: Optional[int] = None,
                      max_frames: Optional[int] = None) -> np.ndarray:
    """Decode via ffmpeg rawvideo pipe (dataset.py's OpenCV role)."""
    if not ffmpeg_available():
        raise RuntimeError("ffmpeg not available")
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "v:0", "-show_entries",
         "stream=width,height", "-of", "csv=p=0", path],
        capture_output=True, text=True, check=True)
    w0, h0 = map(int, probe.stdout.strip().split(","))
    w, h = width or w0, height or h0
    cmd = ["ffmpeg", "-i", path, "-f", "rawvideo", "-pix_fmt", "rgb24"]
    if (w, h) != (w0, h0):
        cmd += ["-vf", f"scale={w}:{h}"]
    if max_frames:
        cmd += ["-frames:v", str(max_frames)]
    cmd += ["-"]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    n = len(out) // (w * h * 3)
    arr = np.frombuffer(out[: n * w * h * 3], np.uint8).reshape(n, h, w, 3)
    return arr.astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

class SyntheticVideoDataset:
    """Deterministic moving-texture clips so flow estimation and RD training
    have real structure to exploit.

    Two content profiles:

    - ``easy`` (the original rounds-1..4 corpus): 2-3 independently
      *translating* box-smoothed textured layers (foreground layers occlude
      background) with SUBPIXEL per-frame motion plus light sensor noise.
      Evidence from round 4 (docs/RD_RESULTS.md): this content is so
      low-entropy that DVC codes GOP-8 residuals at 0.0016 bpp with 94% of
      bits in motion — RD numbers on it cannot falsify codec-quality claims.

    - ``hard``: calibrated so an MJPEG/DCT-class intra anchor needs
      real-video-like rates (>~0.2 bpp for 30 dB — reference UVG anchor
      curves, plot_hermes.py:755-769) and so motion compensation leaves a
      residual worth coding (reference mv share ~25% of bits,
      plot_hermes.py:708-719). Ingredients:
        * fractal (1/f-ish octave) textures — real high-frequency spatial
          entropy instead of box-smoothed blobs;
        * global camera AFFINE motion (translation + rotation + zoom) plus
          per-layer affine motion — pure-translation flow cannot predict it
          exactly, so residuals carry content;
        * moving elliptical occluders whose centers drift independently of
          their texture — dis-occluded regions are new content every frame;
        * photometric variation: global gain flicker + a moving illumination
          gradient — brightness change that warping cannot model;
        * slow texture cross-dissolve per layer — appearance change over
          time beyond any geometric warp;
        * independent per-frame sensor noise (incompressible; puts a
          real-video-like ceiling on PSNR and a floor on rate).
    """

    def __init__(self, num_videos: int = 4, frames: int = 16, height: int = 256,
                 width: int = 256, seed: int = 0, motion: float = 2.0,
                 noise: float = 0.01, profile: str = "easy"):
        if profile not in ("easy", "hard"):
            raise ValueError(f"profile must be easy|hard, got {profile!r}")
        self.num_videos = num_videos
        self.frames = frames
        self.h, self.w = height, width
        self.seed = seed
        self.motion = motion
        self.noise = noise
        self.profile = profile

    def __len__(self):
        return self.num_videos

    def _texture(self, rng, h, w, smooth):
        big = rng.rand(h, w, 3).astype(np.float32)
        kernel = np.ones(smooth, np.float32) / smooth
        for ax in (0, 1):
            big = np.apply_along_axis(
                lambda m: np.convolve(m, kernel, mode="same"), ax, big)
        lo, hi = big.min(), big.max()
        return (big - lo) / (hi - lo + 1e-6)

    def _crop_subpixel(self, big, oy, ox, h, w):
        """Bilinear crop of big at float offset (oy, ox)."""
        iy, fy = int(np.floor(oy)), oy - np.floor(oy)
        ix, fx = int(np.floor(ox)), ox - np.floor(ox)
        win = big[iy:iy + h + 1, ix:ix + w + 1]
        top = win[:h, :w] * (1 - fx) + win[:h, 1:w + 1] * fx
        bot = win[1:h + 1, :w] * (1 - fx) + win[1:h + 1, 1:w + 1] * fx
        return top * (1 - fy) + bot * fy

    def _fractal_texture(self, rng, h, w):
        """Octave noise with a ~1/f amplitude spectrum (natural-image-like):
        per-octave amplitude halves as spatial frequency doubles, plus a
        fine-grain octave so there is genuine high-frequency energy for the
        entropy coder to pay for."""
        img = np.zeros((h, w, 3), np.float32)
        cell = max(4, min(h, w) // 4)
        amp = 1.0
        while cell >= 1:
            gh, gw = h // cell + 2, w // cell + 2
            g = rng.rand(gh, gw, 3).astype(np.float32) - 0.5
            if cell > 1:
                ys = np.arange(h, dtype=np.float32) / cell
                xs = np.arange(w, dtype=np.float32) / cell
                y0 = ys.astype(int); x0 = xs.astype(int)
                fy = (ys - y0)[:, None, None]
                fx = (xs - x0)[None, :, None]
                up = (g[y0][:, x0] * (1 - fy) * (1 - fx)
                      + g[y0][:, x0 + 1] * (1 - fy) * fx
                      + g[y0 + 1][:, x0] * fy * (1 - fx)
                      + g[y0 + 1][:, x0 + 1] * fy * fx)
            else:
                up = g[:h, :w]
            img += amp * up
            amp *= 0.55
            cell //= 2
        lo, hi = img.min(), img.max()
        return (img - lo) / (hi - lo + 1e-6)

    @staticmethod
    def _sample_bilinear(big, ys, xs):
        """Bilinear gather big[ys, xs] -> [H,W,3] for float coord grids."""
        H, W = big.shape[:2]
        y0 = np.clip(np.floor(ys).astype(int), 0, H - 2)
        x0 = np.clip(np.floor(xs).astype(int), 0, W - 2)
        fy = np.clip(ys - y0, 0.0, 1.0)[..., None]
        fx = np.clip(xs - x0, 0.0, 1.0)[..., None]
        tl = big[y0, x0]
        tr = big[y0, x0 + 1]
        bl = big[y0 + 1, x0]
        br = big[y0 + 1, x0 + 1]
        return (tl * (1 - fy) * (1 - fx) + tr * (1 - fy) * fx
                + bl * fy * (1 - fx) + br * fy * fx)

    def _hard_item(self, idx: int) -> np.ndarray:
        # ~1.1 s/clip to synthesize; cache on disk so training-chunk startup
        # (64-clip pools) doesn't pay a minute of numpy per chunk. Keyed by
        # every generation parameter; gitignored (data/synth_cache/).
        cache_root = os.environ.get("FVC_SYNTH_CACHE", "data/synth_cache")
        key = (f"hard_s{self.seed + idx}_{self.frames}x{self.h}x{self.w}"
               f"_m{self.motion:g}_n{self.noise:g}.npy")
        path = os.path.join(cache_root, key) if cache_root else None
        if path and os.path.exists(path):
            return np.load(path)
        out = self._hard_item_uncached(idx)
        if path:
            os.makedirs(cache_root, exist_ok=True)
            tmp = f"{path}.tmp{os.getpid()}.npy"  # np.save appends .npy otherwise
            np.save(tmp, out)
            os.replace(tmp, path)
        return out

    def _hard_item_uncached(self, idx: int) -> np.ndarray:
        rng = np.random.RandomState(self.seed + idx)
        h, w = self.h, self.w
        T = self.frames
        diag = 0.5 * np.hypot(h, w)
        # margin must cover translation + rotation/zoom corner displacement
        max_rot = np.deg2rad(0.5)
        max_zoom = 0.004
        margin = int(np.ceil(self.motion * T + diag * (max_rot + max_zoom) * T)) + 4
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        cy0, cx0 = (h - 1) / 2.0, (w - 1) / 2.0

        n_layers = 2 + (idx % 2)  # background + 1-2 occluders
        layers = []
        for li in range(n_layers):
            tex_a = self._fractal_texture(rng, h + 2 * margin, w + 2 * margin)
            tex_b = self._fractal_texture(rng, h + 2 * margin, w + 2 * margin)
            v = rng.uniform(-self.motion, self.motion, 2)      # px/frame
            rot = rng.uniform(-max_rot, max_rot)               # rad/frame
            zoom = rng.uniform(-max_zoom, max_zoom)            # frac/frame
            dissolve = rng.uniform(0.005, 0.02)                # alpha/frame
            if li > 0:
                cy, cx = rng.uniform(0.25, 0.75, 2)
                ry, rx = rng.uniform(0.15, 0.35, 2)
                mv = rng.uniform(-self.motion, self.motion, 2) / min(h, w)
            else:
                cy = cx = ry = rx = 0.0
                mv = np.zeros(2)
            layers.append(dict(tex_a=tex_a, tex_b=tex_b, v=v, rot=rot,
                               zoom=zoom, dissolve=dissolve,
                               matte=(cy, cx, ry, rx), mv=mv, fg=li > 0))

        # photometric schedule: gain flicker + moving illumination gradient
        g_amp = rng.uniform(0.02, 0.06)
        g_per = rng.uniform(6.0, 20.0)
        g_phi = rng.uniform(0, 2 * np.pi)
        grad_amp = rng.uniform(0.03, 0.08)
        grad_th = rng.uniform(0, 2 * np.pi)
        grad_vel = rng.uniform(-0.05, 0.05)
        grad_field = ((xx / w) * np.cos(grad_th)
                      + (yy / h) * np.sin(grad_th))[..., None]

        frames = []
        for t in range(T):
            canvas = None
            for L in layers:
                # inverse affine: output px -> source coords in the big tex
                th = L["rot"] * t
                s = (1.0 + L["zoom"]) ** t
                cth, sth = np.cos(th) * s, np.sin(th) * s
                dy = yy - cy0
                dx = xx - cx0
                sy = cth * dy - sth * dx + cy0 + margin + t * L["v"][1]
                sx = sth * dy + cth * dx + cx0 + margin + t * L["v"][0]
                a = min(1.0, t * L["dissolve"])
                tex = L["tex_a"] * (1 - a) + L["tex_b"] * a
                crop = self._sample_bilinear(tex, sy, sx)
                if not L["fg"]:
                    canvas = crop
                else:
                    cy, cx, ry, rx = L["matte"]
                    my = (yy / h - (cy + t * L["mv"][1])) / ry
                    mx = (xx / w - (cx + t * L["mv"][0])) / rx
                    m = np.clip(3.0 - np.sqrt(my ** 2 + mx ** 2) * 3.0, 0, 1)
                    mask = m[..., None].astype(np.float32)
                    canvas = canvas * (1 - mask) + crop * mask
            gain = 1.0 + g_amp * np.sin(2 * np.pi * t / g_per + g_phi)
            illum = 1.0 + grad_amp * grad_field * np.sin(
                2 * np.pi * (t * grad_vel + 0.25))
            canvas = canvas * gain * illum
            canvas = canvas + self.noise * rng.randn(h, w, 3).astype(np.float32)
            frames.append(np.clip(canvas, 0, 1).astype(np.float32))
        return np.stack(frames)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self.profile == "hard":
            return self._hard_item(idx)
        rng = np.random.RandomState(self.seed + idx)
        h, w = self.h, self.w
        margin = int(np.ceil(self.motion * self.frames)) + 2
        n_layers = 2 + (idx % 2)
        layers = []
        for li in range(n_layers):
            smooth = int(rng.choice([5, 9, 17]))
            tex = self._texture(rng, h + 2 * margin, w + 2 * margin, smooth)
            v = rng.uniform(-self.motion, self.motion, 2)
            if li > 0:  # foreground: soft elliptical matte
                cy, cx = rng.uniform(0.25, 0.75, 2)
                ry, rx = rng.uniform(0.15, 0.35, 2)
                yy = (np.arange(h)[:, None] / h - cy) / ry
                xx = (np.arange(w)[None, :] / w - cx) / rx
                m = np.clip(2.0 - np.sqrt(yy ** 2 + xx ** 2) * 2.0, 0, 1)
                mask = m[..., None].astype(np.float32)
            else:
                mask = None
            layers.append((tex, v, mask))
        frames = []
        for t in range(self.frames):
            canvas = None
            for (tex, v, mask) in layers:
                oy = margin + t * v[1]
                ox = margin + t * v[0]
                crop = self._crop_subpixel(tex, oy, ox, h, w)
                canvas = crop if canvas is None else (
                    canvas * (1 - mask) + crop * mask)
            canvas = canvas + self.noise * rng.randn(h, w, 3).astype(np.float32)
            frames.append(np.clip(canvas, 0, 1).astype(np.float32))
        return np.stack(frames)


class VideoDataset:
    """Frame iterator over test videos in a directory (reference
    dataset.py:25-127). Supports .yuv (dims parsed from the filename like
    `name_1920x1080.yuv`), frame-directories of images, and .mp4 via ffmpeg."""

    def __init__(self, root: str, frame_size: Optional[Tuple[int, int]] = None,
                 max_frames: Optional[int] = None):
        self.root = root
        self.frame_size = frame_size
        self.max_frames = max_frames
        self.items: List[str] = []
        if os.path.isdir(root):
            for name in sorted(os.listdir(root)):
                p = os.path.join(root, name)
                if name.endswith((".yuv", ".mp4", ".mkv", ".webm")) or os.path.isdir(p):
                    self.items.append(p)

    def __len__(self):
        return len(self.items)

    def load(self, idx: int) -> np.ndarray:
        path = self.items[idx]
        if path.endswith(".yuv"):
            import re
            m = re.search(r"(\d+)x(\d+)", os.path.basename(path))
            if not m:
                raise ValueError(f"cannot parse dims from {path}")
            w, h = int(m.group(1)), int(m.group(2))
            clip = read_yuv(path, w, h, max_frames=self.max_frames)
        elif os.path.isdir(path):
            files = sorted(
                f for f in os.listdir(path) if f.endswith((".png", ".jpg")))
            if self.max_frames:
                files = files[: self.max_frames]
            clip = np.stack([read_image(os.path.join(path, f)) for f in files])
        else:
            clip = read_video_ffmpeg(path, max_frames=self.max_frames)
        if self.frame_size is not None:
            clip = center_crop(clip, *self.frame_size)
        return clip

    def iter_gops(self, gop_size: int = 16) -> Iterator[np.ndarray]:
        """Yield [gop_size, H, W, 3] chunks per video (eval.py:283-294).
        Ragged tails are dropped (static shapes for XLA)."""
        for i in range(len(self)):
            clip = self.load(i)
            for s in range(0, len(clip) - gop_size + 1, gop_size):
                yield clip[s: s + gop_size]


class FrameDataset:
    """Vimeo-90k-style septuplet sampler with one shared crop per sample
    (dataset.py:129-171). Falls back to synthetic clips when the directory is
    absent so training is runnable hermetically."""

    def __init__(self, root: Optional[str] = None, crop: int = 256,
                 frames: int = 7, num_synthetic: int = 64, seed: int = 0,
                 profile: str = "easy"):
        self.crop = crop
        self.frames = frames
        self.samples: List[str] = []
        if root and os.path.isdir(root):
            for dirpath, _, files in os.walk(root):
                if sum(f.endswith(".png") for f in files) >= frames:
                    self.samples.append(dirpath)
            self.samples.sort()
        self.synthetic = None
        if not self.samples:
            self.synthetic = SyntheticVideoDataset(
                num_videos=num_synthetic, frames=frames,
                height=crop, width=crop, seed=seed, profile=profile)

    def __len__(self):
        return len(self.samples) if self.samples else len(self.synthetic)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self.synthetic is not None:
            return self.synthetic[idx]
        d = self.samples[idx]
        files = sorted(f for f in os.listdir(d) if f.endswith(".png"))[: self.frames]
        clip = np.stack([read_image(os.path.join(d, f)) for f in files])
        return random_resized_crop(clip, self.crop, np.random.RandomState(idx))


class MultiViewVideoDataset:
    """Multi-camera GOP tensors [gop, views, H, W, 3] + the streaming
    sampling-pool emulation (dataset.py:175-266). Synthetic fallback renders
    the same underlying scene from per-view crops."""

    CATEGORY_VIEWS = {"cafe_shop": 4, "industry_safety": 6, "lobby": 5,
                      "office": 4, "retail": 4}  # dataset.py:173-174

    def __init__(self, root: Optional[str] = None, category: str = "office",
                 gop: int = 16, height: int = 256, width: int = 256,
                 sample_interval: float = 1.0, c2s_ratio: float = 1.0,
                 max_pool_size: int = 10, seed: int = 0,
                 num_samples: int = 8, profile: str = "easy"):
        self.views = self.CATEGORY_VIEWS.get(category, 4)
        self.gop = gop
        self.h, self.w = height, width
        self.sample_interval = max(sample_interval, 1e-6)
        self.c2s_ratio = c2s_ratio
        self.max_pool_size = max_pool_size
        self.num_samples = num_samples
        self._rng = np.random.RandomState(seed)
        self._pool: List[int] = []
        self._clock = 0.0
        self.root = root
        self.category = category
        self._synth = SyntheticVideoDataset(
            num_videos=num_samples * self.views, frames=gop,
            height=height, width=width, seed=seed, profile=profile)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int) -> np.ndarray:
        views = [self._synth[idx * self.views + v] for v in range(self.views)]
        return np.stack(views, axis=1)  # [gop, views, H, W, 3]

    def sample(self) -> np.ndarray:
        """Streaming-rate pool emulation (dataset.py:231-236): GOPs arrive
        every `sample_interval` ticks into a bounded pool; training draws a
        uniform element from the pool."""
        self._clock += self.c2s_ratio
        while self._clock >= self.sample_interval:
            self._clock -= self.sample_interval
            self._pool.append(self._rng.randint(0, len(self)))
            if len(self._pool) > self.max_pool_size:
                self._pool.pop(0)
        if not self._pool:
            self._pool.append(self._rng.randint(0, len(self)))
        return self[self._pool[self._rng.randint(0, len(self._pool))]]


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def center_crop(clip: np.ndarray, h: int, w: int) -> np.ndarray:
    H, W = clip.shape[1:3]
    top = max(0, (H - h) // 2)
    left = max(0, (W - w) // 2)
    return clip[:, top: top + h, left: left + w]


def random_resized_crop(clip: np.ndarray, size: int,
                        rng: np.random.RandomState) -> np.ndarray:
    """One crop shared across all frames of the clip (dataset.py:148-159)."""
    H, W = clip.shape[1:3]
    s = rng.uniform(0.6, 1.0)
    ch, cw = max(8, int(H * s)), max(8, int(W * s))
    top = rng.randint(0, H - ch + 1)
    left = rng.randint(0, W - cw + 1)
    crop = clip[:, top: top + ch, left: left + cw]
    # bilinear resize to (size, size) in numpy
    ys = np.linspace(0, ch - 1, size)
    xs = np.linspace(0, cw - 1, size)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, ch - 1)
    x1 = np.minimum(x0 + 1, cw - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = crop[:, y0][:, :, x0]
    b = crop[:, y0][:, :, x1]
    c = crop[:, y1][:, :, x0]
    d = crop[:, y1][:, :, x1]
    out = a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    return out.astype(np.float32)


def batch_gops(dataset, indices: Sequence[int], gop: int) -> np.ndarray:
    """Stack [B, gop, H, W, 3] from per-video clips."""
    out = []
    for i in indices:
        clip = dataset[i]
        out.append(clip[:gop])
    return np.stack(out)
