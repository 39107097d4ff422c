"""Backward warping (grid_sample-equivalent) and scale-space warping.

Two implementations of `flow_warp`, selectable with `set_warp_method`:

- "gather" reproduces the reference's torch_warp (models.py:730-747) bit-close:
  a normalized [-1,1] base grid plus flow/((S-1)/2), sampled by
  F.grid_sample(mode='bilinear', padding_mode='border', align_corners=False).
  Folding the normalization through grid_sample's unnormalize step, the
  effective source pixel for output (i, j) with flow (u, v) in pixels is

      px = (j + u) * W/(W-1) - 0.5,   py = (i + v) * H/(H-1) - 0.5

  clamped to the image (border padding), then bilinearly interpolated. XLA
  lowers the per-pixel gather poorly on TPU (~440 ms for six 1080p frames —
  measured 30x slower than the window method), so this path is kept for
  golden-parity testing and CPU use.

- "window" (default — the framework's warp definition): a two-pass separable
  shift-and-select decomposition that never materializes a gather. Pass 1
  selects, per pixel, the source *row pair* from a ±radius vertical window
  (edge-padded, matching border clamping) and lerps them; pass 2 does the same
  horizontally on the result. All ops are shifts/compares/fmas that XLA fuses
  into two streaming kernels (~13 ms for six 1080p frames at radius 6, bf16).
  Semantics differ from grid_sample in two documented ways: (a) displacements
  beyond `radius` pixels clamp to the window edge, and (b) the vertical sample
  position is the one computed at the *gathered* column (exact for locally
  translational flow; for smooth codec flow fields the divergence is tiny —
  see tests/test_ops_parity.py). Both passes are differentiable, so training
  and coding use one consistent warp.

`scale_space_warp` implements the SSF trilinear lookup (compressai ssf2020
semantics used by ELFVC/MCVC, models.py:1866+): a Gaussian scale-space volume
indexed by (flow, scale) with border padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img: [B,H,W,C]; iy/ix: [B,Ho,Wo] int32 (already clipped). -> [B,Ho,Wo,C]"""
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, -1)  # [B, Ho*Wo]
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return out.reshape(B, iy.shape[1], iy.shape[2], C)


def _bilinear_gather(img: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Bilinear sample img [B,H,W,C] at float pixel coords py/px [B,Ho,Wo],
    border-clamped (grid_sample padding_mode='border')."""
    _, H, W, _ = img.shape
    px = jnp.clip(px, 0.0, W - 1.0)
    py = jnp.clip(py, 0.0, H - 1.0)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[..., None].astype(img.dtype)
    wy = (py - y0)[..., None].astype(img.dtype)
    ix0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    iy0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    ix1 = jnp.minimum(ix0 + 1, W - 1)
    iy1 = jnp.minimum(iy0 + 1, H - 1)
    v00 = _gather_2d(img, iy0, ix0)
    v01 = _gather_2d(img, iy0, ix1)
    v10 = _gather_2d(img, iy1, ix0)
    v11 = _gather_2d(img, iy1, ix1)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


_WARP_METHOD = "window"
_WARP_RADIUS = 16
_WARP_MESH = None  # (mesh, axis_name, halo) for method="tiled"


def set_warp_method(method: str, radius: int = 16, *, mesh=None,
                    axis_name: str = "spatial", halo: int = 64) -> None:
    """Set the process-wide flow_warp implementation: "window" (TPU-fast,
    default), "gather" (bit-exact grid_sample parity), or "tiled"
    (spatially-sharded halo-exchange warp, fvc.dist.tiled_warp — every
    flow_warp in the model then runs under shard_map with its H axis
    sharded over `mesh`'s `axis_name`; requires a mesh)."""
    global _WARP_METHOD, _WARP_RADIUS, _WARP_MESH
    assert method in ("window", "gather", "tiled"), method
    if method == "tiled":
        assert mesh is not None, "tiled warp needs a mesh"
        _WARP_MESH = (mesh, axis_name, halo)
    _WARP_METHOD = method
    _WARP_RADIUS = radius


class warp_method:
    """Context manager scoping a flow_warp implementation choice."""

    def __init__(self, method: str, radius: int = 16, *, mesh=None,
                 axis_name: str = "spatial", halo: int = 64):
        self.method, self.radius = method, radius
        self.mesh, self.axis_name, self.halo = mesh, axis_name, halo

    def __enter__(self):
        self.saved = (_WARP_METHOD, _WARP_RADIUS, _WARP_MESH)
        set_warp_method(self.method, self.radius, mesh=self.mesh,
                        axis_name=self.axis_name, halo=self.halo)

    def __exit__(self, *exc):
        global _WARP_MESH
        set_warp_method(self.saved[0], self.saved[1],
                        mesh=self.saved[2][0] if self.saved[2] else None,
                        axis_name=self.saved[2][1] if self.saved[2] else "spatial",
                        halo=self.saved[2][2] if self.saved[2] else 64)
        _WARP_MESH = self.saved[2]


def _source_coords(H: int, W: int, flow: jax.Array):
    """Float source-pixel coordinates of grid_sample(align_corners=False),
    border-clamped."""
    j = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    i = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    px = (j + flow[..., 0]) * (W / (W - 1.0)) - 0.5
    py = (i + flow[..., 1]) * (H / (H - 1.0)) - 0.5
    return jnp.clip(px, 0.0, W - 1.0), jnp.clip(py, 0.0, H - 1.0)


def _warp_window(img: jax.Array, flow: jax.Array, radius: int) -> jax.Array:
    """Two-pass shift-and-select warp (see module docstring).

    Layout note: the image is warped in channel-FIRST layout. Warped tensors
    are 2-3 channels; with channels-last their lane (minor) dim is 3/128
    occupied and every select/lerp pass runs at ~45 GB/s (measured,
    scripts/microbench_ops.py). Transposing to [B,C,H,W] puts W on the lane
    dim, and the two cheap 11 MB transposes buy back a ~6x faster select
    chain."""
    B, H, W, C = img.shape
    px, py = _source_coords(H, W, flow)
    chw = img.transpose(0, 3, 1, 2)  # [B,C,H,W]
    out = _window_sample_chw(chw, px, py, radius)
    return out.transpose(0, 2, 3, 1)


def _window_sample_chw(chw: jax.Array, px: jax.Array, py: jax.Array,
                       radius: int) -> jax.Array:
    """Bilinear-sample `chw` [B,C,H,W] at clipped float pixel coords px/py
    [B,H,W] with the two-pass windowed shift-and-select scheme. Shared by
    flow_warp and scale_space_warp (which differ only in how the source
    coordinates derive from the flow)."""
    R = radius
    B, C, H, W = chw.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[:, None].astype(chw.dtype)       # [B,1,H,W]
    wy = (py - y0)[:, None].astype(chw.dtype)
    j = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    i = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    dy = jnp.clip(y0.astype(jnp.int32) - i, -R, R)[:, None]   # [B,1,H,W]
    dx = jnp.clip(x0.astype(jnp.int32) - j, -R, R)[:, None]

    # vertical pass: V0[i,j] = img[i+dy, j], V1 = img[i+dy+1, j]
    pad = jnp.pad(chw, ((0, 0), (0, 0), (R, R + 1), (0, 0)), mode="edge")
    v0 = pad[:, :, R:R + H]
    v1 = pad[:, :, R + 1:R + 1 + H]
    for d in range(-R, R + 1):
        if d == 0:
            continue
        m = dy == d
        v0 = jnp.where(m, pad[:, :, R + d:R + d + H], v0)
        v1 = jnp.where(m, pad[:, :, R + d + 1:R + d + 1 + H], v1)
    vy = (v0 + (v1 - v0) * wy).astype(chw.dtype)

    # horizontal pass on the vertically-lerped field
    padh = jnp.pad(vy, ((0, 0), (0, 0), (0, 0), (R, R + 1)), mode="edge")
    h0 = padh[..., R:R + W]
    h1 = padh[..., R + 1:R + 1 + W]
    for d in range(-R, R + 1):
        if d == 0:
            continue
        m = dx == d
        h0 = jnp.where(m, padh[..., R + d:R + d + W], h0)
        h1 = jnp.where(m, padh[..., R + d + 1:R + d + 1 + W], h1)
    return h0 + (h1 - h0) * wx


def flow_warp(img: jax.Array, flow: jax.Array, *, method: str | None = None,
              radius: int | None = None) -> jax.Array:
    """Backward-warp `img` [B,H,W,C] by `flow` [B,H,W,2] (pixels, (u=x, v=y)).

    Reference semantics: torch_warp / F.grid_sample(bilinear, border,
    align_corners=False) at models.py:730-747; see module docstring for the
    two implementations. Under the bf16 activation policy the warped image
    rides half-width (halves the pass's HBM traffic); coordinates stay f32.
    """
    from fvc.core.policy import compute_dtype

    dt = compute_dtype()
    if dt is not None and img.dtype != dt:
        img = img.astype(dt)
    flow = flow.astype(jnp.float32)
    method = method or _WARP_METHOD
    if method == "window":
        return _warp_window(img, flow, _WARP_RADIUS if radius is None else radius)
    if method == "tiled":
        from fvc.dist.tiled_warp import flow_warp_tiled
        mesh, axis_name, halo = _WARP_MESH
        return flow_warp_tiled(img, flow, mesh=mesh, halo=halo,
                               axis_name=axis_name)
    _, H, W, _ = img.shape
    px, py = _source_coords(H, W, flow)
    return _bilinear_gather(img, py, px)


# ---------------------------------------------------------------------------
# Scale-space (SSF) warping
# ---------------------------------------------------------------------------

def gaussian_kernel1d(sigma: float, radius: int, dtype=jnp.float32) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur, kernel size 2*ceil(3*sigma)+1, SAME padding.
    Rides the active compute policy (bf16 on TPU): the scale-space volume is
    consumed by the bf16 warp anyway, so blurring in f32 only wastes HBM."""
    import math

    from fvc.core.policy import compute_dtype

    dt = compute_dtype()
    if dt is not None and x.dtype != dt:
        x = x.astype(dt)
    radius = int(math.ceil(3.0 * float(sigma)))
    k = gaussian_kernel1d(sigma, radius, x.dtype)
    C = x.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, kh, (1, 1), ((radius, radius), (0, 0)),
        dimension_numbers=dn, feature_group_count=C)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), ((0, 0), (radius, radius)),
        dimension_numbers=dn, feature_group_count=C)
    return y


def gaussian_volume(x: jax.Array, sigma0: float, num_levels: int) -> jax.Array:
    """Progressive blur/downsample pyramid re-upsampled into a [B,D,H,W,C]
    scale-space volume, D = num_levels + 1 (level 0 = identity)."""
    from fvc.ops.resize import avg_pool2, bilinear_resize

    _, H, W, _ = x.shape
    vol = [x]
    y = gaussian_blur(x, sigma0)
    vol.append(y)
    for i in range(1, num_levels):
        y = avg_pool2(y)
        y = gaussian_blur(y, sigma0)
        vol.append(bilinear_resize(y, H, W, align_corners=False))
    return jnp.stack(vol, axis=1)


def _ssf_coords(volume_shape, flow, scale):
    """Clipped float source coordinates of the SSF 3-D grid_sample
    (align_corners=False, border): px/py [B,H,W] shared by every depth slice,
    pz [B,H,W]."""
    _, D, H, W, _ = volume_shape
    j = jnp.arange(W, dtype=flow.dtype)[None, None, :]
    i = jnp.arange(H, dtype=flow.dtype)[None, :, None]
    gx = (2.0 * j + 1.0) / W - 1.0 + flow[..., 0]
    gy = (2.0 * i + 1.0) / H - 1.0 + flow[..., 1]
    px = jnp.clip(((gx + 1.0) * W - 1.0) * 0.5, 0.0, W - 1.0)
    py = jnp.clip(((gy + 1.0) * H - 1.0) * 0.5, 0.0, H - 1.0)
    pz = jnp.clip(((scale + 1.0) * D - 1.0) * 0.5, 0.0, D - 1.0)
    return px, py, pz


def scale_space_warp(volume: jax.Array, flow: jax.Array, scale: jax.Array, *,
                     method: str | None = None) -> jax.Array:
    """Trilinear lookup into scale-space `volume` [B,D,H,W,C].

    flow:  [B,H,W,2] normalized offsets added to the [-1,1] base grid (SSF keeps
           flow in normalized units).
    scale: [B,H,W]   normalized depth coordinate in [-1,1].

    grid_sample(align_corners=False, border) 3-D semantics: depth handled as a
    lerp between two bilinear slice samples.

    Default implementation ("window"): the flow is SHARED across depth slices,
    so the volume is sampled as one batched windowed warp over [B*D] slices
    (fvc.ops.warp._window_sample_chw — the TPU-fast path) followed by a
    per-pixel depth select+lerp over the D (small) slices. "gather" keeps the
    take_along_axis formulation for parity testing (same clamp math; the
    window path additionally clamps displacements to the warp radius)."""
    method = method or _WARP_METHOD
    if method == "window":
        return _scale_space_warp_window(volume, flow, scale, _WARP_RADIUS)
    B, D, H, W, C = volume.shape
    px, py, pz = _ssf_coords(volume.shape, flow, scale)

    z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, D - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)
    wz = (pz - z0.astype(flow.dtype))[..., None]

    # Bilinear sample each depth slice with per-pixel dynamic slice selection:
    # gather over combined (depth, space) index into the flattened volume.
    flat = volume.reshape(B, D * H * W, C)

    def sample_at(zi):
        x0 = jnp.floor(px)
        y0 = jnp.floor(py)
        wx = (px - x0)[..., None]
        wy = (py - y0)[..., None]
        ix0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        iy0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        ix1 = jnp.minimum(ix0 + 1, W - 1)
        iy1 = jnp.minimum(iy0 + 1, H - 1)

        def g(iy, ix):
            idx = (zi * H * W + iy * W + ix).reshape(B, -1)
            out = jnp.take_along_axis(flat, idx[..., None], axis=1)
            return out.reshape(B, H, W, C)

        top = g(iy0, ix0) + (g(iy0, ix1) - g(iy0, ix0)) * wx
        bot = g(iy1, ix0) + (g(iy1, ix1) - g(iy1, ix0)) * wx
        return top + (bot - top) * wy

    near = sample_at(z0)
    far = sample_at(z1)
    return near + (far - near) * wz


def _scale_space_warp_window(volume: jax.Array, flow: jax.Array,
                             scale: jax.Array, radius: int) -> jax.Array:
    """TPU-fast scale_space_warp: one batched windowed spatial sample over the
    B*D depth slices (the flow is depth-independent), then a per-pixel depth
    select + lerp over the D slices (D is small: num_levels+1)."""
    from fvc.core.policy import compute_dtype

    B, D, H, W, C = volume.shape
    dt = compute_dtype()
    if dt is not None and volume.dtype != dt:
        volume = volume.astype(dt)
    flow = flow.astype(jnp.float32)
    scale = scale.astype(jnp.float32)
    px, py, pz = _ssf_coords(volume.shape, flow, scale)

    # [B,D,H,W,C] -> [B*D,C,H,W]; coords broadcast over the depth axis
    chw = volume.transpose(0, 1, 4, 2, 3).reshape(B * D, C, H, W)
    pxd = jnp.broadcast_to(px[:, None], (B, D, H, W)).reshape(B * D, H, W)
    pyd = jnp.broadcast_to(py[:, None], (B, D, H, W)).reshape(B * D, H, W)
    warped = _window_sample_chw(chw, pxd, pyd, radius)
    warped = warped.reshape(B, D, C, H, W)

    z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, D - 1)[:, None]  # [B,1,H,W]
    wz = (pz[:, None] - z0.astype(jnp.float32)).astype(warped.dtype)
    near = warped[:, 0]
    far = warped[:, min(1, D - 1)]
    for zi in range(1, D):
        m = z0 == zi
        near = jnp.where(m, warped[:, zi], near)
        far = jnp.where(m, warped[:, min(zi + 1, D - 1)], far)
    out = near + (far - near) * wz
    return out.transpose(0, 2, 3, 1)
