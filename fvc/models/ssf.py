"""Scale-Space Flow codec base (SSF / "SSF-Official" equivalent).

The reference uses compressai's pretrained ssf2020 as an anchor and as the base
class of ELFVC and MCVC (models.py:41-46, 1866, 2240). This is the TPU-native
re-implementation: keyframe branch (img AE + hyperprior), inter branch (motion
AE coding cat(x_cur, x_ref), scale-space warping prediction, residual AE
conditioned on the motion latent).

Scale-space warping: Gaussian volume (sigma0=1.5, 5 levels) + trilinear lookup
(fvc.ops.warp.gaussian_volume / scale_space_warp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.entropy.hyperprior import SSFHyperprior
from fvc.models.iframe import SSFDecoder, SSFEncoder
from fvc.ops.math import bits_from_likelihood
from fvc.ops.warp import gaussian_volume, scale_space_warp


def forward_prediction(x_ref, motion_info, *, sigma0: float = 1.5,
                       num_levels: int = 5, scale_field_shift: float = 1.0):
    """motion_info: [B,H,W,3] = (flow_x, flow_y, scale). Flow is in normalized
    grid units; scale indexes the Gaussian scale-space volume.

    Under the `fvc.core.policy.ssf_pyramid()` context the fused
    native-resolution pyramid path runs instead of materializing the
    re-upsampled volume (bytes: ~14x less, see policy docstring)."""
    from fvc.core.policy import ssf_pyramid_enabled

    flow = motion_info[..., :2]
    scale = motion_info[..., 2] + scale_field_shift
    if ssf_pyramid_enabled():
        return _forward_prediction_pyramid(
            x_ref, flow, scale, sigma0=sigma0, num_levels=num_levels)
    volume = gaussian_volume(x_ref, sigma0, num_levels)
    return scale_space_warp(volume, flow, scale)


def _forward_prediction_pyramid(x_ref, flow, scale, *, sigma0: float,
                                num_levels: int, radius: int = 16):
    """Fused scale-space prediction: each Gaussian level is spatially warped
    at its NATIVE (decimated) resolution and bilinearly upsampled, then the
    per-pixel depth lerp runs over the D warped slices.

    Differs from the volume path (gaussian_volume + scale_space_warp — the
    compressai ssf2020 semantics) only in operation order for levels >= 2:
    warp-then-upsample instead of upsample-then-warp. Those levels carry
    sigma >= 1.5 of accumulated blur, so the commutation error is far below
    the quantization noise of the codec (parity-tested > 40 dB against the
    volume path in tests/test_ssf_family.py)."""
    from fvc.core.policy import compute_dtype
    from fvc.ops.resize import avg_pool2, bilinear_resize
    from fvc.ops.warp import (_ssf_coords, _window_sample_chw, gaussian_blur)

    B, H, W, C = x_ref.shape
    dt = compute_dtype()
    if dt is not None and x_ref.dtype != dt:
        x_ref = x_ref.astype(dt)
    levels = [x_ref, gaussian_blur(x_ref, sigma0)]
    y = levels[1]
    for _ in range(1, num_levels):
        y = gaussian_blur(avg_pool2(y), sigma0)
        levels.append(y)
    D = num_levels + 1

    flow = flow.astype(jnp.float32)
    scale = scale.astype(jnp.float32)

    warped = []
    for y_l in levels:
        h_l, w_l = y_l.shape[1], y_l.shape[2]
        # normalized flow is resolution-invariant: just resample the field
        fl = (flow if (h_l, w_l) == (H, W)
              else bilinear_resize(flow, h_l, w_l, align_corners=False))
        px, py, _ = _ssf_coords((B, 1, h_l, w_l, C), fl,
                                jnp.zeros((B, h_l, w_l), jnp.float32))
        out_l = _window_sample_chw(
            y_l.transpose(0, 3, 1, 2), px, py, radius
        ).transpose(0, 2, 3, 1)
        if (h_l, w_l) != (H, W):
            out_l = bilinear_resize(out_l, H, W, align_corners=False)
        warped.append(out_l)

    # depth lerp (same select scheme as _scale_space_warp_window)
    pz = jnp.clip((scale + 1.0) * D * 0.5 - 0.5, 0.0, D - 1.0)
    z0 = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, D - 1)[..., None]
    wz = (pz[..., None] - z0.astype(jnp.float32)).astype(warped[0].dtype)
    near = warped[0]
    far = warped[min(1, D - 1)]
    for zi in range(1, D):
        m = z0 == zi
        near = jnp.where(m, warped[zi], near)
        far = jnp.where(m, warped[min(zi + 1, D - 1)], far)
    return near + (far - near) * wz


class ScaleSpaceFlow(nn.Module):
    """Plain SSF codec. Subclasses (ELFVC/MCVC) reuse the branch builders."""

    planes: int = 192
    mid: int = 128
    sigma0: float = 1.5
    num_levels: int = 5
    scale_field_shift: float = 1.0

    def setup(self):
        self.img_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.img_decoder = SSFDecoder(mid=self.mid, out=3)
        self.img_hyperprior = SSFHyperprior(self.planes)
        self.motion_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.motion_decoder = SSFDecoder(mid=self.mid, out=3)
        self.motion_hyperprior = SSFHyperprior(self.planes)
        self.res_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.res_decoder = SSFDecoder(mid=self.mid, out=3)
        self.res_hyperprior = SSFHyperprior(self.planes)

    def forward_keyframe(self, x, *, training: bool, rng=None):
        y = self.img_encoder(x)
        y_hat, lk, _ = self.img_hyperprior(y, None, training=training, rng=rng)
        x_hat = self.img_decoder(y_hat)
        return x_hat, {"keyframe": lk}

    def forward_inter(self, x_cur, x_ref, *, training: bool, rng=None):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=-1))
        y_motion_hat, motion_lk, _ = self.motion_hyperprior(
            y_motion, None, training=training, rng=r1)

        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = forward_prediction(
            x_ref, motion_info, sigma0=self.sigma0, num_levels=self.num_levels,
            scale_field_shift=self.scale_field_shift)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lk, _ = self.res_hyperprior(y_res, None, training=training, rng=r2)
        x_res_hat = self.res_decoder(
            jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat
        return x_rec, {"motion": motion_lk, "residual": res_lk}

    def __call__(self, x_cur, x_ref, *, training: bool, rng=None):
        return self.forward_inter(x_cur, x_ref, training=training, rng=rng)

    def init_all(self, x_cur, x_ref, *, training: bool = False, rng=None):
        """Exercise keyframe + inter branches so init creates every param
        (linen creates params lazily on first use)."""
        self.forward_keyframe(x_ref, training=training, rng=rng)
        return self.forward_inter(x_cur, x_ref, training=training, rng=rng)


def inter_bpp_est(likelihoods: dict, batch: int, h: int, w: int):
    """Reference bpp accounting for SSF-family outputs
    (parallel_compression models.py:274-281): motion y+z and residual y+z with
    the clamp estimator, normalized by B*H*W."""
    mot, res = likelihoods["motion"], likelihoods["residual"]
    mot_bits = bits_from_likelihood(mot["y"]) + bits_from_likelihood(mot["z"])
    res_bits = bits_from_likelihood(res["y"]) + bits_from_likelihood(res["z"])
    denom = float(batch * h * w)
    return (mot_bits + res_bits) / denom, res_bits / denom
