"""MCVC — multi-camera joint codec with failure resilience and online
fine-tuning (MCVC-Original / MCVC-IA / MCVC-IA-OLFT).

Reference: models.py:2240-2401 (+ helpers 2140-2235). Views are stacked on the
batch axis; the ONLY cross-view op is the ViewAttention block heading each
'-IA' decoder (super_precision.py:113). Resilience = data-level fault
injection: a binomial number of views is masked to zero at input and latent
(sample_failed_machines models.py:2146-2156), and backup decoders reconstruct
from surviving views' latents. OLFT supervises online fine-tuning with
"touch-up" pixels: the top-r% largest-error pixels replaced by ground truth
(replace_elements models.py:2192-2235), with zlib-compressed deltas as the
bandwidth cost.

TPU notes: the view mask is a device array input (host samples it — matching
the reference's python `random` usage); touch-up top-k runs in-graph via
lax.top_k; zlib byte accounting is host-side (fvc.models.mcvc.touchup_bits).
"""

from __future__ import annotations

import math
import zlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fvc.core.config import CodecConfig
from fvc.entropy.hyperprior import SSFHyperprior
from fvc.models.attention import ViewAttention
from fvc.models.iframe import SSFDecoder, SSFEncoder
from fvc.models.ssf import forward_prediction, inter_bpp_est


# ---------------------------------------------------------------------------
# Failure injection (host-side sampling, device-side masking)
# ---------------------------------------------------------------------------

def _binom(n, k):
    return math.comb(n, k)


def sample_num_failed(num_views: int, failure_probability: float,
                      max_failed: int, *, training: bool,
                      rng: np.random.RandomState) -> int:
    """Binomial #failures during training, uniform during eval
    (models.py:2140-2156)."""
    if max_failed == 0:
        return 0
    if training:
        probs = [
            _binom(num_views, k) * failure_probability ** k
            * (1 - failure_probability) ** (num_views - k)
            for k in range(max_failed + 1)
        ]
    else:
        probs = [1.0] * (max_failed + 1)
    probs = np.asarray(probs) / np.sum(probs)
    return int(rng.choice(np.arange(max_failed + 1), p=probs))


def sample_view_mask(batch: int, num_views: int, resilience: int, *,
                     failure_probability: float = 0.1,
                     force_resilience: int = -1, training: bool = True,
                     rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Returns a float mask [batch*num_views] with failed views zeroed
    (sample_mask_for_resilience models.py:2159-2183)."""
    rng = rng or np.random.RandomState()
    max_r = num_views if not training else resilience
    if force_resilience >= 0:
        n_failed = force_resilience
    else:
        n_failed = sample_num_failed(
            num_views, failure_probability, min(num_views - 1, max_r),
            training=training, rng=rng)
    alive = sorted(rng.choice(num_views, num_views - n_failed, replace=False))
    mask = np.zeros((batch, num_views), np.float32)
    mask[:, alive] = 1.0
    return mask.reshape(-1)


def apply_view_mask(x: jax.Array, mask: jax.Array) -> jax.Array:
    """x: [(B*V), H, W, C]; mask: [(B*V)]."""
    return x * mask[:, None, None, None]


# ---------------------------------------------------------------------------
# OLFT touch-ups
# ---------------------------------------------------------------------------

def replace_topk_pixels(recon: jax.Array, target: jax.Array, ratio: float):
    """Replace the ratio-largest-|error| elements of recon with target values
    (replace_elements models.py:2192-2235, in-graph). Returns (touched, delta)
    where delta = touched - recon (nonzero only at replaced positions)."""
    if ratio <= 0:
        return recon, jnp.zeros_like(recon)
    flat_r = recon.reshape(-1)
    flat_t = target.reshape(-1)
    diff = jnp.abs(flat_r - flat_t)
    k = max(1, int(ratio * flat_r.size))
    _, idx = jax.lax.top_k(diff, k)
    mask = jnp.zeros_like(flat_r).at[idx].set(1.0)
    touched = flat_r * (1.0 - mask) + flat_t * mask
    delta = (touched - flat_r).reshape(recon.shape)
    return touched.reshape(recon.shape), delta


def touchup_bits(delta: np.ndarray, use_compression: bool = True) -> int:
    """Host-side byte accounting for a touch-up delta: nonzero 8-bit deltas +
    position bitmap, zlib-compressed (models.py:2218-2229)."""
    mask = delta != 0
    if not use_compression:
        return int(mask.size)  # raw bytes fallback (models.py:2231-2233)
    payload = (delta[mask] * 255).astype(np.uint8).tobytes() + \
        np.packbits(mask.astype(np.uint8)).tobytes()
    return len(zlib.compress(payload))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

class AttnDecoder(nn.Module):
    """'-IA' decoder: Residual(ViewAttention) head + SSF deconv stack
    (models.py:2255-2276)."""

    out: int = 3
    num_views: int = 4
    use_attn: bool = True
    mid: int = 128

    @nn.compact
    def __call__(self, x):
        if self.use_attn:
            x = x + ViewAttention(x.shape[-1], num_views=self.num_views)(x)
        return SSFDecoder(mid=self.mid, out=self.out)(x)


class MCVC(nn.Module):
    config: CodecConfig
    planes: int = 192
    mid: int = 128
    sigma0: float = 1.5
    num_levels: int = 5
    scale_field_shift: float = 1.0
    use_attn: bool = True

    def setup(self):
        cfg = self.config
        # '-CTX': ContextVP causal entropy context over the view-token grid
        # refines the keyframe / residual coding distributions (the motion
        # latent is small — context cost there isn't worth it)
        ctx = dict(use_context=cfg.use_context_model,
                   context_views=max(cfg.num_views, 1))
        self.img_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.img_decoder = SSFDecoder(mid=self.mid, out=3)
        self.img_hyperprior = SSFHyperprior(self.planes, **ctx)
        self.motion_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.motion_decoder = SSFDecoder(mid=self.mid, out=3)
        self.motion_hyperprior = SSFHyperprior(self.planes)
        self.res_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.res_decoder = SSFDecoder(mid=self.mid, out=3)
        self.res_hyperprior = SSFHyperprior(self.planes, **ctx)
        if cfg.imbalanced_attention:
            self.backup_img_decoder = AttnDecoder(
                out=3, num_views=cfg.num_views, use_attn=self.use_attn)
            self.backup_res_decoder = AttnDecoder(
                out=3, num_views=cfg.num_views, use_attn=self.use_attn)

    def forward_keyframe(self, x, mask, *, training: bool, rng=None):
        """x: [(B*V),H,W,3]; mask: [(B*V)]. Returns (x_hat, enhanced, lk)."""
        x = apply_view_mask(x, mask)
        y = self.img_encoder(x)
        y_hat, lk, _ = self.img_hyperprior(y, None, training=training, rng=rng)
        x_hat = self.img_decoder(y_hat)
        if not self.config.imbalanced_attention:
            return x_hat, x_hat, {"keyframe": lk}
        enhanced = self.backup_img_decoder(apply_view_mask(y_hat, mask))
        return x_hat, enhanced, {"keyframe": lk}

    def forward_inter(self, x_cur, x_ref, mask, *, training: bool, rng=None):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)
        x_cur = apply_view_mask(x_cur, mask)
        x_ref = apply_view_mask(x_ref, mask)

        y_motion = self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=-1))
        y_motion_hat, motion_lk, _ = self.motion_hyperprior(
            y_motion, None, training=training, rng=r1)
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = forward_prediction(
            x_ref, motion_info, sigma0=self.sigma0,
            num_levels=self.num_levels, scale_field_shift=self.scale_field_shift)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lk, _ = self.res_hyperprior(y_res, None, training=training, rng=r2)
        x_res_hat = self.res_decoder(
            jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat

        lk = {"motion": motion_lk, "residual": res_lk}
        if not self.config.imbalanced_attention:
            return x_rec, x_rec, lk
        masked_cat = jnp.concatenate(
            [apply_view_mask(y_res_hat, mask), apply_view_mask(y_motion_hat, mask)],
            axis=-1)
        enhanced = x_pred + self.backup_res_decoder(masked_cat)
        return x_rec, enhanced, lk

    def __call__(self, frames, mask, *, training: bool, rng=None):
        """frames: [G, (B*V), H, W, 3]; mask: [(B*V)].
        Returns dict mirroring MCVC.forward (models.py:2297-2352):
        reconstructions (enhanced), references (raw decoder out), likelihoods.
        Frame loop is a python loop (G static and small) so the touch-up /
        detach semantics follow the reference exactly."""
        G = frames.shape[0]
        rngs = jax.random.split(rng, G) if rng is not None else [None] * G
        recons, refs, lks = [], [], []
        x_ref, enhanced, lk = self.forward_keyframe(
            frames[0], mask, training=training, rng=rngs[0])
        recons.append(enhanced)
        refs.append(x_ref)
        lks.append(lk)
        x_ref = jax.lax.stop_gradient(x_ref)
        for i in range(1, G):
            x_ref, enhanced, lk = self.forward_inter(
                frames[i], x_ref, mask, training=training, rng=rngs[i])
            recons.append(enhanced)
            refs.append(x_ref)
            lks.append(lk)
            x_ref = jax.lax.stop_gradient(x_ref)
        return {"x_hat": jnp.stack(recons), "x_ref": jnp.stack(refs),
                "likelihoods": lks, "mask": mask}


def mcvc_gop_metrics(frames, out, cfg: CodecConfig):
    """Per-GOP rate/distortion on surviving views only
    (train_multiview.py:186-191, 161-210)."""
    mask = out["mask"]
    alive = jnp.maximum(jnp.sum(mask), 1.0)
    x_hat = out["x_hat"]
    G, BV, H, W, _ = frames.shape
    m = mask[None, :, None, None, None]
    mse = jnp.sum(jnp.square((frames - x_hat) * m)) / (alive * G * H * W * 3)
    bits = 0.0
    for lk in out["likelihoods"]:
        if "keyframe" in lk:
            from fvc.ops.math import bits_from_likelihood
            bits = bits + bits_from_likelihood(lk["keyframe"]["y"]) \
                + bits_from_likelihood(lk["keyframe"]["z"])
        else:
            bpp, _ = inter_bpp_est(lk, 1, 1, 1)  # raw bits (denom 1)
            bits = bits + bpp
    bpp = bits / (alive * G * H * W)
    return {"mse": mse, "bpp_est": bpp,
            "psnr": 10.0 * jnp.log(1.0 / jnp.maximum(mse, 1e-12)) / jnp.log(10.0)}
