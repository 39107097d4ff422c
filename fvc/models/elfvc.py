"""ELFVC / ELFVC-SP ("Vesper") — scale-space-flow with flow prediction and
super-precision latent prediction.

Reference: models.py:1866-2124. On top of SSF:
- `flow_predictor`: predicts motion_info from (x_ref, x_ref_ref,
  motion_info_prior) — 9 input channels, 4x k5 s1 convs (models.py:1903-1915,
  2087); the motion codec then codes only the *delta* against the prediction
  path (motion_info = motion_info_prior + decoded delta, models.py:2095-2096).
- motion encoder sees cat(x_cur, x_pred_local) (models.py:2091).
- super-precision ('-SP'): each hyperprior carries an SPnet predicting the
  unquantized latent from (rounded latent, previous rounded latent)
  (models.py:1975-1999); training adds pred-error norms (parallel_compression
  models.py:291-308), staged via sp_stage (optim_parameters models.py:2026-2078).

All cross-frame context (x_ref_ref, motion_info_prior, SP latent priors) lives
in an explicit `ELFVCState` pytree so the GOP codes under one `lax.scan`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from fvc.core.config import CodecConfig
from fvc.entropy.hyperprior import SSFHyperprior
from fvc.models.iframe import SSFDecoder, SSFEncoder
from fvc.models.ssf import forward_prediction, inter_bpp_est
from fvc.ops.conv import Conv
from fvc.ops.math import psnr


@struct.dataclass
class ELFVCState:
    x_ref_ref: jax.Array        # [B,H,W,3] reference-before-last
    motion_info_prior: jax.Array  # [B,H,W,3] previous decoded motion field
    q_prior_motion: jax.Array   # [B,H/16,W/16,P] SP rounded-latent chain
    q_prior_res: jax.Array

    @staticmethod
    def zeros(batch, h, w, planes=192, dtype=jnp.float32):
        return ELFVCState(
            x_ref_ref=jnp.zeros((batch, h, w, 3), dtype),
            motion_info_prior=jnp.zeros((batch, h, w, 3), dtype),
            q_prior_motion=jnp.zeros((batch, h // 16, w // 16, planes), dtype),
            q_prior_res=jnp.zeros((batch, h // 16, w // 16, planes), dtype),
        )


class FlowPredictor(nn.Module):
    """Initial-motion predictor (reference FlowPredictor, models.py:1903-1915:
    4x conv5 s1, mid 128). `half_res=True` evaluates the stack on a
    2x-downsampled grid and upsamples the result (flow channels scaled by 2,
    the scale-field channel untouched) — a 4x FLOP cut on the single most
    expensive stage of ELFVC (82% of its FLOPs at 2048x1024; the predictor's
    output is only a prior that the coded motion delta corrects)."""

    mid: int = 128
    half_res: bool = False
    # space-to-depth packing for the stride-1 conv5 stack (exact — see
    # fvc.ops.conv pack_s2d_weights): k=5 packs to k'=3 at 4x channels,
    # 1.44x structural-zero FLOPs for 512-deep MXU contractions instead of
    # 128 — the same transform that bought MEBasic 1.46x (ROUND4_NOTES).
    # Env FVC_ELFVC_S2D in {1,2} overrides (trace-time, like FVC_SPYNET_S2D).
    s2d_max: int = 2

    @nn.compact
    def __call__(self, x):
        import os

        if self.half_res:
            from fvc.ops.resize import avg_pool2
            x = avg_pool2(x)
        raw = os.environ.get("FVC_ELFVC_S2D", "")
        if raw and raw.strip() not in ("1", "2"):
            raise ValueError(f"FVC_ELFVC_S2D={raw!r}: accepted values are "
                             "1 or 2")
        r_max = int(raw) if raw else self.s2d_max
        r = 2 if (r_max >= 2 and x.shape[1] % 2 == 0
                  and x.shape[2] % 2 == 0) else 1
        if r > 1:
            from fvc.ops.conv import depth_to_space, space_to_depth
            x = space_to_depth(x, r)
        x = jax.nn.relu(Conv(self.mid, kernel=5, s2d=r)(x))
        x = jax.nn.relu(Conv(self.mid, kernel=5, s2d=r)(x))
        x = jax.nn.relu(Conv(self.mid, kernel=5, s2d=r)(x))
        x = Conv(3, kernel=5, s2d=r)(x)
        if r > 1:
            from fvc.ops.conv import depth_to_space
            x = depth_to_space(x, r)
        if self.half_res:
            from fvc.ops.resize import upsample2x
            x = upsample2x(x, align_corners=False)
            x = jnp.concatenate([x[..., :2] * 2.0, x[..., 2:]], axis=-1)
        return x


class ELFVC(nn.Module):
    config: CodecConfig
    planes: int = 192
    mid: int = 128
    sigma0: float = 1.5
    num_levels: int = 5
    scale_field_shift: float = 1.0

    def setup(self):
        sp = self.config.super_precision
        stage = self.config.sp_stage
        self.flow_predictor = FlowPredictor(
            half_res=self.config.flow_pred_half_res)
        self.motion_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.motion_decoder = SSFDecoder(mid=self.mid, out=3)
        self.motion_hyperprior = SSFHyperprior(
            self.planes, super_prec=sp, sp_active=sp and stage >= 1)
        self.res_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.res_decoder = SSFDecoder(mid=self.mid, out=3)
        self.res_hyperprior = SSFHyperprior(
            self.planes, super_prec=sp, sp_active=sp and stage >= 2)
        # keyframe branch (shared learned I-codec path)
        self.img_encoder = SSFEncoder(mid=self.mid, out=self.planes)
        self.img_decoder = SSFDecoder(mid=self.mid, out=3)
        self.img_hyperprior = SSFHyperprior(self.planes)

    def forward_keyframe(self, x, *, training: bool, rng=None):
        y = self.img_encoder(x)
        y_hat, lk, _ = self.img_hyperprior(y, None, training=training, rng=rng)
        return self.img_decoder(y_hat), {"keyframe": lk}

    def forward_inter(self, x_cur, x_ref, state: ELFVCState, *,
                      training: bool, rng=None):
        r1, r2 = jax.random.split(rng) if rng is not None else (None, None)

        # flow initial prediction from past two refs + previous motion
        motion_local = self.flow_predictor(jnp.concatenate(
            [x_ref, state.x_ref_ref, state.motion_info_prior], axis=-1))
        x_pred_local = forward_prediction(
            x_ref, motion_local, sigma0=self.sigma0,
            num_levels=self.num_levels, scale_field_shift=self.scale_field_shift)

        # code motion against the local prediction
        y_motion = self.motion_encoder(
            jnp.concatenate([x_cur, x_pred_local], axis=-1))
        y_motion_hat, motion_lk, q_motion = self.motion_hyperprior(
            y_motion, state.q_prior_motion, training=training, rng=r1)

        # decoded field is a DELTA on the prior motion (models.py:2095-2096)
        motion_delta = self.motion_decoder(y_motion_hat)
        motion_info = state.motion_info_prior + motion_delta
        x_pred = forward_prediction(
            x_ref, motion_info, sigma0=self.sigma0,
            num_levels=self.num_levels, scale_field_shift=self.scale_field_shift)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_lk, q_res = self.res_hyperprior(
            y_res, state.q_prior_res, training=training, rng=r2)
        x_res_hat = self.res_decoder(
            jnp.concatenate([y_res_hat, y_motion_hat], axis=-1))
        x_rec = x_pred + x_res_hat

        new_state = ELFVCState(
            x_ref_ref=jax.lax.stop_gradient(x_ref),
            motion_info_prior=jax.lax.stop_gradient(motion_info),
            q_prior_motion=jax.lax.stop_gradient(q_motion)
            if q_motion is not None else state.q_prior_motion,
            q_prior_res=jax.lax.stop_gradient(q_res)
            if q_res is not None else state.q_prior_res,
        )

        pred_err = [lk["pred_err_y"] for lk in (motion_lk, res_lk)
                    if lk["pred_err_y"] is not None]
        q_err = [lk["Q_err_y"] for lk in (motion_lk, res_lk)]
        likelihoods = {"motion": motion_lk, "residual": res_lk,
                       "pred_err": pred_err, "Q_err": q_err}
        return x_rec, new_state, likelihoods

    def __call__(self, x_cur, x_ref, state: ELFVCState, *, training: bool, rng=None):
        return self.forward_inter(x_cur, x_ref, state, training=training, rng=rng)

    def init_state(self, batch, h, w):
        return ELFVCState.zeros(batch, h, w, self.planes)


def elfvc_frame_metrics(x_cur, x_rec, likelihoods, sp_norm_ord: int = 2):
    """Per-frame losses mirroring parallel_compression's ELFVC path
    (models.py:274-308): rate from motion+residual y/z, pred/Q error norms."""
    B, H, W, _ = x_cur.shape
    bpp, bpp_res = inter_bpp_est(likelihoods, B, H, W)
    mse = jnp.mean(jnp.square(x_cur - x_rec))
    pred_norm = sum(jnp.linalg.norm(e.reshape(-1), ord=sp_norm_ord)
                    for e in likelihoods["pred_err"]) if likelihoods["pred_err"] else 0.0
    q_norm = sum(jnp.linalg.norm(e.reshape(-1), ord=sp_norm_ord)
                 for e in likelihoods["Q_err"])
    return {"bpp_est": bpp, "bpp_res": bpp_res, "img_loss": mse,
            "psnr": psnr(x_cur, x_rec), "pred_norm": pred_norm, "q_norm": q_norm}
