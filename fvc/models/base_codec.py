"""Base codec (-EC / -ER variants) — quantization-error-modeling experiments.

Reference: Base, models.py:1550-1835. A single-reference DVC-style codec
(SpyNet + mv AE + WarpNet MC + residual AE + hyperprior sigma) with two
enhancements:

- '-EC' error concealment: the hyper decoder emits 2x channels; the second half
  becomes a sigmoid(-)-0.5 feature correction concatenated into the residual
  decoder input (models.py:1562-1570, 1687-1691, 1702-1706).
- '-ER' error modeling: generator stacks (CodecNet 4x k5 conv + GDN, residual)
  predict the pre-quantization latent from the rounded latent for mv / residual
  / hyper z; decoding uses latent + predicted-error, with a soft2hard training
  schedule (s2h_stage) that progressively swaps in hard-rounded inputs
  (models.py:1635-1704). detachMode=[0,1] semantics preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from fvc.core.config import CodecConfig, OUT_CHANNEL_M, OUT_CHANNEL_N, OUT_CHANNEL_MV
from fvc.entropy.bitparm import BitEstimator
from fvc.models.lsvc import (
    MVAnalysis, MVSynthesis, PriorAnalysis, PriorSynthesis, ResAnalysis,
    ResSynthesis,
)
from fvc.ops.blocks import WarpNet
from fvc.ops.conv import Conv
from fvc.ops.gdn import GDN
from fvc.ops.math import (
    bits_from_likelihood, laplace_interval_likelihood, psnr, quantize,
)
from fvc.ops.spynet import SpyNet
from fvc.ops.warp import flow_warp


class GenNet(nn.Module):
    """Error-modeling generator: 4x (k5 conv + GDN), residual add
    (CodecNet config at models.py:1588-1590 with act_func=4 ⇒ GDN)."""

    channels: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        h = x
        h = GDN()(Conv(self.hidden, kernel=5)(h))
        h = GDN()(Conv(self.hidden, kernel=5)(h))
        h = GDN()(Conv(self.hidden, kernel=5)(h))
        h = GDN()(Conv(self.channels, kernel=5, zero_init=True)(h))
        return h + x  # residualER=True; starts as identity (see Conv.zero_init)


class BaseCodec(nn.Module):
    config: CodecConfig

    def setup(self):
        cfg = self.config
        self.use_ec = "-EC" in cfg.name
        self.use_er = "-ER" in cfg.name
        self.optic_flow = SpyNet()
        self.mv_encoder = MVAnalysis(channels=OUT_CHANNEL_MV)
        self.mv_decoder = MVSynthesis(channels=OUT_CHANNEL_MV)
        self.warpnet = WarpNet()
        self.bit_estimator_mv = BitEstimator(OUT_CHANNEL_MV)
        self.res_encoder = ResAnalysis(out_channels=OUT_CHANNEL_M)
        self.res_decoder = ResSynthesis(
            in_channels=OUT_CHANNEL_M * 2 if self.use_ec else OUT_CHANNEL_M)
        self.prior_encoder = PriorAnalysis()
        self.prior_decoder = PriorSynthesis(
            out_channels=OUT_CHANNEL_M * 2 if self.use_ec else OUT_CHANNEL_M)
        self.bit_estimator_z = BitEstimator(OUT_CHANNEL_N)
        if self.use_er:
            self.mv_gen = GenNet(OUT_CHANNEL_MV, 192)
            self.res_gen = GenNet(OUT_CHANNEL_M, 128)
            self.prior_gen = GenNet(OUT_CHANNEL_N, 128)

    def _er_correct(self, gen, latent, s2h_stage, training):
        """pred = gen(round(latent)); corrected = latent + stopgrad(pred - stopgrad(latent)).
        detachMode=[0,1]: both the target and the applied error are detached."""
        pred = gen(jnp.round(latent))
        pred_err = pred - jax.lax.stop_gradient(latent)
        corrected = latent + jax.lax.stop_gradient(pred_err)
        return corrected, pred_err

    def __call__(self, x_cur, x_ref, *, training: bool, rng=None,
                 s2h_stage: int = 0):
        cfg = self.config
        B, H, W, _ = x_cur.shape
        r1, r2, r3 = (jax.random.split(rng, 3) if rng is not None
                      else (None, None, None))

        # motion
        estmv = self.optic_flow(x_cur, x_ref)
        mvfeat = self.mv_encoder(estmv)
        quant_mv = quantize(mvfeat, training, r1)
        if self.use_er:
            corrected_mv, pred_err_mv = self._er_correct(
                self.mv_gen, mvfeat, s2h_stage, training)
            dec_in = jnp.round(mvfeat) if (training and s2h_stage > 0) else corrected_mv
            mv_up = self.mv_decoder(dec_in)
        else:
            pred_err_mv = None
            mv_up = self.mv_decoder(quant_mv)

        warped = flow_warp(x_ref, mv_up)
        prediction = self.warpnet(
            jnp.concatenate([warped, x_ref], axis=-1)) + warped
        if training and self.use_er and s2h_stage > 1:
            prediction = jax.lax.stop_gradient(prediction)

        # residual + hyperprior
        res = x_cur - prediction
        feat = self.res_encoder(res)
        quant_feat = quantize(feat, training, r2)
        z = self.prior_encoder(feat)
        quant_z = quantize(z, training, r3)

        if self.use_er:
            corrected_z, pred_err_z = self._er_correct(
                self.prior_gen, z, s2h_stage, training)
            z_dec_in = jnp.round(z) if (training and s2h_stage > 1) else corrected_z
            sigma_out = self.prior_decoder(z_dec_in)
        else:
            pred_err_z = None
            sigma_out = self.prior_decoder(quant_z)

        if self.use_ec:
            sigma, correction = jnp.split(sigma_out, 2, axis=-1)
            correction = jax.nn.sigmoid(correction) - 0.5
        else:
            sigma = sigma_out

        if self.use_er:
            corrected_feat, pred_err_feat = self._er_correct(
                self.res_gen, feat, s2h_stage, training)
            res_dec_in = jnp.round(feat) if (training and s2h_stage > 1) else corrected_feat
        else:
            pred_err_feat = None
            res_dec_in = quant_feat
        if self.use_ec:
            res_dec_in = jnp.concatenate([res_dec_in, correction], axis=-1)
        recon_res = self.res_decoder(res_dec_in)

        recon = prediction + recon_res
        clipped = jnp.clip(recon, 0.0, 1.0)

        # rate
        bits_feat = bits_from_likelihood(
            laplace_interval_likelihood(quant_feat, sigma))
        p_z = self.bit_estimator_z(quant_z + 0.5) - self.bit_estimator_z(quant_z - 0.5)
        p_mv = self.bit_estimator_mv(quant_mv + 0.5) - self.bit_estimator_mv(quant_mv - 0.5)
        denom = float(B * H * W)
        bpp_feature = bits_feat / denom
        bpp_z = bits_from_likelihood(p_z) / denom
        bpp_mv = bits_from_likelihood(p_mv) / denom

        q_err = (jnp.mean(jnp.abs(mvfeat - jnp.round(mvfeat)))
                 + jnp.mean(jnp.abs(feat - jnp.round(feat)))
                 + jnp.mean(jnp.abs(z - jnp.round(z))))
        pred_err = 0.0
        if self.use_er:
            pred_err = sum(jnp.mean(jnp.abs(e))
                           for e in (pred_err_mv, pred_err_feat, pred_err_z))

        out = {
            "img_loss": jnp.mean(jnp.square(recon - x_cur)),
            "inter_loss": jnp.mean(jnp.square(prediction - x_cur)),
            "bpp_feature": bpp_feature, "bpp_z": bpp_z, "bpp_mv": bpp_mv,
            "bpp_est": bpp_feature + bpp_z + bpp_mv,
            "q_err": q_err, "pred_err": pred_err,
            "psnr": psnr(x_cur, clipped),
        }
        return clipped, out
