"""IterPredCodec — sequential P-frame codec family (DVC / RLVC / RLVC2).

Reference: IterPredVideoCodecs models.py:954-1051. Per frame:
SpyNet flow -> motion LatentCodec -> warp + WarpNet MC -> residual LatentCodec
-> recon = clip(res_hat + MC). RLVC* add ConvLSTM recurrence and recurrent
entropy; hidden states and prior latents chain across the GOP.

GOP coding is a `lax.scan` over frames (fvc.gop.engine), with the reference's
detach points preserved: recon carry, hidden states, and prior latents are
stop-gradiented between frames (models.py:1036, parallel_compression:353-366).

The 2-GPU `use_split` pipeline (models.py:976-980) is intentionally subsumed:
one pjit program with sharded activations replaces explicit device hops
(SURVEY §2.5 row 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from fvc.core.config import CodecConfig
from fvc.models.latent_codec import CoderState, LatentCodec
from fvc.ops.blocks import WarpNet
from fvc.ops.math import psnr
from fvc.ops.spynet import SpyNet
from fvc.ops.warp import flow_warp


@struct.dataclass
class IterPredState:
    mv: CoderState
    res: CoderState

    @staticmethod
    def zeros(batch, h, w, channels, dtype=jnp.float32):
        return IterPredState(
            mv=CoderState.zeros(batch, h, w, channels, dtype),
            res=CoderState.zeros(batch, h, w, channels, dtype),
        )


class IterPredCodec(nn.Module):
    """name in {DVC, RLVC, RLVC2}. DVC: factorized entropy, no recurrence."""

    config: CodecConfig

    def setup(self):
        cfg = self.config
        recurrent = cfg.name in ("RLVC", "RLVC2")
        entropy = {"DVC": "factorized", "RLVC": "rpm", "RLVC2": "rpm2"}[cfg.name]
        self.optic_flow = SpyNet()
        self.warpnet = WarpNet()
        self.mv_codec = LatentCodec(
            in_features=2, channels=cfg.channels, kernel=3,
            recurrent=recurrent, entropy=entropy)
        self.res_codec = LatentCodec(
            in_features=3, channels=cfg.channels, kernel=5,
            recurrent=recurrent, entropy=entropy)

    def __call__(self, x_ref, x_cur, state: IterPredState, rpm_flag,
                 *, training: bool, rng=None):
        """Code one P-frame. x_ref: previous reconstruction [B,H,W,3];
        x_cur: raw frame. Returns (recon, new_state, out)."""
        B, H, W, _ = x_cur.shape
        r_mv, r_res = jax.random.split(rng) if rng is not None else (None, None)

        mv = self.optic_flow(x_cur, x_ref)
        mv_hat, mv_state, mv_out = self.mv_codec(
            mv, state.mv, rpm_flag, training=training, rng=r_mv)

        warped = flow_warp(x_ref, mv_hat)
        mc = self.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped

        res = x_cur - mc
        res_hat, res_state, res_out = self.res_codec(
            res, state.res, rpm_flag, training=training, rng=r_res)

        recon = jnp.clip(res_hat + mc, 0.0, 1.0)

        denom = float(H * W) * B
        bpp_mv = mv_out["bits_est"] / denom
        bpp_res = res_out["bits_est"] / denom
        out = {
            "bpp_est": bpp_mv + bpp_res,
            "bpp_res": bpp_res,
            "bpp_mv": bpp_mv,
            "img_loss": jnp.mean(jnp.square(x_cur - recon)),
            "warp_loss": jnp.mean(jnp.square(x_cur - warped)),
            "mc_loss": jnp.mean(jnp.square(x_cur - mc)),
            "psnr": psnr(x_cur, recon),
            "flow": mv_hat,
            "mc_frame": mc,
        }
        return recon, IterPredState(mv=mv_state, res=res_state), out

    def init_state(self, batch: int, h: int, w: int) -> IterPredState:
        return IterPredState.zeros(batch, h, w, self.config.channels)
