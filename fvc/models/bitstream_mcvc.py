"""Real-bitstream encode/decode for MCVC (multi-camera).

Same stream layout as the SSF family (keyframe + per-frame motion/residual);
the view-failure mask is transmission side-info (which cameras were up), and
the '-IA' backup decoders consume the SAME decoded latents — resilient
reconstruction costs no extra rate (models.py:2354-2400). decompress returns
both the primary and the backup ("enhanced") reconstructions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.coder import RansCoder
from fvc.entropy.gaussian import build_indexes, gaussian_cdf_tables
from fvc.models.mcvc import apply_view_mask


def _eb_round(eb, z):
    med = eb.medians()
    return jnp.round(z - med) + med


class MCVCBitstreamCodec:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        planes = model.planes
        self.g_coder = RansCoder(*gaussian_cdf_tables())
        self.eb = {}
        p = variables["params"]
        for br in ("img_hyperprior", "motion_hyperprior", "res_hyperprior"):
            eb = EntropyBottleneck(planes)
            sub = {"params": p[br]["entropy_bottleneck"]}
            self.eb[br] = (RansCoder(*eb.cdf_tables(sub)),
                           np.asarray(sub["params"]["quantiles"])[:, 0, 1])

        ia = model.config.imbalanced_attention

        def collect(m, frames, mask):
            from fvc.models.ssf import forward_prediction

            def hp(m_hp, y):
                z = m_hp.encode_z(y)
                z_hat = _eb_round(m_hp.entropy_bottleneck, z)
                s, mu = m_hp.params_from_z(z_hat)
                return z_hat, jnp.round(y - mu), s, jnp.round(y - mu) + mu

            x0 = apply_view_mask(frames[0], mask)
            y0 = m.img_encoder(x0)
            z0, y0_sym, s0, y0_hat = hp(m.img_hyperprior, y0)
            x_ref = m.img_decoder(y0_hat)

            def step(x_ref, x_cur):
                x_cur = apply_view_mask(x_cur, mask)
                x_ref_m = apply_view_mask(x_ref, mask)
                y_m = m.motion_encoder(jnp.concatenate([x_cur, x_ref_m], -1))
                z_m, ym_sym, sm, y_m_hat = hp(m.motion_hyperprior, y_m)
                motion_info = m.motion_decoder(y_m_hat)
                x_pred = forward_prediction(
                    x_ref_m, motion_info, sigma0=m.sigma0,
                    num_levels=m.num_levels,
                    scale_field_shift=m.scale_field_shift)
                y_r = m.res_encoder(x_cur - x_pred)
                z_r, yr_sym, sr, y_r_hat = hp(m.res_hyperprior, y_r)
                x_rec = x_pred + m.res_decoder(
                    jnp.concatenate([y_r_hat, y_m_hat], -1))
                lat = {"z_m": z_m, "ym_sym": ym_sym, "sm": sm,
                       "z_r": z_r, "yr_sym": yr_sym, "sr": sr,
                       "recon": x_rec}
                return x_rec, lat

            _, lats = jax.lax.scan(step, x_ref, frames[1:])
            return {"key": {"z": z0, "y_sym": y0_sym, "sigma": s0},
                    "x0_hat": x_ref, "inter": lats}

        def key_decode(m, z_hat, y_sym, mask):
            _, mu = m.img_hyperprior.params_from_z(z_hat)
            y_hat = y_sym + mu
            x_hat = m.img_decoder(y_hat)
            if ia:
                enhanced = m.backup_img_decoder(apply_view_mask(y_hat, mask))
            else:
                enhanced = x_hat
            return x_hat, enhanced

        def inter_decode(m, x_ref, z_m, ym_sym, z_r, yr_sym, mask):
            from fvc.models.ssf import forward_prediction
            x_ref_m = apply_view_mask(x_ref, mask)
            _, mum = m.motion_hyperprior.params_from_z(z_m)
            y_m_hat = ym_sym + mum
            motion_info = m.motion_decoder(y_m_hat)
            x_pred = forward_prediction(
                x_ref_m, motion_info, sigma0=m.sigma0,
                num_levels=m.num_levels,
                scale_field_shift=m.scale_field_shift)
            _, mur = m.res_hyperprior.params_from_z(z_r)
            y_r_hat = yr_sym + mur
            x_rec = x_pred + m.res_decoder(
                jnp.concatenate([y_r_hat, y_m_hat], -1))
            if ia:
                cat = jnp.concatenate([apply_view_mask(y_r_hat, mask),
                                       apply_view_mask(y_m_hat, mask)], -1)
                enhanced = x_pred + m.backup_res_decoder(cat)
            else:
                enhanced = x_rec
            return x_rec, enhanced

        def params(m, branch, z):
            hp = getattr(m, branch)
            return hp.params_from_z(z)

        ap = model.apply
        self._collect = jax.jit(lambda v, f, k: ap(v, f, k, method=collect))
        self._key_decode = jax.jit(
            lambda v, *a: ap(v, *a, method=key_decode))
        self._inter_decode = jax.jit(
            lambda v, *a: ap(v, *a, method=inter_decode))
        self._params = {
            br: jax.jit(lambda v, z, br=br: ap(v, br, z, method=params))
            for br in ("img_hyperprior", "motion_hyperprior", "res_hyperprior")}

    def _enc(self, branch, z_hat, y_sym, sigma):
        coder, med = self.eb[branch]
        C = z_hat.shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), z_hat.shape))
        return {"z": coder.encode_with_indexes(
                    np.round(np.asarray(z_hat) - med).astype(np.int32), idx),
                "y": self.g_coder.encode_with_indexes(
                    np.asarray(y_sym).astype(np.int32),
                    np.asarray(build_indexes(jnp.asarray(sigma))))}

    def _dec_z(self, branch, data, shape):
        coder, med = self.eb[branch]
        C = shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), shape))
        return jnp.asarray(
            coder.decode_with_indexes(data, idx).astype(np.float32) + med)

    def compress(self, frames, mask) -> Tuple[dict, dict]:
        """frames: [G, (B*V), H, W, 3]; mask: [(B*V)] surviving-view mask."""
        lat = self._collect(self.variables, jnp.asarray(frames),
                            jnp.asarray(mask))
        streams = {"key": self._enc("img_hyperprior", lat["key"]["z"],
                                    lat["key"]["y_sym"], lat["key"]["sigma"]),
                   "inter": []}
        for k in range(frames.shape[0] - 1):
            it = lat["inter"]
            streams["inter"].append({
                "motion": self._enc("motion_hyperprior", it["z_m"][k],
                                    it["ym_sym"][k], it["sm"][k]),
                "res": self._enc("res_hyperprior", it["z_r"][k],
                                 it["yr_sym"][k], it["sr"][k])})
        info = {"z_shape": np.asarray(lat["key"]["z"]).shape,
                "x0_hat": np.asarray(lat["x0_hat"]),
                "recons": np.asarray(lat["inter"]["recon"]), "mask": np.asarray(mask)}
        return streams, info

    def decompress(self, streams, info):
        mask = jnp.asarray(info["mask"])
        z_shape = info["z_shape"]
        z0 = self._dec_z("img_hyperprior", streams["key"]["z"], z_shape)
        s0, _ = self._params["img_hyperprior"](self.variables, z0)
        y0 = self.g_coder.decode_with_indexes(
            streams["key"]["y"], np.asarray(build_indexes(s0)))
        x_ref, enhanced0 = self._key_decode(
            self.variables, z0, jnp.asarray(y0.astype(np.float32)), mask)
        recons, enhanced = [], [np.asarray(enhanced0)]
        for s in streams["inter"]:
            z_m = self._dec_z("motion_hyperprior", s["motion"]["z"], z_shape)
            sm, _ = self._params["motion_hyperprior"](self.variables, z_m)
            ym = self.g_coder.decode_with_indexes(
                s["motion"]["y"], np.asarray(build_indexes(sm)))
            z_r = self._dec_z("res_hyperprior", s["res"]["z"], z_shape)
            sr, _ = self._params["res_hyperprior"](self.variables, z_r)
            yr = self.g_coder.decode_with_indexes(
                s["res"]["y"], np.asarray(build_indexes(sr)))
            x_ref, enh = self._inter_decode(
                self.variables, x_ref, z_m,
                jnp.asarray(ym.astype(np.float32)), z_r,
                jnp.asarray(yr.astype(np.float32)), mask)
            recons.append(np.asarray(x_ref))
            enhanced.append(np.asarray(enh))
        return np.stack(recons), np.stack(enhanced)

    @staticmethod
    def num_bits(streams) -> int:
        total = sum(len(v) for v in streams["key"].values())
        for s in streams["inter"]:
            total += sum(len(v) for br in s.values() for v in br.values())
        return 8 * total
