"""Real-bitstream encode/decode for the scale-space-flow family (SSF base —
shared by ELFVC and MCVC inter coding).

Stream layout per GOP (compressai ssf2020's compress/decompress contract,
which the reference invokes for SSF/MCVC):
  keyframe:  z_img (factorized EB tables) + y_img (Gaussian, scale-indexed)
  per frame: z_motion + y_motion, z_res + y_res

Encoder: one device scan yields every rounded latent and its (sigma, mu);
host codes all streams. Decoder: per frame, host decodes z, the device
recomputes (scales, means) via `SSFHyperprior.params_from_z`, host decodes y,
the device runs the synthesis/warp step — the same device/host alternation as
the RLVC path but with only a z-sized transfer per stage.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.coder import RansCoder
from fvc.entropy.gaussian import build_indexes, gaussian_cdf_tables


def _eb_coder(variables, path: List[str], planes: int):
    p = variables["params"]
    for k in path:
        p = p[k]
    eb = EntropyBottleneck(planes)
    coder = RansCoder(*eb.cdf_tables({"params": p}))
    medians = np.asarray(p["quantiles"])[:, 0, 1]
    return coder, medians


class SSFBitstreamCodec:
    """Real coding for fvc.models.ssf.ScaleSpaceFlow."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        planes = model.planes
        self.g_coder = RansCoder(*gaussian_cdf_tables())
        self.eb = {}
        for branch in ("img_hyperprior", "motion_hyperprior", "res_hyperprior"):
            self.eb[branch] = _eb_coder(
                variables, [branch, "entropy_bottleneck"], planes)

        def collect(m, frames):
            """frames: [T, B, H, W, 3] raw. Returns latents for all streams."""
            def key(x):
                y = m.img_encoder(x)
                z = m.img_hyperprior.encode_z(y)
                z_hat = _eb_round(m.img_hyperprior.entropy_bottleneck, z)
                scales, means = m.img_hyperprior.params_from_z(z_hat)
                y_hat = jnp.round(y - means) + means
                x_hat = m.img_decoder(y_hat)
                return x_hat, {"z": z_hat, "y_sym": jnp.round(y - means),
                               "sigma": scales, "mu": means}

            def inter(x_cur, x_ref):
                y_m = m.motion_encoder(jnp.concatenate([x_cur, x_ref], -1))
                z_m = m.motion_hyperprior.encode_z(y_m)
                z_m_hat = _eb_round(m.motion_hyperprior.entropy_bottleneck, z_m)
                s_m, mu_m = m.motion_hyperprior.params_from_z(z_m_hat)
                y_m_hat = jnp.round(y_m - mu_m) + mu_m

                from fvc.models.ssf import forward_prediction
                motion_info = m.motion_decoder(y_m_hat)
                x_pred = forward_prediction(
                    x_ref, motion_info, sigma0=m.sigma0,
                    num_levels=m.num_levels,
                    scale_field_shift=m.scale_field_shift)
                x_res = x_cur - x_pred
                y_r = m.res_encoder(x_res)
                z_r = m.res_hyperprior.encode_z(y_r)
                z_r_hat = _eb_round(m.res_hyperprior.entropy_bottleneck, z_r)
                s_r, mu_r = m.res_hyperprior.params_from_z(z_r_hat)
                y_r_hat = jnp.round(y_r - mu_r) + mu_r
                x_rec = x_pred + m.res_decoder(
                    jnp.concatenate([y_r_hat, y_m_hat], -1))
                lat = {"z_m": z_m_hat, "ym_sym": jnp.round(y_m - mu_m),
                       "sm": s_m, "mum": mu_m,
                       "z_r": z_r_hat, "yr_sym": jnp.round(y_r - mu_r),
                       "sr": s_r, "mur": mu_r}
                return x_rec, lat

            x0_hat, key_lat = key(frames[0])

            def scan_fn(x_ref, x_cur):
                x_rec, lat = inter(x_cur, x_ref)
                return x_rec, (lat, x_rec)

            _, (inter_lat, recons) = jax.lax.scan(scan_fn, x0_hat, frames[1:])
            return {"key": key_lat, "inter": inter_lat,
                    "x0_hat": x0_hat, "recons": recons}

        def key_decode(m, z_hat, y_sym):
            scales, means = m.img_hyperprior.params_from_z(z_hat)
            return m.img_decoder(y_sym + means)

        def key_params(m, z_hat):
            return m.img_hyperprior.params_from_z(z_hat)

        def motion_params(m, z_hat):
            return m.motion_hyperprior.params_from_z(z_hat)

        def res_params(m, z_hat):
            return m.res_hyperprior.params_from_z(z_hat)

        def inter_decode(m, x_ref, y_m_hat, y_r_hat):
            from fvc.models.ssf import forward_prediction
            motion_info = m.motion_decoder(y_m_hat)
            x_pred = forward_prediction(
                x_ref, motion_info, sigma0=m.sigma0, num_levels=m.num_levels,
                scale_field_shift=m.scale_field_shift)
            return x_pred + m.res_decoder(
                jnp.concatenate([y_r_hat, y_m_hat], -1))

        ap = model.apply
        self._collect = jax.jit(lambda v, f: ap(v, f, method=collect))
        self._key_params = jax.jit(lambda v, z: ap(v, z, method=key_params))
        self._motion_params = jax.jit(lambda v, z: ap(v, z, method=motion_params))
        self._res_params = jax.jit(lambda v, z: ap(v, z, method=res_params))
        self._img_decode = jax.jit(
            lambda v, z, y: ap(v, z, y, method=key_decode))
        self._inter_decode = jax.jit(
            lambda v, a, b, c: ap(v, a, b, c, method=inter_decode))

    # ------------------------------------------------------------------

    def _encode_branch(self, branch, z_hat, y_sym, sigma):
        coder, medians = self.eb[branch]
        C = z_hat.shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), z_hat.shape))
        z_stream = coder.encode_with_indexes(
            np.round(z_hat - medians).astype(np.int32), idx)
        y_stream = self.g_coder.encode_with_indexes(
            np.asarray(y_sym).astype(np.int32),
            np.asarray(build_indexes(jnp.asarray(sigma))))
        return {"z": z_stream, "y": y_stream}

    def _decode_z(self, branch, data: bytes, shape):
        coder, medians = self.eb[branch]
        C = shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), shape))
        sym = coder.decode_with_indexes(data, idx)
        return jnp.asarray(sym.astype(np.float32) + medians)

    def compress(self, frames) -> Tuple[dict, dict]:
        lat = self._collect(self.variables, jnp.asarray(frames))
        key = lat["key"]
        streams = {"key": self._encode_branch(
            "img_hyperprior", np.asarray(key["z"]), key["y_sym"], key["sigma"])}
        inter = lat["inter"]
        T1 = frames.shape[0] - 1
        streams["inter"] = []
        for k in range(T1):
            streams["inter"].append({
                "motion": self._encode_branch(
                    "motion_hyperprior", np.asarray(inter["z_m"][k]),
                    inter["ym_sym"][k], inter["sm"][k]),
                "res": self._encode_branch(
                    "res_hyperprior", np.asarray(inter["z_r"][k]),
                    inter["yr_sym"][k], inter["sr"][k]),
            })
        info = {"z_shape": np.asarray(key["z"]).shape,
                "recons": np.asarray(lat["recons"]),
                "x0_hat": np.asarray(lat["x0_hat"])}
        return streams, info

    def decompress(self, streams, info):
        z_shape = info["z_shape"]
        # keyframe
        z_hat = self._decode_z("img_hyperprior", streams["key"]["z"], z_shape)
        scales, means = self._key_params(self.variables, z_hat)
        y_sym = self.g_coder.decode_with_indexes(
            streams["key"]["y"], np.asarray(build_indexes(scales)))
        x_ref = self._img_decode(
            self.variables, z_hat, jnp.asarray(y_sym.astype(np.float32)))
        recons = []
        for s in streams["inter"]:
            z_m = self._decode_z("motion_hyperprior", s["motion"]["z"], z_shape)
            sm, mum = self._motion_params(self.variables, z_m)
            ym = self.g_coder.decode_with_indexes(
                s["motion"]["y"], np.asarray(build_indexes(sm)))
            y_m_hat = jnp.asarray(ym.astype(np.float32)) + mum
            z_r = self._decode_z("res_hyperprior", s["res"]["z"], z_shape)
            sr, mur = self._res_params(self.variables, z_r)
            yr = self.g_coder.decode_with_indexes(
                s["res"]["y"], np.asarray(build_indexes(sr)))
            y_r_hat = jnp.asarray(yr.astype(np.float32)) + mur
            x_ref = self._inter_decode(self.variables, x_ref, y_m_hat, y_r_hat)
            recons.append(np.asarray(x_ref))
        return np.asarray(info["x0_hat"]), np.stack(recons)

    @staticmethod
    def num_bits(streams) -> int:
        total = sum(len(v) for v in streams["key"].values())
        for s in streams["inter"]:
            total += sum(len(v) for br in s.values() for v in br.values())
        return 8 * total


def _eb_round(eb: EntropyBottleneck, z):
    """Eval-mode EB quantization: round around the channel medians."""
    med = eb.medians()
    return jnp.round(z - med) + med
