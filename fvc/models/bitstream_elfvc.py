"""Real-bitstream encode/decode for ELFVC / ELFVC-SP ("Vesper").

Extends the SSF stream layout with ELFVC's cross-frame state (models.py:2080-2124):
- flow_predictor runs on (x_ref, x_ref_ref, motion_info_prior) — all decoder
  state, so both sides compute it identically;
- the decoded motion field is a DELTA on motion_info_prior;
- super-precision: the streams still carry round(y - mu); the decoder rebuilds
  SPnet's prediction from (round_y, q_prior chain) and substitutes it for y_hat
  when sp is active (Hyperprior.forward models.py:1988-1997) — fully
  deterministic from decoded values, hence decodable.

Per-frame device/host alternation as in bitstream_rlvc: the scan-free decoder
steps are small jitted programs; the host rANS-codes between them.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.bottleneck import EntropyBottleneck
from fvc.entropy.coder import RansCoder
from fvc.entropy.gaussian import build_indexes, gaussian_cdf_tables
from fvc.models.elfvc import ELFVCState


def _eb_round(eb, z):
    med = eb.medians()
    return jnp.round(z - med) + med


def _hp_encode(m_hp, y, q_prior, sp_active):
    """Mirror SSFHyperprior eval forward, returning codable pieces."""
    z = m_hp.encode_z(y)
    z_hat = _eb_round(m_hp.entropy_bottleneck, z)
    scales, means = m_hp.params_from_z(z_hat)
    round_y = jnp.round(y - means)
    y_hat = round_y + means
    new_q = q_prior
    if m_hp.super_prec:
        if q_prior is None:
            q_prior = jnp.zeros_like(y)
        pred = m_hp.y_predictor(jnp.concatenate([round_y, q_prior], axis=-1))
        pred_y = pred + round_y + means
        if sp_active:
            y_hat = pred_y
        new_q = round_y
    return {"z_hat": z_hat, "y_sym": round_y, "sigma": scales, "mu": means,
            "y_hat": y_hat, "q_next": new_q}


def _hp_decode(m_hp, z_hat, y_sym, q_prior, sp_active):
    scales, means = m_hp.params_from_z(z_hat)
    round_y = y_sym
    y_hat = round_y + means
    new_q = q_prior
    if m_hp.super_prec:
        if q_prior is None:
            q_prior = jnp.zeros_like(y_sym)
        pred = m_hp.y_predictor(jnp.concatenate([round_y, q_prior], axis=-1))
        pred_y = pred + round_y + means
        if sp_active:
            y_hat = pred_y
        new_q = round_y
    return y_hat, new_q


class ELFVCBitstreamCodec:
    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self.sp = model.config.super_precision
        stage = model.config.sp_stage
        self.motion_sp = self.sp and stage >= 1
        self.res_sp = self.sp and stage >= 2
        planes = model.planes
        self.g_coder = RansCoder(*gaussian_cdf_tables())
        self.eb = {}
        p = variables["params"]
        for br in ("motion_hyperprior", "res_hyperprior"):
            eb = EntropyBottleneck(planes)
            sub = {"params": p[br]["entropy_bottleneck"]}
            self.eb[br] = (RansCoder(*eb.cdf_tables(sub)),
                           np.asarray(sub["params"]["quantiles"])[:, 0, 1])

        motion_sp, res_sp = self.motion_sp, self.res_sp

        def collect(m, frames, state):
            from fvc.models.ssf import forward_prediction

            def step(carry, x_cur):
                x_ref, st = carry
                motion_local = m.flow_predictor(jnp.concatenate(
                    [x_ref, st.x_ref_ref, st.motion_info_prior], axis=-1))
                x_pred_local = forward_prediction(
                    x_ref, motion_local, sigma0=m.sigma0,
                    num_levels=m.num_levels,
                    scale_field_shift=m.scale_field_shift)
                y_m = m.motion_encoder(
                    jnp.concatenate([x_cur, x_pred_local], axis=-1))
                mo = _hp_encode(m.motion_hyperprior, y_m,
                                st.q_prior_motion if m.motion_hyperprior.super_prec else None,
                                motion_sp)
                motion_delta = m.motion_decoder(mo["y_hat"])
                motion_info = st.motion_info_prior + motion_delta
                x_pred = forward_prediction(
                    x_ref, motion_info, sigma0=m.sigma0,
                    num_levels=m.num_levels,
                    scale_field_shift=m.scale_field_shift)
                y_r = m.res_encoder(x_cur - x_pred)
                re = _hp_encode(m.res_hyperprior, y_r,
                                st.q_prior_res if m.res_hyperprior.super_prec else None,
                                res_sp)
                x_rec = x_pred + m.res_decoder(
                    jnp.concatenate([re["y_hat"], mo["y_hat"]], axis=-1))
                new_st = ELFVCState(
                    x_ref_ref=x_ref, motion_info_prior=motion_info,
                    q_prior_motion=mo["q_next"] if mo["q_next"] is not None else st.q_prior_motion,
                    q_prior_res=re["q_next"] if re["q_next"] is not None else st.q_prior_res)
                lat = {"z_m": mo["z_hat"], "ym_sym": mo["y_sym"],
                       "sm": mo["sigma"],
                       "z_r": re["z_hat"], "yr_sym": re["y_sym"],
                       "sr": re["sigma"], "recon": x_rec}
                return (x_rec, new_st), lat

            (_, _), lats = jax.lax.scan(step, (frames[0], state), frames[1:])
            return lats

        def motion_params(m, z):
            return m.motion_hyperprior.params_from_z(z)

        def res_params(m, z):
            return m.res_hyperprior.params_from_z(z)

        def dec_step(m, x_ref, st, z_m, ym_sym, z_r, yr_sym):
            from fvc.models.ssf import forward_prediction

            y_m_hat, q_m = _hp_decode(
                m.motion_hyperprior, z_m, ym_sym,
                st.q_prior_motion if m.motion_hyperprior.super_prec else None,
                motion_sp)
            motion_delta = m.motion_decoder(y_m_hat)
            motion_info = st.motion_info_prior + motion_delta
            x_pred = forward_prediction(
                x_ref, motion_info, sigma0=m.sigma0, num_levels=m.num_levels,
                scale_field_shift=m.scale_field_shift)
            y_r_hat, q_r = _hp_decode(
                m.res_hyperprior, z_r, yr_sym,
                st.q_prior_res if m.res_hyperprior.super_prec else None,
                res_sp)
            x_rec = x_pred + m.res_decoder(
                jnp.concatenate([y_r_hat, y_m_hat], axis=-1))
            new_st = ELFVCState(
                x_ref_ref=x_ref, motion_info_prior=motion_info,
                q_prior_motion=q_m if q_m is not None else st.q_prior_motion,
                q_prior_res=q_r if q_r is not None else st.q_prior_res)
            return x_rec, new_st

        ap = model.apply
        self._collect = jax.jit(lambda v, f, s: ap(v, f, s, method=collect))
        self._motion_params = jax.jit(lambda v, z: ap(v, z, method=motion_params))
        self._res_params = jax.jit(lambda v, z: ap(v, z, method=res_params))
        self._dec_step = jax.jit(
            lambda v, *a: ap(v, *a, method=dec_step))

    def _encode_branch(self, branch, z_hat, y_sym, sigma):
        coder, medians = self.eb[branch]
        C = z_hat.shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), z_hat.shape))
        return {
            "z": coder.encode_with_indexes(
                np.round(np.asarray(z_hat) - medians).astype(np.int32), idx),
            "y": self.g_coder.encode_with_indexes(
                np.asarray(y_sym).astype(np.int32),
                np.asarray(build_indexes(jnp.asarray(sigma)))),
        }

    def _decode_z(self, branch, data, shape):
        coder, medians = self.eb[branch]
        C = shape[-1]
        idx = np.ascontiguousarray(np.broadcast_to(
            np.arange(C, dtype=np.int32), shape))
        return jnp.asarray(
            coder.decode_with_indexes(data, idx).astype(np.float32) + medians)

    def compress(self, frames) -> Tuple[List[dict], dict]:
        """frames: [T, B, H, W, 3]; frame 0 = reconstructed I-frame."""
        B, H, W = frames.shape[1:4]
        state = self.model.init_state(B, H, W)
        lats = self._collect(self.variables, jnp.asarray(frames), state)
        T1 = frames.shape[0] - 1
        streams = []
        for k in range(T1):
            streams.append({
                "motion": self._encode_branch(
                    "motion_hyperprior", lats["z_m"][k], lats["ym_sym"][k],
                    lats["sm"][k]),
                "res": self._encode_branch(
                    "res_hyperprior", lats["z_r"][k], lats["yr_sym"][k],
                    lats["sr"][k]),
            })
        info = {"z_shape": np.asarray(lats["z_m"][0]).shape,
                "recon": np.asarray(lats["recon"])}
        return streams, info

    def decompress(self, x0, streams, info):
        B, H, W = x0.shape[0], x0.shape[1], x0.shape[2]
        st = self.model.init_state(B, H, W)
        x_ref = jnp.asarray(x0)
        z_shape = info["z_shape"]
        recons = []
        for s in streams:
            z_m = self._decode_z("motion_hyperprior", s["motion"]["z"], z_shape)
            sm, _ = self._motion_params(self.variables, z_m)
            ym = self.g_coder.decode_with_indexes(
                s["motion"]["y"], np.asarray(build_indexes(sm)))
            z_r = self._decode_z("res_hyperprior", s["res"]["z"], z_shape)
            sr, _ = self._res_params(self.variables, z_r)
            yr = self.g_coder.decode_with_indexes(
                s["res"]["y"], np.asarray(build_indexes(sr)))
            x_ref, st = self._dec_step(
                self.variables, x_ref, st, z_m,
                jnp.asarray(ym.astype(np.float32)), z_r,
                jnp.asarray(yr.astype(np.float32)))
            recons.append(np.asarray(x_ref))
        return np.stack(recons)

    @staticmethod
    def num_bits(streams) -> int:
        return 8 * sum(len(v) for s in streams
                       for br in s.values() for v in br.values())
