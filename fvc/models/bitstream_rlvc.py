"""Real-bitstream encode/decode for RLVC — the recurrent-entropy path.

Reference: RecProbModel.compress_slow/decompress_slow (entropy_models.py:97-148)
inside Coder2D (models.py:565-664): frame 1 codes with the factorized
EntropyBottleneck; every later frame's (sigma, mu) comes from the RPM net run
on the PREVIOUS decoded latent, so decoding is inherently sequential:

    decode stream_k  needs  sigma_k = RPM(latent_{k-1}, hidden_{k-1})

The encoder still runs as ONE device program (all latents are deterministic
rounds), producing per-frame streams; the decoder alternates a small jitted
RPM/synthesis step with host rANS per frame — the device/host overlap design
from SURVEY §7 (device computes next frame's parameters while the host codes
the current one).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.coder import RansCoder
from fvc.entropy.gaussian import build_indexes, gaussian_cdf_tables
from fvc.models.latent_codec import CoderState
from fvc.ops.warp import flow_warp


def _mv_then_res(m, x_ref, x_cur, st_mv: CoderState, st_res: CoderState,
                 rpm_flag):
    """One eval-mode coding step returning everything real coding needs."""
    enc_mv, dec_mv = jnp.split(st_mv.rae, 2, axis=-1)
    enc_res, dec_res = jnp.split(st_res.rae, 2, axis=-1)

    mv = m.optic_flow(x_cur, x_ref)
    mv_lat, enc_mv = m.mv_codec.analysis(mv, enc_mv)
    sig_mv, mu_mv, rpm_mv = m.mv_codec.rpm_params(st_mv.prior_latent, st_mv.rpm)
    med_mv = m.mv_codec.entropy_bottleneck.medians()
    mv_hat_eb = jnp.round(mv_lat - med_mv) + med_mv
    mv_hat_g = jnp.round(mv_lat - mu_mv) + mu_mv
    mv_hat = jnp.where(rpm_flag, mv_hat_g, mv_hat_eb)
    mv_field, dec_mv = m.mv_codec.synthesis(mv_hat, dec_mv)

    warped = flow_warp(x_ref, mv_field)
    mc = m.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped
    res = x_cur - mc
    res_lat, enc_res = m.res_codec.analysis(res, enc_res)
    sig_res, mu_res, rpm_res = m.res_codec.rpm_params(st_res.prior_latent, st_res.rpm)
    med_res = m.res_codec.entropy_bottleneck.medians()
    res_hat_eb = jnp.round(res_lat - med_res) + med_res
    res_hat_g = jnp.round(res_lat - mu_res) + mu_res
    res_hat = jnp.where(rpm_flag, res_hat_g, res_hat_eb)
    res_out, dec_res = m.res_codec.synthesis(res_hat, dec_res)
    recon = jnp.clip(res_out + mc, 0.0, 1.0)

    # prior latent = round(decoded value) so encoder and decoder RPM chains
    # agree exactly — the compress_slow/decompress_slow convention
    # (entropy_models.py:123,146), not the estimation path's round(x).
    new_mv = CoderState(jnp.concatenate([enc_mv, dec_mv], -1),
                        jnp.where(rpm_flag, rpm_mv, st_mv.rpm),
                        jnp.round(mv_hat))
    new_res = CoderState(jnp.concatenate([enc_res, dec_res], -1),
                         jnp.where(rpm_flag, rpm_res, st_res.rpm),
                         jnp.round(res_hat))
    per_frame = {"mv_hat": mv_hat, "res_hat": res_hat,
                 "sig_mv": sig_mv, "mu_mv": mu_mv,
                 "sig_res": sig_res, "mu_res": mu_res, "recon": recon}
    return recon, new_mv, new_res, per_frame


def _collect_method(m, frames, st_mv, st_res):
    def scan_fn(carry, inp):
        x_ref, st_mv, st_res = carry
        idx, x_cur = inp
        recon, st_mv, st_res, out = _mv_then_res(
            m, x_ref, x_cur, st_mv, st_res, idx > 0)
        return (recon, st_mv, st_res), out

    T = frames.shape[0]
    (_, _, _), outs = jax.lax.scan(
        scan_fn, (frames[0], st_mv, st_res),
        (jnp.arange(T - 1), frames[1:]))
    return outs


def _mv_rpm_method(m, prior, hidden):
    return m.mv_codec.rpm_params(prior, hidden)


def _res_rpm_method(m, prior, hidden):
    return m.res_codec.rpm_params(prior, hidden)


def _decode_step_method(m, x_ref, mv_hat, res_hat, dec_mv, dec_res):
    mv_field, dec_mv = m.mv_codec.synthesis(mv_hat, dec_mv)
    warped = flow_warp(x_ref, mv_field)
    mc = m.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped
    res_out, dec_res = m.res_codec.synthesis(res_hat, dec_res)
    recon = jnp.clip(res_out + mc, 0.0, 1.0)
    return recon, dec_mv, dec_res


class RLVCBitstreamCodec:
    """Per-frame streams: frame 1 via factorized EB tables, later frames via
    RPM-conditioned Gaussian tables (the reference's stream-per-frame layout)."""

    def __init__(self, model, variables):
        if model.config.name != "RLVC":
            raise ValueError("RLVC real coding needs the 'rpm' entropy mode")
        self.model = model
        self.variables = variables
        ch = model.config.channels
        self._collect = jax.jit(lambda v, f, a, b: model.apply(
            v, f, a, b, method=_collect_method))
        self._mv_rpm = jax.jit(lambda v, p, h: model.apply(
            v, p, h, method=_mv_rpm_method))
        self._res_rpm = jax.jit(lambda v, p, h: model.apply(
            v, p, h, method=_res_rpm_method))
        self._dec_step = jax.jit(lambda v, *a: model.apply(
            v, *a, method=_decode_step_method))

        # factorized tables (frame 1): fresh EB module shells around the
        # trained sub-params (setup attrs are unavailable on unbound modules)
        from fvc.entropy.bottleneck import EntropyBottleneck
        mv_eb = EntropyBottleneck(ch)
        res_eb = EntropyBottleneck(ch)
        p = variables["params"]
        mv_vars = {"params": p["mv_codec"]["entropy_bottleneck"]}
        res_vars = {"params": p["res_codec"]["entropy_bottleneck"]}
        self.mv_eb_coder = RansCoder(*mv_eb.cdf_tables(mv_vars))
        self.res_eb_coder = RansCoder(*res_eb.cdf_tables(res_vars))
        self.mv_medians = np.asarray(mv_vars["params"]["quantiles"])[:, 0, 1]
        self.res_medians = np.asarray(res_vars["params"]["quantiles"])[:, 0, 1]
        self.g_coder = RansCoder(*gaussian_cdf_tables())

    def compress(self, frames) -> Tuple[List[Dict[str, bytes]], dict]:
        """frames: [T, B, H, W, 3]. Returns (per-frame streams, info)."""
        B, H, W = frames.shape[1:4]
        ch = self.model.config.channels
        st = CoderState.zeros(B, H, W, ch)
        outs = self._collect(self.variables, jnp.asarray(frames), st, st)
        T1 = frames.shape[0] - 1
        streams = []
        for k in range(T1):
            if k == 0:
                mv_sym = np.round(np.asarray(outs["mv_hat"][k]) - self.mv_medians)
                res_sym = np.round(np.asarray(outs["res_hat"][k]) - self.res_medians)
                idx_mv = np.broadcast_to(
                    np.arange(ch, dtype=np.int32), mv_sym.shape)
                streams.append({
                    "mv": self.mv_eb_coder.encode_with_indexes(
                        mv_sym.astype(np.int32), np.ascontiguousarray(idx_mv)),
                    "res": self.res_eb_coder.encode_with_indexes(
                        res_sym.astype(np.int32), np.ascontiguousarray(idx_mv)),
                })
            else:
                sig_mv = np.asarray(outs["sig_mv"][k])
                mu_mv = np.asarray(outs["mu_mv"][k])
                sig_res = np.asarray(outs["sig_res"][k])
                mu_res = np.asarray(outs["mu_res"][k])
                mv_sym = np.round(np.asarray(outs["mv_hat"][k]) - mu_mv)
                res_sym = np.round(np.asarray(outs["res_hat"][k]) - mu_res)
                streams.append({
                    "mv": self.g_coder.encode_with_indexes(
                        mv_sym.astype(np.int32),
                        np.asarray(build_indexes(jnp.asarray(sig_mv)))),
                    "res": self.g_coder.encode_with_indexes(
                        res_sym.astype(np.int32),
                        np.asarray(build_indexes(jnp.asarray(sig_res)))),
                })
        info = {"recon": np.asarray(outs["recon"]),
                "latent_shape": outs["mv_hat"].shape[1:]}
        return streams, info

    def decompress(self, x0, streams, info):
        """x0: [B, H, W, 3] reconstructed I-frame."""
        B, H, W = x0.shape[0], x0.shape[1], x0.shape[2]
        ch = self.model.config.channels
        shape = info["latent_shape"]
        st = CoderState.zeros(B, H, W, ch)
        mv_rpm_hidden, res_rpm_hidden = st.rpm, st.rpm
        dec_mv_state = jnp.split(st.rae, 2, axis=-1)[1]
        dec_res_state = jnp.split(st.rae, 2, axis=-1)[1]
        mv_prior = res_prior = st.prior_latent
        x_ref = jnp.asarray(x0)
        recons = []
        idx_ch = np.ascontiguousarray(
            np.broadcast_to(np.arange(ch, dtype=np.int32), shape))
        for k, s in enumerate(streams):
            if k == 0:
                mv_sym = self.mv_eb_coder.decode_with_indexes(s["mv"], idx_ch)
                mv_hat = mv_sym.astype(np.float32) + self.mv_medians
                res_sym = self.res_eb_coder.decode_with_indexes(s["res"], idx_ch)
                res_hat = res_sym.astype(np.float32) + self.res_medians
            else:
                sig_mv, mu_mv, mv_rpm_hidden = self._mv_rpm(
                    self.variables, mv_prior, mv_rpm_hidden)
                sig_res, mu_res, res_rpm_hidden = self._res_rpm(
                    self.variables, res_prior, res_rpm_hidden)
                mv_sym = self.g_coder.decode_with_indexes(
                    s["mv"], np.asarray(build_indexes(sig_mv)))
                mv_hat = mv_sym.astype(np.float32) + np.asarray(mu_mv)
                res_sym = self.g_coder.decode_with_indexes(
                    s["res"], np.asarray(build_indexes(sig_res)))
                res_hat = res_sym.astype(np.float32) + np.asarray(mu_res)
            mv_prior = jnp.round(jnp.asarray(mv_hat))
            res_prior = jnp.round(jnp.asarray(res_hat))
            x_ref, dec_mv_state, dec_res_state = self._dec_step(
                self.variables, x_ref, jnp.asarray(mv_hat),
                jnp.asarray(res_hat), dec_mv_state, dec_res_state)
            recons.append(np.asarray(x_ref))
        return np.stack(recons)

    @staticmethod
    def num_bits(streams) -> int:
        return 8 * sum(len(v) for s in streams for v in s.values())
