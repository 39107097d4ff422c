"""Real-bitstream encode/decode for the Base family (Base / Base-EC / Base-ER).

Reference: the torchac `calrealbits` path for Base, models.py:1249-1299 —
three coded tensors per P-frame:
  - mv latent:   learned factorized per-channel tables (bitEstimator_mv)
  - hyper z:     learned factorized per-channel tables (bitEstimator_z)
  - residual:    Laplace(0, sigma) with sigma = prior_decoder(z_hat), coded
                 with scale-indexed tables (feature_probs_based_sigma
                 semantics, models.py:1216-1245)

Same host/device split as the DVC/LSVC paths (SURVEY §7 "Real entropy coding
on TPU"): one encoder-only scan program collects every rounded latent, ONE
D2H transfer feeds the batched C++ rANS coder; decode inverts through a
synthesis-only scan. Variant handling mirrors BaseCodec's inference forward
exactly (fvc/models/base_codec.py):
  - '-ER': decoder inputs are gen(round(latent)) — the stop-gradient algebra
    of `_er_correct` reduces to exactly that at inference, and it is
    computable from transmitted symbols alone;
  - '-EC': prior decoder emits 2x channels; second half becomes the
    sigmoid(-)-0.5 feature correction concatenated into the residual decoder
    input. Only the sigma half parameterizes the residual's rate.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.core.config import OUT_CHANNEL_MV, OUT_CHANNEL_N
from fvc.entropy.codec_io import (
    bitparm_cdf_tables, decode_channelwise, encode_channelwise,
    laplace_cdf_tables,
)
from fvc.entropy.gaussian import build_indexes
from fvc.ops.warp import flow_warp


def _predict(m, x_ref, mv_q):
    """Decoder-side motion compensation from the transmitted mv symbols."""
    dec_in = m.mv_gen(mv_q) if m.use_er else mv_q
    mv_up = m.mv_decoder(dec_in)
    warped = flow_warp(x_ref, mv_up)
    return m.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped


def _sigma_and_correction(m, z_q):
    z_dec_in = m.prior_gen(z_q) if m.use_er else z_q
    sigma_out = m.prior_decoder(z_dec_in)
    if m.use_ec:
        sigma, correction = jnp.split(sigma_out, 2, axis=-1)
        return sigma, jax.nn.sigmoid(correction) - 0.5
    return sigma_out, None


def _reconstruct_from(m, prediction, feat_q, z_q):
    _, correction = _sigma_and_correction(m, z_q)
    res_dec_in = m.res_gen(feat_q) if m.use_er else feat_q
    if m.use_ec:
        res_dec_in = jnp.concatenate([res_dec_in, correction], axis=-1)
    recon_res = m.res_decoder(res_dec_in)
    return jnp.clip(prediction + recon_res, 0.0, 1.0)


def _code_frame(m, x_ref, x_cur):
    mvfeat = m.mv_encoder(m.optic_flow(x_cur, x_ref))
    mv_q = jnp.round(mvfeat)
    prediction = _predict(m, x_ref, mv_q)
    feat = m.res_encoder(x_cur - prediction)
    feat_q = jnp.round(feat)
    z_q = jnp.round(m.prior_encoder(feat))
    recon = _reconstruct_from(m, prediction, feat_q, z_q)
    return recon, mv_q, feat_q, z_q


def _collect_method(m, frames):
    """frames: [T, B, H, W, 3] (frame 0 = reconstructed I-frame) ->
    rounded latents + recons via the encoder scan."""

    def scan_fn(x_ref, x_cur):
        recon, mv_q, feat_q, z_q = _code_frame(m, x_ref, x_cur)
        return recon, (mv_q, feat_q, z_q, recon)

    _, (mv_qs, feat_qs, z_qs, recons) = jax.lax.scan(
        scan_fn, frames[0], frames[1:])
    return {"mv_q": mv_qs, "feat_q": feat_qs, "z_q": z_qs, "recon": recons}


def _sigma_method(m, z_qs):
    """z_qs: [T, B, h, w, C] -> Laplace sigma per residual symbol."""
    T, B = z_qs.shape[0], z_qs.shape[1]
    flat = z_qs.reshape((T * B,) + z_qs.shape[2:])
    sigma, _ = _sigma_and_correction(m, flat)
    return sigma.reshape((T, B) + sigma.shape[1:])


def _reconstruct_method(m, x0, mv_qs, feat_qs, z_qs):
    def scan_fn(x_ref, lat):
        mv_q, feat_q, z_q = lat
        recon = _reconstruct_from(m, _predict(m, x_ref, mv_q), feat_q, z_q)
        return recon, recon

    _, recons = jax.lax.scan(scan_fn, x0, (mv_qs, feat_qs, z_qs))
    return recons


def _mv_cdf_method(m, x):
    return m.bit_estimator_mv(x)


def _z_cdf_method(m, x):
    return m.bit_estimator_z(x)


class BaseBitstreamCodec:
    """Host-side coordinator for Base-family real coding (any variant)."""

    def __init__(self, model, variables):
        if not model.config.name.startswith("Base"):
            raise ValueError(f"not a Base-family config: {model.config.name}")
        self.model = model
        self.variables = variables

        self._collect = jax.jit(
            lambda v, f: model.apply(v, f, method=_collect_method))
        self._sigma = jax.jit(
            lambda v, z: model.apply(v, z, method=_sigma_method))
        self._recon = jax.jit(
            lambda v, x0, mq, fq, zq: model.apply(
                v, x0, mq, fq, zq, method=_reconstruct_method))

        mv_cdf = jax.jit(lambda v, x: model.apply(v, x, method=_mv_cdf_method))
        z_cdf = jax.jit(lambda v, x: model.apply(v, x, method=_z_cdf_method))
        self.mv_coder = bitparm_cdf_tables(
            lambda x: mv_cdf(variables, x), OUT_CHANNEL_MV)
        self.z_coder = bitparm_cdf_tables(
            lambda x: z_cdf(variables, x), OUT_CHANNEL_N)
        self.res_coder = laplace_cdf_tables()

    def compress(self, frames) -> Tuple[Dict[str, bytes], dict]:
        """frames: [T, B, H, W, 3], frame 0 = reconstructed I-frame."""
        lat = self._collect(self.variables, jnp.asarray(frames))
        indexes = build_indexes(self._sigma(self.variables, lat["z_q"]))
        mv_q = np.asarray(lat["mv_q"])
        feat_q = np.asarray(lat["feat_q"])
        z_q = np.asarray(lat["z_q"])
        streams = {
            "mv": encode_channelwise(self.mv_coder, mv_q),
            "z": encode_channelwise(self.z_coder, z_q),
            "res": self.res_coder.encode_with_indexes(
                feat_q.astype(np.int32),
                np.ascontiguousarray(np.asarray(indexes))),
        }
        info = {"mv_shape": mv_q.shape, "feat_shape": feat_q.shape,
                "z_shape": z_q.shape, "recon": np.asarray(lat["recon"])}
        return streams, info

    def decompress(self, x0, streams: Dict[str, bytes], info: dict):
        """x0: [B, H, W, 3] reconstructed I-frame. Returns decoded frames."""
        mv_q = decode_channelwise(
            self.mv_coder, streams["mv"], info["mv_shape"]).astype(np.float32)
        z_q = decode_channelwise(
            self.z_coder, streams["z"], info["z_shape"]).astype(np.float32)
        sigma = self._sigma(self.variables, jnp.asarray(z_q))
        indexes = np.ascontiguousarray(np.asarray(build_indexes(sigma)))
        feat_q = self.res_coder.decode_with_indexes(
            streams["res"], indexes).astype(np.float32)
        return np.asarray(self._recon(
            self.variables, jnp.asarray(x0), jnp.asarray(mv_q),
            jnp.asarray(feat_q), jnp.asarray(z_q)))

    @staticmethod
    def num_bits(streams) -> int:
        return 8 * sum(len(v) for v in streams.values())
