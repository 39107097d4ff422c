"""Real-bitstream encode/decode for the sequential IterPred family (DVC).

Per-frame pipeline (Coder2D compress path, models.py:565-664 with
noMeasure=False): the device encoder program yields rounded mv/res latents per
frame; the host codes each with the learned factorized per-channel tables; the
decoder program runs synthesis + warp + reconstruction from decoded latents.

The sequential dependency (frame k's flow needs frame k-1's reconstruction) is
kept on device: encode runs the full scan once collecting all latents (rounding
is deterministic), so host coding remains one batched call per stream — no
per-frame host round-trips. Decoding reconstructs frame-by-frame on device from
the decoded latent sequence (a scan over synthesis-only steps).

RLVC's RPM-conditioned path would add per-frame Gaussian tables driven by the
previous decoded latent; the DVC factorized path here demonstrates the full
real-coding loop (the RPM table plumbing reuses fvc.entropy.gaussian exactly
as the hyperprior path does).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.codec_io import (
    bitparm_cdf_tables, decode_channelwise, encode_channelwise,
)
from fvc.ops.warp import flow_warp


def _code_frame(m, x_ref, x_cur):
    mv = m.optic_flow(x_cur, x_ref)
    mv_latent, _ = m.mv_codec.analysis(mv, None)
    mv_q = jnp.round(mv_latent)
    mv_hat, _ = m.mv_codec.synthesis(mv_q, None)
    warped = flow_warp(x_ref, mv_hat)
    mc = m.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped
    res = x_cur - mc
    res_latent, _ = m.res_codec.analysis(res, None)
    res_q = jnp.round(res_latent)
    res_hat, _ = m.res_codec.synthesis(res_q, None)
    recon = jnp.clip(res_hat + mc, 0.0, 1.0)
    return recon, mv_q, res_q


def _decode_frame(m, x_ref, mv_q, res_q):
    mv_hat, _ = m.mv_codec.synthesis(mv_q, None)
    warped = flow_warp(x_ref, mv_hat)
    mc = m.warpnet(jnp.concatenate([warped, x_ref], axis=-1)) + warped
    if res_q is None:
        return mc, mc
    res_hat, _ = m.res_codec.synthesis(res_q, None)
    recon = jnp.clip(res_hat + mc, 0.0, 1.0)
    return recon, recon


def _collect_method(m, frames):
    """frames: [T, B, H, W, 3] -> rounded latents + recons (encoder scan)."""

    def scan_fn(x_ref, x_cur):
        recon, mv_q, res_q = _code_frame(m, x_ref, x_cur)
        return recon, (mv_q, res_q, recon)

    _, (mv_qs, res_qs, recons) = jax.lax.scan(scan_fn, frames[0], frames[1:])
    return {"mv_q": mv_qs, "res_q": res_qs, "recon": recons}


def _reconstruct_method(m, x0, mv_qs, res_qs):
    def scan_fn(x_ref, lat):
        recon, _ = _decode_frame(m, x_ref, lat[0], lat[1])
        return recon, recon

    _, recons = jax.lax.scan(scan_fn, x0, (mv_qs, res_qs))
    return recons


class DVCBitstreamCodec:
    def __init__(self, model, variables):
        if model.config.name != "DVC":
            raise ValueError("real coding here supports the factorized DVC mode")
        self.model = model
        self.variables = variables
        ch = model.config.channels

        self._collect = jax.jit(
            lambda v, f: model.apply(v, f, method=_collect_method))
        self._recon = jax.jit(
            lambda v, x0, mq, rq: model.apply(
                v, x0, mq, rq, method=_reconstruct_method))

        mv_cdf = jax.jit(lambda v, x: model.apply(
            v, x, method=lambda m, y: m.mv_codec.factorized_cdf(y)))
        res_cdf = jax.jit(lambda v, x: model.apply(
            v, x, method=lambda m, y: m.res_codec.factorized_cdf(y)))
        self.mv_coder = bitparm_cdf_tables(lambda x: mv_cdf(variables, x), ch)
        self.res_coder = bitparm_cdf_tables(lambda x: res_cdf(variables, x), ch)

    def compress(self, frames) -> Tuple[Dict[str, bytes], dict]:
        """frames: [T, B, H, W, 3], frame 0 = reconstructed I-frame."""
        lat = self._collect(self.variables, jnp.asarray(frames))
        mv_q = np.asarray(lat["mv_q"])
        res_q = np.asarray(lat["res_q"])
        streams = {
            "mv": encode_channelwise(self.mv_coder, mv_q),
            "res": encode_channelwise(self.res_coder, res_q),
        }
        info = {"mv_shape": mv_q.shape, "res_shape": res_q.shape,
                "recon": np.asarray(lat["recon"])}
        return streams, info

    def decompress(self, x0, streams, info):
        mv_q = decode_channelwise(
            self.mv_coder, streams["mv"], info["mv_shape"]).astype(np.float32)
        res_q = decode_channelwise(
            self.res_coder, streams["res"], info["res_shape"]).astype(np.float32)
        return np.asarray(self._recon(
            self.variables, jnp.asarray(x0), jnp.asarray(mv_q),
            jnp.asarray(res_q)))

    @staticmethod
    def num_bits(streams) -> int:
        return 8 * sum(len(v) for v in streams.values())
