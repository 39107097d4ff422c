"""Model-level real-bitstream encode/decode.

Design (SURVEY §7 hard-part "Real entropy coding on TPU"): the device runs an
encoder-only XLA program producing every rounded latent (+ entropy parameters);
ONE host transfer feeds the batched C++ rANS coder. Decode inverts: host rANS
-> device synthesis-only program. Within a stream the device work and the host
coding overlap naturally (JAX dispatch is async; the host codes GOP k while the
device transforms GOP k+1).

LSVC layout (mirrors models.py:1347-1411 + TreeFrameReconCompress :1095):
  stream = [mv latents | hyper z latents | residual latents]
  - mv, z: learned factorized per-channel tables (bitEstimator_mv/_z,
    models.py:1249-1299 getrealbits path)
  - residual: Laplace(0, sigma) with sigma = prior_decoder(z_hat), coded with
    scale-indexed tables (feature_probs_based_sigma, models.py:1216-1245)
"""

from __future__ import annotations

import struct as _struct
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fvc.entropy.codec_io import (
    bitparm_cdf_tables, decode_channelwise, encode_channelwise,
    laplace_cdf_tables,
)
from fvc.entropy.gaussian import build_indexes


class LSVCBitstreamCodec:
    """Host-side coordinator for LSVC real coding."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        ch = model.config.channels
        self._collect = jax.jit(
            lambda v, x: model.apply(v, x, method=model.collect_latents))
        self._sigma = jax.jit(
            lambda v, z: model.apply(v, z, method=model.sigma_of_z))
        self._recon = jax.jit(
            lambda v, x0, mv, feat: model.apply(
                v, x0, mv, feat, method=model.reconstruct))
        mv_cdf = jax.jit(lambda v, x: model.apply(v, x, method=model.mv_cdf))
        z_cdf = jax.jit(lambda v, x: model.apply(v, x, method=model.z_cdf))
        self.mv_coder = bitparm_cdf_tables(
            lambda x: mv_cdf(variables, x), ch)
        self.z_coder = bitparm_cdf_tables(
            lambda x: z_cdf(variables, x), 64)
        self.res_coder = laplace_cdf_tables()

    def submit(self, x) -> dict:
        """Device half of compress(): launch the latent collection + sigma /
        index computation and return the in-flight device arrays WITHOUT
        blocking (JAX async dispatch). Pair with `host_encode`."""
        lat = self._collect(self.variables, jnp.asarray(x))
        sigma = self._sigma(self.variables, lat["z_q"])
        lat["indexes"] = build_indexes(sigma)
        return lat

    def host_encode(self, lat: dict) -> Tuple[Dict[str, bytes], dict]:
        """Host half of compress(): blocks on the device values (np.asarray)
        and runs the CPU rANS coder."""
        mv_q = np.asarray(lat["mv_q"])
        z_q = np.asarray(lat["z_q"])
        feat_q = np.asarray(lat["feat_q"])
        indexes = np.asarray(lat["indexes"])

        streams = {
            "mv": encode_channelwise(self.mv_coder, mv_q),
            "z": encode_channelwise(self.z_coder, z_q),
            "res": self.res_coder.encode_with_indexes(
                feat_q.astype(np.int32), indexes),
        }
        info = {"mv_shape": mv_q.shape, "z_shape": z_q.shape,
                "feat_shape": feat_q.shape, "recon": np.asarray(lat["recon"])}
        return streams, info

    def compress(self, x) -> Tuple[Dict[str, bytes], dict]:
        """x: [GOP+1, H, W, 3] with frame 0 the reconstructed I-frame.
        Returns (streams, info). info carries shapes + the encoder-side recon
        for verification."""
        return self.host_encode(self.submit(x))

    def compress_pipelined(self, gops) -> list:
        """Encode a sequence of GOPs with host/device overlap (SURVEY §7
        'Real entropy coding on TPU'): GOP n+1's transform runs on the device
        while the host rANS-codes GOP n. One-deep software pipeline — device
        queue depth stays bounded. Returns [(streams, info), ...], identical
        to sequential compress() per GOP."""
        results = []
        pending = self.submit(gops[0]) if len(gops) else None
        for i in range(len(gops)):
            nxt = self.submit(gops[i + 1]) if i + 1 < len(gops) else None
            results.append(self.host_encode(pending))  # blocks on GOP i only
            pending = nxt
        return results

    def decompress(self, x0, streams: Dict[str, bytes], info: dict):
        """x0: [H, W, 3] reconstructed I-frame. Returns decoded frames."""
        mv_q = decode_channelwise(
            self.mv_coder, streams["mv"], info["mv_shape"]).astype(np.float32)
        z_q = decode_channelwise(
            self.z_coder, streams["z"], info["z_shape"]).astype(np.float32)
        sigma = np.asarray(self._sigma(self.variables, jnp.asarray(z_q)))
        indexes = np.asarray(build_indexes(jnp.asarray(sigma)))
        feat_q = self.res_coder.decode_with_indexes(
            streams["res"], np.ascontiguousarray(indexes)).astype(np.float32)
        return np.asarray(self._recon(
            self.variables, jnp.asarray(x0), jnp.asarray(mv_q),
            jnp.asarray(feat_q)))

    @staticmethod
    def num_bits(streams: Dict[str, bytes]) -> int:
        return 8 * sum(len(v) for v in streams.values())


def pack_streams(streams: Dict[str, bytes]) -> bytes:
    """Serialize {name: bytes} into one container (length-prefixed)."""
    out = bytearray()
    for name in sorted(streams):
        nb = name.encode()
        out += _struct.pack("<HI", len(nb), len(streams[name]))
        out += nb + streams[name]
    return bytes(out)


def unpack_streams(blob: bytes) -> Dict[str, bytes]:
    out = {}
    off = 0
    while off < len(blob):
        ln, lv = _struct.unpack_from("<HI", blob, off)
        off += 6
        name = blob[off: off + ln].decode()
        off += ln
        out[name] = blob[off: off + lv]
        off += lv
    return out
