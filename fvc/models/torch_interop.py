"""Torch `.model` checkpoint interop for the original-DVC architecture.

The reference trains DVC (net.py:38 VideoCompressor) and checkpoints it as
`torch.save(model.state_dict(), "iter{N}.model")` (net.py:19); its released
snapshots follow the same layout. This module maps that state_dict onto the
`DVC-pretrained` model here (fvc.models.base_codec.BaseCodec — the same
topology: SpyNet + Analysis/Synthesis_mv + Warp_net + Analysis/Synthesis_net
+ hyperprior + two BitEstimators).

Weight conventions (established by tests/test_reference_golden.py):
- nn.Conv2d [co,ci,kh,kw]          -> HWIO transpose(2,3,1,0)
- nn.ConvTranspose2d [ci,co,kh,kw] -> spatial flip + transpose(2,3,0,1)
  (fvc Deconv expresses the transposed conv as an lhs-dilated correlation)
- GDN gamma [out,in]               -> transpose (fvc computes x^2 @ gamma)
- Bitparm h/b/a [1,C,1,1]          -> squeeze to (C,)

No snapshots ship with the reference repo, so the round-trip is verified in
tests/test_torch_interop.py against the reference's own torch subnets with
randomized weights (forward agreement on every stage).
"""

from __future__ import annotations

import numpy as np


def _np(v):
    # torch tensor, numpy array, or anything array-like
    detach = getattr(v, "detach", None)
    if detach is not None:
        v = detach()
        v = v.cpu().numpy() if hasattr(v, "cpu") else np.asarray(v)
    return np.asarray(v, np.float32)


def _conv(sd, key):
    w = _np(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
    return {"kernel": np.ascontiguousarray(w), "bias": _np(sd[f"{key}.bias"])}


def _deconv(sd, key):
    w = _np(sd[f"{key}.weight"])[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    return {"kernel": np.ascontiguousarray(w), "bias": _np(sd[f"{key}.bias"])}


def _gdn(sd, key):
    return {"beta": _np(sd[f"{key}.beta"]),
            "gamma": np.ascontiguousarray(_np(sd[f"{key}.gamma"]).T)}


def _bitparm(sd, key, final=False):
    out = {"h": _np(sd[f"{key}.h"]).reshape(-1),
           "b": _np(sd[f"{key}.b"]).reshape(-1)}
    if not final:
        out["a"] = _np(sd[f"{key}.a"]).reshape(-1)
    return out


def _bit_estimator(sd, key):
    return {f"Bitparm_{i}": _bitparm(sd, f"{key}.f{i + 1}", final=(i == 3))
            for i in range(4)}


def _spynet(sd, key="opticFlow"):
    return {f"level{l}": {f"Conv_{k}": _conv(
        sd, f"{key}.moduleBasic.{l}.conv{k + 1}")
        for k in range(5)} for l in range(4)}


def _mv_encoder(sd, key="mvEncoder"):
    # Analysis_mv_net: conv1..conv8 (analysis_mv.py:14-42)
    return {f"Conv_{i}": _conv(sd, f"{key}.conv{i + 1}") for i in range(8)}


def _mv_decoder(sd, key="mvDecoder"):
    # Synthesis_mv_net: deconv{odd}=ConvTranspose2d, deconv{even}=Conv2d
    # (synthesis_mv.py:15-45) -> fvc Deconv_0,Conv_0,...,Deconv_3,Conv_3
    out = {}
    for i in range(4):
        out[f"Deconv_{i}"] = _deconv(sd, f"{key}.deconv{2 * i + 1}")
        out[f"Conv_{i}"] = _conv(sd, f"{key}.deconv{2 * i + 2}")
    return out


def _warpnet(sd, key="warpnet"):
    # Warp_net (endecoder.py:262-296): feature_ext, 6 ResBlocks, conv6
    out = {"Conv_0": _conv(sd, f"{key}.feature_ext"),
           "Conv_1": _conv(sd, f"{key}.conv6")}
    for i in range(6):
        out[f"ResBlock_{i}"] = {
            "Conv_0": _conv(sd, f"{key}.conv{i}.conv1"),
            "Conv_1": _conv(sd, f"{key}.conv{i}.conv2")}
    return out


def _res_encoder(sd, key="resEncoder"):
    # Analysis_net: conv1..4 with gdn1..3 (analysis.py:16-28)
    out = {f"Conv_{i}": _conv(sd, f"{key}.conv{i + 1}") for i in range(4)}
    out.update({f"GDN_{i}": _gdn(sd, f"{key}.gdn{i + 1}") for i in range(3)})
    return out


def _res_decoder(sd, key="resDecoder"):
    # Synthesis_net: deconv1..4 with igdn1..3 (synthesis.py:14-26)
    out = {f"Deconv_{i}": _deconv(sd, f"{key}.deconv{i + 1}")
           for i in range(4)}
    out.update({f"GDN_{i}": _gdn(sd, f"{key}.igdn{i + 1}") for i in range(3)})
    return out


def _prior_encoder(sd, key="respriorEncoder"):
    # Analysis_prior_net: conv1..3 (analysis_prior.py:10-56)
    return {f"Conv_{i}": _conv(sd, f"{key}.conv{i + 1}") for i in range(3)}


def _prior_decoder(sd, key="respriorDecoder"):
    # Synthesis_prior_net: deconv1,2 = CT s2; deconv3 = CT s1 (== flipped
    # conv, so it maps onto fvc's trailing Conv) (synthesis_prior.py:17-27)
    return {"Deconv_0": _deconv(sd, f"{key}.deconv1"),
            "Deconv_1": _deconv(sd, f"{key}.deconv2"),
            "Conv_0": _deconv(sd, f"{key}.deconv3")}


def dvc_state_dict_to_params(sd) -> dict:
    """Reference VideoCompressor state_dict -> `DVC-pretrained` (BaseCodec)
    param-tree fragment (plain nested dict of numpy/jnp leaves)."""
    return {
        "optic_flow": _spynet(sd),
        "mv_encoder": _mv_encoder(sd),
        "mv_decoder": _mv_decoder(sd),
        "warpnet": _warpnet(sd),
        "res_encoder": _res_encoder(sd),
        "res_decoder": _res_decoder(sd),
        "prior_encoder": _prior_encoder(sd),
        "prior_decoder": _prior_decoder(sd),
        "bit_estimator_mv": _bit_estimator(sd, "bitEstimator_mv"),
        "bit_estimator_z": _bit_estimator(sd, "bitEstimator_z"),
    }


def load_dvc_model(variables, path_or_state):
    """Load a reference `.model` checkpoint (path or a loaded state_dict)
    into a DVC-pretrained variables tree; leaves not present in the
    checkpoint (none, for the stock architecture) keep their init values."""
    import flax

    from fvc.train.checkpoint import load_whatever

    sd = path_or_state
    if isinstance(sd, (str, bytes)):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    if "state_dict" in sd:  # train.py:416-424 wraps it
        sd = sd["state_dict"]
    params = dvc_state_dict_to_params(sd)
    variables = flax.core.unfreeze(variables)
    variables["params"] = load_whatever(variables["params"], params)
    return variables
