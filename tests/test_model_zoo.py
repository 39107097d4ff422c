"""The committed pretrained checkpoints must keep loading and decoding as the
code evolves — a param rename or module restructure would otherwise break the
model zoo silently (docs/MODEL_ZOO.md)."""

import os

import numpy as np
import pytest

from fvc.models.registry import get_codec_model
from fvc.train.evaluate import eval_family_on_gops, init_family_variables
from fvc.train.checkpoint import restore_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ZOO = [
    ("pretrained_dvc_l2", "DVC", 64),
    ("pretrained_rlvc_l2", "RLVC", 64),
    ("pretrained_lsvc_l2", "LSVC", 64),
    ("pretrained_ssf_l2", "SSF", 128),
    ("pretrained_elfvc_sp_l2", "ELFVC-SP", 128),
    ("pretrained_mcvc_ia_pt", "MCVC-IA", 128),
]


def _clip(t, hw, seed=0):
    # structured motion clips (what the checkpoints trained on) — raw
    # uniform noise is uncompressible and bottoms every codec near 10 dB
    from fvc.data.datasets import SyntheticVideoDataset
    return SyntheticVideoDataset(1, frames=t, height=hw, width=hw,
                                 seed=seed)[0]


@pytest.mark.parametrize("dirname,codec,hw", ZOO,
                         ids=[z[0] for z in ZOO])
def test_zoo_checkpoint_restores_and_decodes(dirname, codec, hw):
    path = os.path.join(REPO, dirname)
    if not os.path.isdir(path):
        pytest.skip(f"{dirname} not present")
    extra = {"num_views": 1} if codec.startswith("MCVC") else {}
    model, cfg = get_codec_model(codec, compression_level=2, **extra)
    g = _clip(3, hw)
    ref = init_family_variables(codec, model, g)
    variables = restore_checkpoint(path, {"params": ref})["params"]
    r = eval_family_on_gops(codec, model, variables, [g])[0]
    assert np.isfinite(r["psnr"]) and r["bpp"] > 0
    # a trained model on a near-static synthetic clip must beat a coarse
    # quality floor (fresh inits sit near 10 dB for the SSF family)
    assert r["psnr"] > 15.0, (dirname, r["psnr"])
