"""eval.py family dispatch (reference static_simulation_model family handling,
eval.py:254-354): every codec family evaluates through one uniform API with
real-bitstream bpp accounting."""

import jax
import numpy as np
import pytest

from fvc.models.registry import get_codec_model
from fvc.train.evaluate import eval_family_on_gops, init_family_variables


def _gops(n=1, t=3, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(t, hw, hw, 3).astype(np.float32)
    for i in range(1, t):
        base[i] = np.clip(np.roll(base[i - 1], 2, axis=1)
                          + 0.01 * rng.randn(hw, hw, 3), 0, 1)
    return [base.copy() for _ in range(n)]


@pytest.mark.parametrize("name", ["DVC", "RLVC", "SSF", "ELFVC-SP", "MCVC-IA"])
def test_eval_family_real_bits(name):
    extra = {"num_views": 1} if name.startswith("MCVC") else {}
    model, cfg = get_codec_model(name, compression_level=2, **extra)
    # SSF-family transforms are /16 with a /4 hyper pyramid -> H,W % 64 == 0
    hw = 64 if name in ("DVC", "RLVC") else 128
    gops = _gops(t=3, hw=hw)
    variables = init_family_variables(name, model, gops[0])
    results = eval_family_on_gops(name, model, variables, gops,
                                  real_bits=True)
    assert len(results) == 1
    r = results[0]
    for k in ("bpp", "psnr", "psnr_list", "time_per_frame", "bpp_act"):
        assert k in r, k
    assert r["bpp_act"] > 0
    assert np.isfinite(r["psnr"])
    # actual bits track the clamp estimate (entropy_models.py:434-459
    # invariant); generous bound since models are fresh-init
    assert abs(r["bpp_act"] - r["bpp"]) < max(0.3, 0.15 * r["bpp"])
