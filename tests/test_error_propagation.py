"""Error-propagation regression (VERDICT r03 #9; plot_hermes.py:814-831).

DVC codes each P-frame against the previous reconstruction, so quality
drifts down the chain; the reference holds the drift within ~1 dB over
GOP-13. This test bounds the drift of the COMMITTED trained DVC ladder
checkpoint over a GOP-8 on the eval corpus so a training regression (or a
scan-engine change that breaks the detach semantics) cannot land silently.

Runs on the CPU backend (conftest forces it); slow tier.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

def _drift(codec, ckpt, level=2):
    from fvc.data.datasets import SyntheticVideoDataset
    from fvc.models.registry import get_codec_model
    from fvc.train.checkpoint import latest_checkpoint, restore_checkpoint
    from fvc.train.evaluate import eval_family_on_gops, init_family_variables

    model, cfg = get_codec_model(codec, compression_level=level)
    sds = SyntheticVideoDataset(num_videos=1, frames=8, height=256, width=256)
    gops = [sds[0]]
    variables = init_family_variables(codec, model, gops[0])
    path = latest_checkpoint(ckpt)
    variables = restore_checkpoint(path, {"params": variables})["params"]
    results = eval_family_on_gops(codec, model, variables, gops)
    pf = results[0]["psnr_list"]
    return pf, pf[0] - pf[-1]


@pytest.mark.skipif(not os.path.isdir("trained/lsvc_ladder_l2"),
                    reason="trained LSVC checkpoint not present")
def test_lsvc_tree_gop8_drift_bounded():
    """The tree's O(log GOP) reference depth is THE error-propagation claim
    (plot_hermes.py:814-831); the trained model must hold the 2 dB gate
    (measured round 4: +0.05 dB over GOP-8)."""
    pf, drift = _drift("LSVC", "trained/lsvc_ladder_l2")
    assert drift <= 2.0, f"LSVC tree drift {drift:+.2f} dB: {pf}"


@pytest.mark.skipif(not os.path.isdir("trained/dvc_ladder_ema_l2"),
                    reason="trained DVC EMA checkpoint not present")
def test_dvc_gop8_drift_regression_backstop():
    """DVC's sequential chain drifts; measured +5.5 dB over GOP-8 at round 4
    and +6.1 dB on the EMA params mid round 5 after the hard-corpus gop-7
    fine-tune began (the raw step params drift ~1 dB more — the backstop
    tracks the EMA checkpoint because that is what eval/bench report).
    Still short of the reference's <=2 dB (plot_hermes.py:814-831); the
    split-ladder gop-7 chunks are the training path. This backstop only
    guards against REGRESSION (e.g. a scan-engine change breaking the
    detach semantics or a checkpoint swap landing a broken model)."""
    pf, drift = _drift("DVC", "trained/dvc_ladder_ema_l2")
    assert pf[0] > 28.0, f"first P-frame too weak: {pf}"
    assert drift <= 7.0, f"DVC drift {drift:+.2f} dB: {pf}"
