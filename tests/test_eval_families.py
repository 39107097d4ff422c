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


def test_evolve_from_checkpoint_encoder_only():
    """eval.py --evolve semantics (reference eval.py:357-473): adaptation
    starts from given params, trains only encoder-side weights (decoder +
    CDF tables frozen so an unmodified receiver can still decode), and
    reduces the RD loss on the clip."""
    import jax

    from fvc.train.loop import evolve

    model, cfg = get_codec_model("LSVC", compression_level=2)
    g = _gops(t=3)[0]
    variables = init_family_variables("LSVC", model, g)
    adapted, hist = evolve(model, cfg, g, steps=3, gop=2,
                           learning_rate=1e-3, init_params=variables)
    assert hist[-1] < hist[0]
    leaf_delta = jax.tree_util.tree_flatten_with_path(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a - b)).max()),
        variables, adapted))[0]
    changed = {"".join(str(p) for p in path) for path, d in leaf_delta if d > 0}
    assert changed  # something trained
    for key in changed:  # nothing decoder-side moved
        assert not any(s in key for s in
                       ("decoder", "bit_estimator", "warpnet")), key


def test_evolve_every_family():
    """evolve supports every codec family (the reference evolve drives
    parallel_compression for any codec, train.py:315-401): finite history,
    decoder-side params frozen."""
    import jax

    from fvc.train.loop import evolve

    for name, hw in (("DVC", 64), ("SSF", 128), ("ELFVC", 128)):
        model, cfg = get_codec_model(name, compression_level=2)
        g = _gops(t=3, hw=hw)[0]
        variables = init_family_variables(name, model, g)
        adapted, hist = evolve(model, cfg, g, steps=2, gop=2,
                               learning_rate=1e-3, init_params=variables,
                               codec_name=name)
        assert np.isfinite(hist).all(), (name, hist)
        leaf_delta = jax.tree_util.tree_flatten_with_path(jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a - b)).max()),
            variables, adapted))[0]
        changed = {"".join(str(p) for p in path)
                   for path, d in leaf_delta if d > 0}
        assert changed, name
        for key in changed:
            assert not any(s in key for s in
                           ("decoder", "bit_estimator", "warpnet")), (name, key)

    # unsupported families fail with a clear error (MCVC adapts via OLFT)
    from fvc.train.loop import _family_clip_loss
    model, cfg = get_codec_model("MCVC-IA", num_views=1)
    with pytest.raises(ValueError, match="OLFT"):
        _family_clip_loss("MCVC-IA", model, cfg, _gops(t=3, hw=128)[0])


def test_eval_rlvc_bidirectional_window():
    """--bP: RLVC GOP window with the I-frame mid-sequence; both halves coded
    with independent recurrent chains; real bits cover both directions."""
    model, cfg = get_codec_model("RLVC", compression_level=2)
    g = _gops(t=5)[0]  # I at index 2: bP=2 backward, fP=2 forward
    variables = init_family_variables("RLVC", model, g)
    res = eval_family_on_gops("RLVC", model, variables, [g],
                              real_bits=True, bP=2)[0]
    assert len(res["psnr_list"]) == 4  # T-1 P-frames in display order
    assert np.isfinite(res["psnr"]) and res["bpp_act"] > 0
    assert abs(res["bpp_act"] - res["bpp"]) < max(0.3, 0.15 * res["bpp"])


def test_eval_base_family():
    """Base/-ER evaluate through the family dispatch (estimate-only; the
    reference measures Base real bits via torchac under calrealbits)."""
    model, cfg = get_codec_model("Base-ER", compression_level=2)
    g = _gops(t=3)[0]
    variables = init_family_variables("Base-ER", model, g)
    r = eval_family_on_gops("Base-ER", model, variables, [g])[0]
    assert np.isfinite(r["psnr"]) and r["bpp"] > 0
    assert len(r["psnr_list"]) == 2
    with pytest.raises(NotImplementedError):
        eval_family_on_gops("Base-ER", model, variables, [g], real_bits=True)
