"""SSF / ELFVC(-SP) / MCVC(-IA) / Base model family tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fvc.core.config import CodecConfig

H = W = 128  # SSF stack needs 128-divisible


def _frames(T, B=1, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(B, H, W, 3).astype(np.float32)
    out = [base]
    for _ in range(T - 1):
        out.append(np.clip(np.roll(out[-1], 2, axis=2)
                           + 0.01 * rng.randn(B, H, W, 3), 0, 1).astype(np.float32))
    return jnp.asarray(np.stack(out))


def test_gaussian_volume_and_scale_space_warp():
    from fvc.ops.warp import gaussian_volume, scale_space_warp

    x = _frames(1)[0]
    vol = gaussian_volume(x, 1.5, 5)
    assert vol.shape == (1, 6, H, W, 3)
    # zero flow/scale samples near level 0 (slightly blurred by border math)
    flow = jnp.zeros((1, H, W, 2))
    scale = -jnp.ones((1, H, W))  # z=-1 -> nearest depth 0
    out = scale_space_warp(vol, flow, scale)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ssf_forward_inter():
    from fvc.models.ssf import ScaleSpaceFlow, inter_bpp_est

    m = ScaleSpaceFlow(planes=32, mid=16)
    f = _frames(2)
    variables = m.init(jax.random.PRNGKey(0), f[1], f[0], training=False)
    x_rec, lk = m.apply(variables, f[1], f[0], training=False)
    assert x_rec.shape == (1, H, W, 3)
    bpp, bpp_res = inter_bpp_est(lk, 1, H, W)
    assert float(bpp) > 0 and float(bpp_res) > 0


def test_elfvc_sp_state_chaining():
    from fvc.models.elfvc import ELFVC, elfvc_frame_metrics

    cfg = CodecConfig.from_name("ELFVC-SP")
    m = ELFVC(cfg, planes=32, mid=16)
    f = _frames(3)
    state = m.init_state(1, H, W)
    variables = m.init(jax.random.PRNGKey(0), f[1], f[0], state, training=False)

    x_rec, state1, lk = m.apply(variables, f[1], f[0], state, training=False)
    assert len(lk["pred_err"]) == 2  # both hyperpriors carry SPnet
    # reference chain propagates (x_ref becomes next step's x_ref_ref);
    # note decoded motion is exactly 0 at fresh init (zero biases), so test
    # the state plumbing on x_ref_ref instead.
    np.testing.assert_allclose(np.asarray(state1.x_ref_ref), np.asarray(f[0]))
    x_rec2, state2, lk2 = m.apply(variables, f[2], x_rec, state1, training=False)
    metrics = elfvc_frame_metrics(f[2], x_rec2, lk2)
    for k in ("bpp_est", "img_loss", "psnr", "pred_norm", "q_norm"):
        assert np.isfinite(float(metrics[k])), k


def test_mcvc_ia_forward_with_failures():
    from fvc.models.mcvc import MCVC, mcvc_gop_metrics, sample_view_mask

    views = 3
    cfg = CodecConfig.from_name("MCVC-IA", num_views=views, resilience=1)
    m = MCVC(cfg, planes=32, mid=16)
    frames = _frames(2, B=views)  # [G=2, V, H, W, 3]
    mask = jnp.asarray(sample_view_mask(
        1, views, 1, force_resilience=1, training=True,
        rng=np.random.RandomState(0)))
    assert float(mask.sum()) == views - 1  # one failed view

    variables = m.init(jax.random.PRNGKey(0), frames, mask, training=False)
    out = m.apply(variables, frames, mask, training=False)
    assert out["x_hat"].shape == frames.shape
    metrics = mcvc_gop_metrics(frames, out, cfg)
    assert np.isfinite(float(metrics["psnr"]))
    assert float(metrics["bpp_est"]) > 0


def test_mcvc_view_mask_sampling_stats():
    from fvc.models.mcvc import sample_num_failed, sample_view_mask

    rng = np.random.RandomState(0)
    fails = [sample_num_failed(4, 0.1, 3, training=True, rng=rng)
             for _ in range(300)]
    # binomial(4, .1): mostly 0 failures
    assert np.mean(np.asarray(fails) == 0) > 0.5
    mask = sample_view_mask(2, 4, 0, training=True, rng=rng)
    assert mask.shape == (8,) and mask.sum() == 8  # resilience 0: none fail


def test_olft_touchup_replacement():
    from fvc.models.mcvc import replace_topk_pixels, touchup_bits

    rng = np.random.RandomState(0)
    recon = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    target = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    touched, delta = replace_topk_pixels(recon, target, 0.1)
    n_replaced = int(np.sum(np.asarray(delta) != 0))
    assert 0 < n_replaced <= int(0.1 * recon.size) + 1
    # replaced positions now equal target
    d = np.asarray(jnp.abs(touched - target))
    r = np.asarray(jnp.abs(recon - target)).reshape(-1)
    assert np.sort(d.reshape(-1))[-n_replaced:].max() <= np.sort(r)[::-1][n_replaced] + 1e-6
    bits = touchup_bits(np.asarray(delta))
    assert bits > 0


@pytest.mark.parametrize("name", ["Base", "Base-EC", "Base-ER"])
def test_base_codec_variants(name):
    from fvc.models.base_codec import BaseCodec

    cfg = CodecConfig.from_name(name)
    m = BaseCodec(cfg)
    f = _frames(2, seed=3)
    variables = m.init(jax.random.PRNGKey(0), f[1], f[0], training=False)
    recon, out = m.apply(variables, f[1], f[0], training=False)
    assert recon.shape == (1, H, W, 3)
    for k in ("bpp_feature", "bpp_z", "bpp_mv", "img_loss", "inter_loss", "psnr"):
        assert np.isfinite(float(out[k])), k
    if "-ER" in name:
        assert float(out["pred_err"]) >= 0


def test_registry_builds_all_families():
    from fvc.models.registry import get_codec_model

    for name in ["DVC", "RLVC", "RLVC2", "DVC-pretrained", "LSVC", "LSVC-L",
                 "Base", "Base-EC", "Base-ER", "ELFVC", "ELFVC-SP",
                 "MCVC-Original", "MCVC-IA", "MCVC-IA-OLFT", "SSF", "IFrame"]:
        model, cfg = get_codec_model(name, num_views=2)
        assert model is not None
        assert cfg.name == name


def test_mcvc_ctx_context_entropy():
    """MCVC-IA-CTX: ContextVP entropy context wired into keyframe/residual
    hyperpriors; forward runs and produces finite likelihood-based metrics."""
    from fvc.models.mcvc import mcvc_gop_metrics
    from fvc.models.registry import get_codec_model

    views = 2
    model, cfg = get_codec_model("MCVC-IA-CTX", num_views=views, resilience=1)
    assert cfg.use_context_model
    frames = _frames(2, B=views)
    mask = jnp.ones((views,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames, mask, training=False)
    out = model.apply(variables, frames, mask, training=False)
    m = mcvc_gop_metrics(frames, out, cfg)
    assert np.isfinite(float(m["bpp_est"])) and float(m["bpp_est"]) > 0
    # context params exist
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert any("context_model" in str(p) for p, _ in flat)


def test_scale_space_warp_window_matches_gather_translational():
    # Window scale_space_warp is exact vs the gather formulation for
    # translational flow within the radius (same contract as flow_warp).
    import numpy as np

    from fvc.ops.warp import gaussian_volume, scale_space_warp

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 24, 32, 3).astype(np.float32))
    vol = gaussian_volume(x, 1.5, 4)
    scale = jnp.asarray(rng.rand(2, 24, 32).astype(np.float32) * 2 - 1)
    for ux, uy in [(0.0, 0.0), (0.07, -0.04), (-0.11, 0.02)]:
        flow = jnp.stack([jnp.full((2, 24, 32), ux),
                          jnp.full((2, 24, 32), uy)], axis=-1)
        a = np.asarray(scale_space_warp(vol, flow, scale, method="window"))
        b = np.asarray(scale_space_warp(vol, flow, scale, method="gather"))
        np.testing.assert_allclose(a, b, atol=5e-6)


def test_scale_space_warp_window_differentiable():
    import numpy as np

    from fvc.ops.warp import gaussian_volume, scale_space_warp

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    vol = gaussian_volume(x, 1.5, 3)

    def loss(flow, scale):
        return jnp.mean(scale_space_warp(vol, flow, scale) ** 2)

    flow = jnp.zeros((1, 16, 16, 2)) + 0.01
    scale = jnp.zeros((1, 16, 16)) - 0.5
    gf, gs = jax.grad(loss, argnums=(0, 1))(flow, scale)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gs)).all()
    assert float(jnp.max(jnp.abs(gs))) > 0.0


def test_forward_prediction_pyramid_parity():
    """Fused native-res pyramid vs the materialized-volume scale-space
    prediction (compressai ssf2020 semantics): > 40 dB on smooth content —
    the only difference is warp/upsample order on levels whose accumulated
    blur is sigma >= 1.5."""
    import numpy as np
    import jax.numpy as jnp

    from fvc.core.policy import ssf_pyramid
    from fvc.models.ssf import forward_prediction

    H = W = 128
    rng = np.random.RandomState(0)
    img = rng.rand(1, H, W, 3).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    for ax in (1, 2):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img)
    x = jnp.asarray(img)
    i = (np.arange(H) / H)[:, None] * np.ones((1, W))
    j = np.ones((H, 1)) * (np.arange(W) / W)[None, :]
    u = 0.01 * np.sin(2 * np.pi * i) * np.cos(2 * np.pi * j)
    v = 0.008 * np.cos(2 * np.pi * (i + j))
    s = 0.3 * np.sin(4 * np.pi * i) - 0.5
    mi = jnp.asarray(np.stack([u, v, s], -1)[None].astype(np.float32))

    ref = forward_prediction(x, mi)
    with ssf_pyramid():
        got = forward_prediction(x, mi)
    err = float(jnp.mean((ref - got) ** 2))
    psnr = -10 * np.log10(err + 1e-12)
    assert psnr > 40.0, psnr


def test_elfvc_hr_flow_predictor_param_compatible():
    """'-HR' (half-res FlowPredictor) keeps the parameter tree identical to
    the full-res model, so trained checkpoints run in either mode."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fvc.models.registry import get_codec_model

    m1, _ = get_codec_model("ELFVC-SP")
    m2, _ = get_codec_model("ELFVC-SP-HR")
    x = jnp.zeros((1, 128, 128, 3))
    s = m1.init_state(1, 128, 128)
    v1 = m1.init(jax.random.PRNGKey(0), x, x, s, training=False)
    v2 = m2.init(jax.random.PRNGKey(0), x, x, s, training=False)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))
    # and the HR forward runs + returns the full-res reconstruction
    x_rec, _, _ = m2.apply(v2, x, x, s, training=False)
    assert x_rec.shape == (1, 128, 128, 3)


def test_flow_predictor_s2d_packed_exact():
    """FlowPredictor s2d(2) packing (round-5 perf, VERDICT r04 #8): the
    packed conv5 stack must match the unpacked stack exactly (same canonical
    param shapes — checkpoint compatible), and odd sizes fall back to r=1."""
    import numpy as np
    from fvc.models.elfvc import FlowPredictor

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 32, 48, 9).astype(np.float32))
    m2 = FlowPredictor(s2d_max=2)
    m1 = FlowPredictor(s2d_max=1)
    v = m2.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(lambda a: jnp.asarray(
        rng.randn(*a.shape).astype(np.float32) * 0.05), v)
    np.testing.assert_allclose(np.asarray(m2.apply(v, x)),
                               np.asarray(m1.apply(v, x)), atol=1e-4)
    x_odd = jnp.asarray(rng.randn(1, 31, 48, 9).astype(np.float32))
    np.testing.assert_allclose(np.asarray(m2.apply(v, x_odd)),
                               np.asarray(m1.apply(v, x_odd)), atol=1e-4)
