"""Golden parity tests: fvc.ops vs PyTorch (CPU) reference semantics.

These check the exact op-level contracts the reference relies on
(grid_sample border/align_corners=False warping, both interpolate conventions,
avg_pool, GDN math) without importing any reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape).astype(np.float32)


def test_flow_warp_matches_grid_sample():
    from fvc.ops import flow_warp

    B, H, W, C = 2, 17, 23, 3
    img = _rand((B, H, W, C), 1)
    flow = (_rand((B, H, W, 2), 2) - 0.5) * 6.0

    out = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow),
                               method="gather"))

    # torch grid_sample with the reference's normalization (models.py:730-747)
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
    gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([gx, gy], 1)
    norm_flow = torch.cat(
        [t_flow[:, 0:1] / ((W - 1.0) / 2.0), t_flow[:, 1:2] / ((H - 1.0) / 2.0)], 1)
    ref = F.grid_sample(t_img, (grid + norm_flow).permute(0, 2, 3, 1),
                        mode="bilinear", padding_mode="border", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_flow_warp_zero_flow_matches_torch():
    """align_corners=False + the reference grid is NOT an identity map (edge
    pixels shift by up to W/(W-1) scale); assert we agree with torch exactly."""
    from fvc.ops import flow_warp

    B, H, W = 1, 32, 32
    img = _rand((B, H, W, 3), 3)
    out = np.asarray(flow_warp(jnp.asarray(img), jnp.zeros((B, H, W, 2)),
                               method="gather"))
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
    gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([gx, gy], 1)
    ref = F.grid_sample(t_img, grid.permute(0, 2, 3, 1), mode="bilinear",
                        padding_mode="border", align_corners=False)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_upsample2x_matches_interpolate(align):
    from fvc.ops import upsample2x

    x = _rand((2, 9, 13, 4), 4)
    out = np.asarray(upsample2x(jnp.asarray(x), align_corners=align))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.interpolate(t, (18, 26), mode="bilinear", align_corners=align)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_avg_pool2_matches_torch():
    from fvc.ops import avg_pool2

    x = _rand((2, 16, 20, 3), 5)
    out = np.asarray(avg_pool2(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_bilinear_resize_arbitrary():
    from fvc.ops import bilinear_resize

    x = _rand((1, 24, 24, 2), 6)
    out = np.asarray(bilinear_resize(jnp.asarray(x), 11, 17, align_corners=False))
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (11, 17),
                        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_gdn_shapes_and_inverse():
    from fvc.ops import GDN

    x = jnp.asarray(_rand((2, 8, 8, 16), 7)) - 0.5
    gdn = GDN()
    params = gdn.init(jax.random.PRNGKey(0), x)
    y = gdn.apply(params, x)
    assert y.shape == x.shape
    # fresh init: beta=1, gamma=0.1*I  =>  norm = sqrt(1 + 0.1 x^2)
    expected = np.asarray(x) / np.sqrt(1.0 + 0.1 * np.square(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)

    igdn = GDN(inverse=True)
    yi = igdn.apply(igdn.init(jax.random.PRNGKey(0), x), x)
    expected_i = np.asarray(x) * np.sqrt(1.0 + 0.1 * np.square(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(yi), expected_i, atol=1e-5)


def test_lower_bound_gradient_rule():
    from fvc.ops import lower_bound

    x = jnp.asarray([0.5, 2.0])
    bound = 1.0

    # push-down gradient (g>0): blocked where x < bound, passes where x >= bound
    g = jax.grad(lambda v: jnp.sum(lower_bound(v, bound) * 1.0))(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])
    # push-up gradient (g<0): always passes
    g2 = jax.grad(lambda v: jnp.sum(lower_bound(v, bound) * -1.0))(x)
    np.testing.assert_allclose(np.asarray(g2), [-1.0, -1.0])


def test_convlstm_state_shape():
    from fvc.ops import ConvLSTM

    cell = ConvLSTM(channels=8)
    x = jnp.zeros((1, 4, 4, 8))
    state = ConvLSTM.zero_state(1, 4, 4, 8)
    params = cell.init(jax.random.PRNGKey(0), x, state)
    h, new_state = cell.apply(params, x, state)
    assert h.shape == (1, 4, 4, 8)
    assert new_state.shape == (1, 4, 4, 16)


def test_quantize_modes():
    from fvc.ops import quantize, quantize_ste

    x = jnp.asarray([0.4, 1.6, -2.3])
    np.testing.assert_allclose(np.asarray(quantize(x, training=False)), [0.0, 2.0, -2.0])
    q = quantize(x, training=True, rng=jax.random.PRNGKey(0))
    assert np.abs(np.asarray(q - x)).max() <= 0.5
    # STE: identity gradient
    g = jax.grad(lambda v: jnp.sum(quantize_ste(v)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])


def test_laplace_likelihood_matches_cdf_difference():
    from fvc.ops import laplace_interval_likelihood

    x = jnp.asarray(np.linspace(-3, 3, 13, dtype=np.float32))
    sigma = jnp.full_like(x, 0.7)
    p = np.asarray(laplace_interval_likelihood(x, sigma))
    d = torch.distributions.laplace.Laplace(0.0, 0.7)
    ref = (d.cdf(torch.from_numpy(np.asarray(x)) + 0.5)
           - d.cdf(torch.from_numpy(np.asarray(x)) - 0.5)).numpy()
    np.testing.assert_allclose(p, ref, atol=1e-6)


def test_bits_estimator_reference_constants():
    from fvc.ops import bits_from_likelihood

    p = jnp.asarray([1.0, 0.5, 1e-9])
    bits = np.asarray(bits_from_likelihood(p))
    expected = np.sum(np.clip(-np.log(np.asarray(p) + 1e-5) / np.log(2.0), 0, 50))
    np.testing.assert_allclose(bits, expected, rtol=1e-6)


def test_ms_ssim_close_to_one_for_identical():
    from fvc.ops import ms_ssim

    x = jnp.asarray(_rand((1, 180, 180, 3), 8))
    val = np.asarray(ms_ssim(x, x))
    assert val.shape == (1,)
    assert val[0] > 0.9999


def test_ms_ssim_np_matches_jax_and_tames_saturation():
    """The host-f64 eval path (fvc.ops.ms_ssim.ms_ssim_np) must agree with
    the on-device f32 metric away from saturation, and must stay finite and
    monotone-capped where f32 collapses into rounding noise (VERDICT r03
    weak #5: adjacent rate points reported 75.9/40.2/76.9 dB)."""
    from fvc.ops.ms_ssim import ms_ssim, ms_ssim_db_np, ms_ssim_np

    x = _rand((2, 192, 192, 3), 11)
    y = np.clip(x + 0.03 * (_rand((2, 192, 192, 3), 12) - 0.5), 0, 1
                ).astype(np.float32)
    ours32 = np.asarray(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
    ours64 = ms_ssim_np(x, y)
    np.testing.assert_allclose(ours64, ours32, atol=2e-5)

    # saturation: identical inputs -> exactly the 100 dB cap, no noise
    db = ms_ssim_db_np(x, x)
    assert np.all(np.isfinite(db))
    np.testing.assert_allclose(db, 100.0, atol=1e-6)

    # near-saturation: a tiny perturbation must give a finite, reproducible
    # value strictly below the cap
    y2 = np.clip(x + 1e-4 * (_rand((2, 192, 192, 3), 13) - 0.5), 0, 1
                 ).astype(np.float64)
    db2 = ms_ssim_db_np(x, y2)
    assert np.all(np.isfinite(db2)) and np.all(db2 < 100.0)
    np.testing.assert_allclose(db2, ms_ssim_db_np(x, y2), rtol=0)


def test_ms_ssim_matches_pytorch_msssim_if_available():
    try:
        from pytorch_msssim import ms_ssim as t_msssim
    except ImportError:
        pytest.skip("pytorch_msssim not installed")
    from fvc.ops import ms_ssim

    x = _rand((1, 192, 192, 3), 9)
    y = np.clip(x + 0.05 * (_rand((1, 192, 192, 3), 10) - 0.5), 0, 1).astype(np.float32)
    ours = float(ms_ssim(jnp.asarray(x), jnp.asarray(y))[0])
    ref = float(t_msssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                         torch.from_numpy(y).permute(0, 3, 1, 2), data_range=1.0))
    assert abs(ours - ref) < 5e-3


def test_spynet_runs_and_loads_pretrained():
    from fvc.ops import SpyNet
    from fvc.ops.spynet import load_npy_weights, DEFAULT_WEIGHTS_DIR
    import os

    net = SpyNet()
    im1 = jnp.asarray(_rand((1, 64, 64, 3), 11))
    im2 = jnp.asarray(_rand((1, 64, 64, 3), 12))
    params = net.init(jax.random.PRNGKey(0), im1, im2)
    flow = net.apply(params, im1, im2)
    assert flow.shape == (1, 64, 64, 2)

    if os.path.isdir(DEFAULT_WEIGHTS_DIR):
        import flax
        p = flax.core.unfreeze(params)["params"]
        p2 = load_npy_weights(p, DEFAULT_WEIGHTS_DIR)
        flow2 = net.apply({"params": p2}, im1, im2)
        assert np.isfinite(np.asarray(flow2)).all()


def test_deconv_exact_2x():
    from fvc.ops import Deconv

    for k in (3, 5):
        m = Deconv(8, kernel=k)
        x = jnp.zeros((1, 7, 9, 4))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (1, 14, 18, 8), (k, y.shape)


def test_deconv_matches_torch_conv_transpose():
    """Geometry + numerics vs ConvTranspose2d(k,2,k//2,output_padding=1)."""
    from fvc.ops.conv import deconv2d_x2

    B, H, W, Cin, Cout, k = 1, 6, 5, 3, 4, 3
    x = _rand((B, H, W, Cin), 13)
    w = _rand((k, k, Cin, Cout), 14) - 0.5

    out = np.asarray(deconv2d_x2(jnp.asarray(x), jnp.asarray(w), kernel=k))

    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    # torch ConvTranspose2d weight layout: (in, out, kH, kW), correlation flips
    tw = torch.from_numpy(w).permute(2, 3, 0, 1).flip(-1, -2)
    ref = F.conv_transpose2d(tx, tw, stride=2, padding=k // 2, output_padding=1)
    np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)


def test_window_warp_matches_gather_for_translational_flow():
    """The TPU-fast windowed warp is exact (vs grid_sample) whenever the flow
    is locally translational and within the window radius."""
    from fvc.ops import flow_warp

    B, H, W, C = 2, 40, 56, 3
    img = jnp.asarray(_rand((B, H, W, C), 7))
    for (u, v) in [(0.0, 0.0), (2.25, -1.5), (-5.9, 3.1)]:
        flow = jnp.broadcast_to(jnp.asarray([u, v], jnp.float32), (B, H, W, 2))
        got = np.asarray(flow_warp(img, flow, method="window", radius=8))
        want = np.asarray(flow_warp(img, flow, method="gather"))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_window_warp_close_for_smooth_flow():
    """For smooth (codec-like) flow over natural (spatially-correlated)
    content the separable approximation stays within ~38 dB of grid_sample;
    its only error term is the vertical coordinate being evaluated at the
    gathered column, which vanishes as flow or image smoothness grows."""
    from fvc.ops import flow_warp

    B, H, W = 1, 64, 64
    # smooth image: blurred noise (white noise makes ANY subpixel resampling
    # difference O(1) and is not representative of frames)
    img = _rand((B, H, W, 3), 8)
    k = np.ones(5, np.float32) / 5
    for ax in (1, 2):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img)
    img = jnp.asarray(img)
    # smooth low-frequency flow field, |flow| < 4
    i = np.arange(H)[:, None] / H
    j = np.arange(W)[None, :] / W
    u = 3.0 * np.sin(2 * np.pi * i) * np.cos(2 * np.pi * j)
    v = 2.0 * np.cos(2 * np.pi * (i + j))
    flow = jnp.asarray(
        np.stack([u, v], -1)[None].astype(np.float32)).repeat(B, 0)
    got = np.asarray(flow_warp(img, flow, method="window", radius=8))
    want = np.asarray(flow_warp(img, flow, method="gather"))
    psnr = -10 * np.log10(np.mean((got - want) ** 2) + 1e-12)
    assert psnr > 35.0, psnr
    assert np.mean(np.abs(got - want)) < 6e-3


def test_window_warp_differentiable_and_bounded():
    from fvc.ops import flow_warp

    img = jnp.asarray(_rand((1, 24, 24, 3), 9))
    flow = jnp.asarray((_rand((1, 24, 24, 2), 10) - 0.5) * 60)  # beyond radius

    def loss(flow):
        return jnp.sum(jnp.square(flow_warp(img, flow, method="window",
                                            radius=4)))

    out = flow_warp(img, flow, method="window", radius=4)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.max(out)) <= 1.0 + 1e-5
    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()


def test_s2d_packed_conv_exact():
    """space_to_depth-packed convolution (the MXU-utilization transform used
    by MEBasic) is exactly equivalent to the canonical stride-1 conv."""
    from fvc.ops.conv import (conv2d, depth_to_space, pack_s2d_weights,
                              space_to_depth)

    rng = np.random.RandomState(0)
    for (k, r, cin, cout, H, W) in [(7, 2, 8, 32, 16, 20), (7, 2, 16, 2, 32, 12),
                                    (3, 2, 6, 64, 16, 16), (7, 4, 16, 2, 32, 24)]:
        x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))
        b = jnp.asarray(rng.randn(cout).astype(np.float32))
        ref = conv2d(x, w, b, stride=1, padding=k // 2)
        wp, pad = pack_s2d_weights(w, r)
        got = depth_to_space(
            conv2d(space_to_depth(x, r), wp, jnp.tile(b, r * r),
                   stride=1, padding=(pad, pad)), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
    # roundtrip
    x = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x))


def test_mebasic_packed_matches_unpacked():
    """MEBasic auto-packs on even shapes; odd shapes fall back. Same params
    must give the same function."""
    from fvc.ops.spynet import MEBasic

    net = MEBasic()
    x_even = jnp.asarray(_rand((1, 16, 20, 8), 12)) - 0.5
    params = net.init(jax.random.PRNGKey(0), x_even)
    y_even = net.apply(params, x_even)          # packed path
    # embed the even-size input in an odd-size canvas: interior must agree
    x_odd = jnp.pad(x_even, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y_odd = net.apply(params, x_odd)            # unpacked path
    np.testing.assert_allclose(np.asarray(y_even[:, :8, :8]),
                               np.asarray(y_odd[:, :8, :8]), atol=1e-5)


@pytest.mark.parametrize("align", [False, True])
def test_upsample2x_shift_path_matches_take_path(align):
    # upsample2x uses the TPU-fast shift+interleave decomposition; it must be
    # bit-identical to the gather-based bilinear_resize (itself torch-golden)
    # for every geometry, including edge rows/cols and degenerate sizes.
    from fvc.ops import bilinear_resize, upsample2x

    for i, shape in enumerate([(1, 1, 1, 1), (1, 2, 3, 2), (2, 5, 7, 3),
                               (1, 64, 96, 4), (3, 17, 13, 5)]):
        x = jnp.asarray(_rand(shape, 100 + i))
        a = np.asarray(upsample2x(x, align_corners=align))
        b = np.asarray(bilinear_resize(x, 2 * shape[1], 2 * shape[2],
                                       align_corners=align))
        np.testing.assert_array_equal(a, b)


def test_bilinear_resize_integer_factor_matches_torch():
    # Integer upscale factors route through the gather-free phase path; they
    # must still match torch F.interpolate exactly.
    from fvc.ops import bilinear_resize

    x = _rand((2, 6, 10, 3), 11)
    for oh, ow in [(24, 40), (12, 10), (6, 30), (18, 20)]:
        out = np.asarray(bilinear_resize(jnp.asarray(x), oh, ow,
                                         align_corners=False))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (oh, ow),
                            mode="bilinear", align_corners=False)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(),
                                   atol=1e-6)


def test_laplace_likelihood_gradients_finite_at_extremes():
    """Regression: at small sigma the unselected where-branch used to
    overflow (exp(+(0.5-a)/sigma)) and poison gradients with 0*inf = NaN —
    which froze every transform-path gradient through bpp_res while
    optax.zero_nans silently ate it. Both value and grad must be finite for
    any (x, sigma_raw) with sigma = exp(min(raw, 50))."""
    from fvc.ops.math import bits_from_likelihood, laplace_interval_likelihood

    def f(x, raw):
        s = jnp.exp(jnp.minimum(raw, 50.0))
        return jnp.sum(bits_from_likelihood(
            laplace_interval_likelihood(x[None], s[None])))

    for raw in (-200.0, -50.0, -11.6, -5.0, 0.0, 10.0, 50.0):
        for xv in (0.0, 0.3, 0.7, 5.0, 100.0, 3000.0):
            v = f(jnp.float32(xv), jnp.float32(raw))
            gx, gr = jax.grad(f, argnums=(0, 1))(jnp.float32(xv),
                                                 jnp.float32(raw))
            assert np.isfinite(float(v)), (xv, raw, float(v))
            assert np.isfinite(float(gx)) and np.isfinite(float(gr)), (
                xv, raw, float(gx), float(gr))
