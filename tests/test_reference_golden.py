"""Golden MODULE-level parity: fvc flax modules vs the reference's OWN
PyTorch code (/root/reference/DVC/subnet), same weights, same input.

Op-level parity (test_ops_parity.py) checks the primitives; this closes the
remaining gap — "is the transform stack actually the same function?" — by
importing the reference modules directly (the only blocked interop is the
DVC .model checkpoints, which are not shipped; the code itself imports fine
with a 3-line torchvision stub — only save_image is referenced, GDN.py:5).

Covered (reference file:line):
- GDN/IGDN                      DVC/subnet/GDN.py:9-93
- Analysis_net/Synthesis_net    DVC/subnet/analysis.py:10-60, synthesis.py:8-58
- Analysis_mv/Synthesis_mv      DVC/subnet/analysis_mv.py:8-82, synthesis_mv.py:9-79
- Analysis_prior/Synthesis_prior DVC/subnet/analysis_prior.py:10-56, synthesis_prior.py:11-58
- Warp_net                      DVC/subnet/endecoder.py:262-298
- ME_Spynet (pretrained .npy)   DVC/subnet/endecoder.py:312-356
- window-warp divergence bound on REAL SpyNet flow fields (not synthetic
  smooth flow) — the production warp's honesty check.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "DVC", "subnet")),
    reason="reference not present")


@pytest.fixture(scope="module")
def subnet():
    """Import the reference's DVC.subnet with a minimal torchvision stub."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tvu
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch.manual_seed(0)
    from DVC import subnet as sn
    return sn


# ---------------------------------------------------------------------------
# weight transplant helpers (torch -> flax)
# ---------------------------------------------------------------------------

def t_conv(m):
    """nn.Conv2d [co,ci,kh,kw] -> fvc Conv {kernel HWIO, bias}."""
    w = m.weight.detach().numpy().transpose(2, 3, 1, 0)
    return {"kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(m.bias.detach().numpy())}


def t_deconv(m):
    """nn.ConvTranspose2d [ci,co,kh,kw] -> fvc Deconv (correlation form:
    spatial flip + in/out stay as HWIO [kh,kw,ci,co])."""
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    return {"kernel": jnp.asarray(np.ascontiguousarray(w)),
            "bias": jnp.asarray(m.bias.detach().numpy())}


def t_gdn(g):
    """Reference GDN gamma is [out,in] (conv2d weight view, GDN.py:79);
    fvc computes x^2 @ gamma -> transpose."""
    return {"beta": jnp.asarray(g.beta.detach().numpy()),
            "gamma": jnp.asarray(g.gamma.detach().numpy().T.copy())}


def _randomize(module, seed=0):
    """Give every conv/param a non-degenerate random value (reference inits
    are fine but biases of 0.01 make weak tests; use full-range weights)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.rand(p.shape, generator=g) * 0.2 - 0.1)
    return module


def _rand_nchw(shape, seed=0):
    rng = np.random.RandomState(seed)
    return (rng.rand(*shape).astype(np.float32) - 0.5)


def _cmp(jax_nhwc, torch_nchw, atol):
    got = np.asarray(jax_nhwc).transpose(0, 3, 1, 2)
    want = torch_nchw.detach().numpy()
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


# ---------------------------------------------------------------------------
# GDN
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("inverse", [False, True])
def test_gdn_golden(subnet, inverse):
    from fvc.ops.gdn import GDN

    ch = 16
    tg = subnet.GDN(ch, inverse=inverse)
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        tg.beta.copy_(torch.rand(ch, generator=gen) + 0.5)
        tg.gamma.copy_(torch.rand(ch, ch, generator=gen) * 0.3 + 0.01)
    x = _rand_nchw((2, ch, 13, 17), 1) * 2.0
    want = tg(torch.from_numpy(x))
    got = GDN(inverse=inverse).apply(
        {"params": t_gdn(tg)}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-5)


# ---------------------------------------------------------------------------
# Residual analysis / synthesis (5x5 s2 conv + GDN stacks)
# ---------------------------------------------------------------------------

def test_analysis_net_golden(subnet):
    from fvc.models.lsvc import ResAnalysis

    t = _randomize(subnet.Analysis_net(), 10)
    x = _rand_nchw((2, 3, 64, 64), 2)
    want = t(torch.from_numpy(x))
    params = {
        "Conv_0": t_conv(t.conv1), "GDN_0": t_gdn(t.gdn1),
        "Conv_1": t_conv(t.conv2), "GDN_1": t_gdn(t.gdn2),
        "Conv_2": t_conv(t.conv3), "GDN_2": t_gdn(t.gdn3),
        "Conv_3": t_conv(t.conv4),
    }
    got = ResAnalysis().apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-5)


def test_synthesis_net_golden(subnet):
    from fvc.models.lsvc import ResSynthesis

    t = _randomize(subnet.Synthesis_net(), 11)
    x = _rand_nchw((1, 96, 8, 8), 3)
    want = t(torch.from_numpy(x))
    params = {
        "Deconv_0": t_deconv(t.deconv1), "GDN_0": t_gdn(t.igdn1),
        "Deconv_1": t_deconv(t.deconv2), "GDN_1": t_gdn(t.igdn2),
        "Deconv_2": t_deconv(t.deconv3), "GDN_2": t_gdn(t.igdn3),
        "Deconv_3": t_deconv(t.deconv4),
    }
    got = ResSynthesis().apply({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-4)


# ---------------------------------------------------------------------------
# Motion-vector analysis / synthesis (8-layer LeakyReLU stacks)
# ---------------------------------------------------------------------------

def test_analysis_mv_golden(subnet):
    from fvc.models.lsvc import MVAnalysis

    t = _randomize(subnet.Analysis_mv_net(), 12)
    x = _rand_nchw((2, 2, 32, 32), 4) * 4.0  # flow-scale input
    want = t(torch.from_numpy(x))
    params = {f"Conv_{i}": t_conv(getattr(t, f"conv{i + 1}"))
              for i in range(8)}
    got = MVAnalysis().apply({"params": params},
                             jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-5)


def test_synthesis_mv_golden(subnet):
    from fvc.models.lsvc import MVSynthesis

    t = _randomize(subnet.Synthesis_mv_net(), 13)
    x = _rand_nchw((1, 128, 4, 4), 5)
    want = t(torch.from_numpy(x))
    # torch deconv1/3/5/7 are ConvTranspose2d -> Deconv_0..3;
    # deconv2/4/6/8 are plain Conv2d -> Conv_0..3 (synthesis_mv.py:15-43)
    params = {}
    for i in range(4):
        params[f"Deconv_{i}"] = t_deconv(getattr(t, f"deconv{2 * i + 1}"))
        params[f"Conv_{i}"] = t_conv(getattr(t, f"deconv{2 * i + 2}"))
    got = MVSynthesis().apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-4)


# ---------------------------------------------------------------------------
# Hyperprior analysis / synthesis
# ---------------------------------------------------------------------------

def test_analysis_prior_golden(subnet):
    from fvc.models.lsvc import PriorAnalysis

    t = _randomize(subnet.Analysis_prior_net(), 14)
    x = _rand_nchw((2, 96, 16, 16), 6)
    want = t(torch.from_numpy(x))
    params = {f"Conv_{i}": t_conv(getattr(t, f"conv{i + 1}"))
              for i in range(3)}
    got = PriorAnalysis().apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-5)


def test_synthesis_prior_golden(subnet):
    from fvc.models.lsvc import PriorSynthesis

    t = _randomize(subnet.Synthesis_prior_net(), 15)
    x = _rand_nchw((1, 64, 4, 4), 7)
    want = t(torch.from_numpy(x))  # ends in exp() = sigma
    # deconv3 is a stride-1 ConvTranspose2d(k3,p1) == plain conv with the
    # flipped/transposed kernel -> fvc Conv_0
    params = {
        "Deconv_0": t_deconv(t.deconv1),
        "Deconv_1": t_deconv(t.deconv2),
        "Conv_0": t_deconv(t.deconv3),
    }
    got = PriorSynthesis().apply({"params": params},
                                 jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-4)


# ---------------------------------------------------------------------------
# Warp_net (MC refinement U-net)
# ---------------------------------------------------------------------------

def test_warp_net_golden(subnet):
    from fvc.ops.blocks import WarpNet

    t = _randomize(subnet.Warp_net(), 16)
    x = _rand_nchw((1, 6, 64, 64), 8)
    want = t(torch.from_numpy(x))
    params = {"Conv_0": t_conv(t.feature_ext), "Conv_1": t_conv(t.conv6)}
    for i in range(6):
        rb = getattr(t, f"conv{i}")
        params[f"ResBlock_{i}"] = {"Conv_0": t_conv(rb.conv1),
                                   "Conv_1": t_conv(rb.conv2)}
    got = WarpNet().apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(got, want, 1e-4)


# ---------------------------------------------------------------------------
# ME_Spynet with the shipped pretrained .npy weights
# ---------------------------------------------------------------------------

def _moving_clip(h=64, w=64, seed=0, shift=(3.0, 1.5)):
    """Two smooth frames related by a subpixel translation."""
    rng = np.random.RandomState(seed)
    big = rng.rand(h + 16, w + 16, 3).astype(np.float32)
    k = np.ones(7, np.float32) / 7
    for ax in (0, 1):
        big = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, big)
    big = (big - big.min()) / (big.max() - big.min() + 1e-6)

    def crop(oy, ox):
        iy, fy = int(np.floor(oy)), oy - np.floor(oy)
        ix, fx = int(np.floor(ox)), ox - np.floor(ox)
        win = big[iy:iy + h + 1, ix:ix + w + 1]
        top = win[:h, :w] * (1 - fx) + win[:h, 1:w + 1] * fx
        bot = win[1:h + 1, :w] * (1 - fx) + win[1:h + 1, 1:w + 1] * fx
        return top * (1 - fy) + bot * fy

    return (crop(4.0, 4.0).astype(np.float32),
            crop(4.0 + shift[1], 4.0 + shift[0]).astype(np.float32))


@pytest.fixture(scope="module")
def ref_spynet(subnet):
    """Reference ME_Spynet — constructed with cwd=/root/reference because
    endecoder.py:9 hard-codes the relative .npy path. torch_warp
    (endecoder.py:52-67) hard-codes .cuda() when a grid-cache entry is
    missing, so pre-populate the cache for the CPU flow shapes used here
    (device.index is None on CPU -> dict keyed by None)."""
    ende = sys.modules["DVC.subnet.endecoder"]
    ende.Backward_tensorGrid = {None: {}}
    for s in (8, 16, 32, 64):
        th = torch.linspace(-1, 1, s).view(1, 1, 1, s).expand(1, 1, s, s)
        tv = torch.linspace(-1, 1, s).view(1, 1, s, 1).expand(1, 1, s, s)
        ende.Backward_tensorGrid[None][str(torch.Size([1, 2, s, s]))] = (
            torch.cat([th, tv], 1))
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        return subnet.ME_Spynet()
    finally:
        os.chdir(cwd)


def test_me_spynet_golden(subnet, ref_spynet):
    """Full 4-level pyramid vs the reference's own module, same .npy
    weights, gather warp for bit-close grid_sample parity."""
    import flax

    from fvc.ops.spynet import DEFAULT_WEIGHTS_DIR, SpyNet, load_npy_weights
    from fvc.ops.warp import warp_method

    im1, im2 = _moving_clip()
    t1 = torch.from_numpy(im1.transpose(2, 0, 1)[None])
    t2 = torch.from_numpy(im2.transpose(2, 0, 1)[None])
    with torch.no_grad():
        want = ref_spynet(t1, t2).numpy()  # [1,2,H,W]

    model = SpyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(im1[None]),
                           jnp.asarray(im2[None]))
    variables = flax.core.unfreeze(variables)
    variables["params"] = load_npy_weights(variables["params"],
                                           DEFAULT_WEIGHTS_DIR)
    with warp_method("gather"):
        got = model.apply(variables, jnp.asarray(im1[None]),
                          jnp.asarray(im2[None]))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    # the reference upsamples flow with align_corners default=False — same
    # as fvc; remaining delta is conv summation order
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    # and the flow is actually meaningful: im2 is im1 translated by +shift,
    # so the backward flow that pulls im2 onto im1 is -shift (interior only;
    # pyramid flow is least reliable at borders)
    interior = got[0, :, 16:-16, 16:-16]
    assert abs(float(interior[0].mean()) + 3.0) < 0.6, interior[0].mean()
    assert abs(float(interior[1].mean()) + 1.5) < 0.6, interior[1].mean()


def test_window_warp_divergence_on_real_flow(subnet, ref_spynet):
    """The production windowed warp vs grid_sample on a REAL SpyNet flow
    field (VERDICT weak #5): assert the approximation bound holds on
    codec-like flow, and measure saturation behavior on large motion."""
    import flax

    from fvc.ops.spynet import DEFAULT_WEIGHTS_DIR, SpyNet, load_npy_weights
    from fvc.ops.warp import flow_warp

    im1, im2 = _moving_clip(seed=5, shift=(5.0, -2.5))
    model = SpyNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(im1[None]),
                           jnp.asarray(im2[None]))
    variables = flax.core.unfreeze(variables)
    variables["params"] = load_npy_weights(variables["params"],
                                           DEFAULT_WEIGHTS_DIR)
    flow = model.apply(variables, jnp.asarray(im1[None]),
                       jnp.asarray(im2[None]))

    img = jnp.asarray(im2[None])
    exact = flow_warp(img, flow, method="gather")
    window = flow_warp(img, flow, method="window", radius=16)
    err = np.asarray(exact) - np.asarray(window)
    psnr = -10 * np.log10(np.mean(err ** 2) + 1e-12)
    assert psnr > 35.0, f"window-warp divergence on real flow: {psnr:.1f} dB"

    # large-motion saturation: flow 4x beyond the radius — the window warp
    # must stay finite/bounded and clamp gracefully (it saturates, by design)
    big_flow = flow * 12.0
    sat = flow_warp(img, big_flow, method="window", radius=16)
    assert np.isfinite(np.asarray(sat)).all()
    assert float(jnp.max(sat)) <= 1.0 + 1e-5
