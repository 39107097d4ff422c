"""End-to-end golden parity: fvc SpyNet with the reference's pretrained .npy
weights vs an independent torch composition of the same pipeline
(avg_pool pyramid -> per-level 5x 7x7 conv refine -> x2 upsample + warp).

This is the strongest parity check available without reference checkpoints:
identical weights, identical input, full 4-level pipeline, bit-close output.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

WEIGHTS = "/root/reference/DVC/flow_pretrain_np/"


def _torch_warp(img, flow):
    B, C, H, W = img.shape
    gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
    gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([gx, gy], 1)
    nf = torch.cat([flow[:, 0:1] / ((W - 1.0) / 2.0),
                    flow[:, 1:2] / ((H - 1.0) / 2.0)], 1)
    return F.grid_sample(img, (grid + nf).permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="border", align_corners=False)


def _torch_spynet(im1, im2, weights):
    """weights: [level][conv] -> (w OIHW, b)."""
    p1, p2 = [im1], [im2]
    for _ in range(3):
        p1.append(F.avg_pool2d(p1[-1], 2, 2))
        p2.append(F.avg_pool2d(p2[-1], 2, 2))
    B = im1.shape[0]
    h, w = p1[-1].shape[2] // 2, p1[-1].shape[3] // 2
    flow = torch.zeros(B, 2, h, w)
    for lvl in range(4):
        up = F.interpolate(flow, scale_factor=2, mode="bilinear",
                           align_corners=False) * 2.0
        ref = p1[3 - lvl]
        tgt = p2[3 - lvl]
        x = torch.cat([ref, _torch_warp(tgt, up), up], 1)
        for k in range(5):
            wk, bk = weights[lvl][k]
            x = F.conv2d(x, wk, bk, padding=3)
            if k < 4:
                x = F.relu(x)
        flow = up + x
    return flow


@pytest.mark.skipif(not os.path.isdir(WEIGHTS), reason="no reference weights")
def test_spynet_pretrained_full_pipeline_parity():
    import flax

    from fvc.ops import SpyNet
    from fvc.ops.spynet import load_npy_weights

    rng = np.random.RandomState(0)
    H = W = 64
    im1 = rng.rand(1, H, W, 3).astype(np.float32)
    im2 = np.clip(np.roll(im1, 2, axis=2) + 0.01 * rng.randn(1, H, W, 3),
                  0, 1).astype(np.float32)

    from fvc.ops.warp import warp_method

    net = SpyNet()
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(im1), jnp.asarray(im2))
    p = flax.core.unfreeze(params)["params"]
    p = load_npy_weights(p, WEIGHTS)
    with warp_method("gather"):  # bit-exact grid_sample parity path
        ours = np.asarray(
            net.apply({"params": p}, jnp.asarray(im1), jnp.asarray(im2)))

    weights = []
    for lvl in range(4):
        level = []
        for k in range(5):
            wk = np.load(os.path.join(WEIGHTS, f"modelL{lvl + 1}_F-{k + 1}-weight.npy"))
            bk = np.load(os.path.join(WEIGHTS, f"modelL{lvl + 1}_F-{k + 1}-bias.npy"))
            level.append((torch.from_numpy(wk), torch.from_numpy(bk)))
        weights.append(level)
    ref = _torch_spynet(torch.from_numpy(im1).permute(0, 3, 1, 2),
                        torch.from_numpy(im2).permute(0, 3, 1, 2), weights)
    ref = ref.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-4)
    # and the flow should be non-trivial (real pretrained weights)
    assert np.abs(ref).max() > 0.1
