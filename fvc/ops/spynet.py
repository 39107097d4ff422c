"""SpyNet pyramidal optical flow (ME_Spynet, models.py:833-887).

4-level coarse-to-fine estimation: 2x avg-pool pyramid; at each level a 5-conv
(7x7) MEBasic refines the 2x-upsampled coarser flow given
cat(ref, warp(target, flow_up), flow_up).

The whole pyramid is shape-static and batch-parallel — on TPU all frames of a
GOP run as one batch through each level (the LSVC batched-flow path,
models.py:1354).

Pretrained weights: the reference ships SpyNet conv weights as .npy (OIHW) in
DVC/flow_pretrain_np (loaded at DVC/subnet/endecoder.py:122-139); `load_npy_weights`
converts them into this module's param pytree (HWIO) for golden parity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fvc.ops.conv import Conv
from fvc.ops.resize import avg_pool2, upsample2x
from fvc.ops.warp import flow_warp


class MEBasic(nn.Module):
    """8 -> 32 -> 64 -> 32 -> 16 -> 2, all 7x7 stride 1.

    When H and W divide by the packing factor the whole stack runs
    space_to_depth(r)-packed — an exact transform that keeps the
    tiny-channel 7x7 convs on the MXU's fast path
    (fvc.ops.conv.pack_s2d_weights); parameters stay canonical.

    `s2d_max` caps the packing factor (largest r in {4, 2, 1} that divides
    both dims is used). r=2 gives 32..256-channel convs with a 5x5 packed
    kernel (2.04x structural-zero FLOPs); r=4 gives 128..1024-channel 3x3
    convs at 1/16 the positions (2.94x structural FLOPs) — on the MXU the
    wider contraction more than pays for the extra FLOPs at tiny channel
    counts. The env var FVC_SPYNET_S2D overrides (read at trace time)."""

    s2d_max: int = 2

    @nn.compact
    def __call__(self, x):
        from fvc.ops.conv import depth_to_space, space_to_depth

        # NB trace-time read: the value is baked into the jitted program —
        # changing the env after a program is cached has no effect until a
        # new shape/jit triggers a retrace.
        raw = os.environ.get("FVC_SPYNET_S2D", "")
        if raw and raw.strip() not in ("1", "2", "4"):
            raise ValueError(
                f"FVC_SPYNET_S2D={raw!r}: accepted values are 1, 2 or 4 "
                "(space-to-depth packing factor for the MEBasic stacks)")
        r_max = int(raw) if raw else self.s2d_max
        r = 1
        for cand in (4, 2):
            if (cand <= r_max and x.shape[1] % cand == 0
                    and x.shape[2] % cand == 0):
                r = cand
                break
        if r > 1:
            x = space_to_depth(x, r)
        x = jax.nn.relu(Conv(32, kernel=7, s2d=r)(x))
        x = jax.nn.relu(Conv(64, kernel=7, s2d=r)(x))
        x = jax.nn.relu(Conv(32, kernel=7, s2d=r)(x))
        x = jax.nn.relu(Conv(16, kernel=7, s2d=r)(x))
        # zero-init: each pyramid level starts as "keep the upsampled coarse
        # flow" (see Conv.zero_init); pretrained .npy weights override this
        x = Conv(2, kernel=7, zero_init=True, s2d=r)(x)
        return depth_to_space(x, r) if r > 1 else x


class SpyNet(nn.Module):
    levels: int = 4

    @nn.compact
    def __call__(self, im1, im2):
        """Flow that warps im2 toward im1 (reference call order
        opticFlow(Y1_raw, Y0_com), models.py:989). NHWC in, [B,H,W,2] out.

        Under the bf16 activation policy the image pyramid and conv stream
        ride bf16; the flow itself accumulates in f32 (2 channels — cheap)
        to keep subpixel precision across the coarse-to-fine chain."""
        from fvc.core.policy import compute_dtype

        dt = compute_dtype()
        if dt is not None:
            im1 = im1.astype(dt)
            im2 = im2.astype(dt)
        pyr1 = [im1]
        pyr2 = [im2]
        for _ in range(self.levels - 1):
            pyr1.append(avg_pool2(pyr1[-1]))
            pyr2.append(avg_pool2(pyr2[-1]))

        from fvc.core.policy import pallas_spynet_enabled

        use_pallas = pallas_spynet_enabled() and not self.is_initializing()
        b = im1.shape[0]
        h, w = pyr1[-1].shape[1] // 2, pyr1[-1].shape[2] // 2
        flow = jnp.zeros((b, h, w, 2), jnp.float32)
        for lvl in range(self.levels):
            flow_up = upsample2x(flow, align_corners=False) * 2.0
            ref = pyr1[self.levels - 1 - lvl]
            tgt = pyr2[self.levels - 1 - lvl]
            inp = jnp.concatenate(
                [ref, flow_warp(tgt, flow_up), flow_up.astype(ref.dtype)],
                axis=-1)
            if use_pallas:
                # fused VMEM-resident 5-conv kernel (exact, incl. borders)
                from fvc.ops.pallas_spynet import fused_mebasic_tiles

                delta = fused_mebasic_tiles(
                    inp, self.variables["params"][f"level{lvl}"])
            else:
                delta = MEBasic(name=f"level{lvl}")(inp)
            flow = flow_up + delta.astype(jnp.float32)
        return flow


def load_npy_weights(params: dict, weights_dir: str) -> dict:
    """Graft the reference's pretrained SpyNet .npy weights (OIHW + bias) into a
    SpyNet param pytree. Level l, conv k maps to modelL{l+1}_F-{k+1}-{weight,bias}.npy.
    Returns a new pytree; raises FileNotFoundError if the directory is missing."""
    if not os.path.isdir(weights_dir):
        raise FileNotFoundError(weights_dir)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    for lvl in range(4):
        level = params[f"level{lvl}"]
        for k in range(5):
            w = np.load(os.path.join(weights_dir, f"modelL{lvl + 1}_F-{k + 1}-weight.npy"))
            b = np.load(os.path.join(weights_dir, f"modelL{lvl + 1}_F-{k + 1}-bias.npy"))
            conv = level[f"Conv_{k}"]
            conv["kernel"] = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW->HWIO
            conv["bias"] = jnp.asarray(b)
    return params


DEFAULT_WEIGHTS_DIR = "/root/reference/DVC/flow_pretrain_np/"
