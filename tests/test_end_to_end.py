"""End-to-end user-story test: raw clip -> padding -> learned-I + LSVC coding
-> real bitstream -> RD numbers -> BOLA ladder. Exercises the cross-module
seams a user of the reference would hit."""

import numpy as np
import jax
import jax.numpy as jnp

from fvc.core.config import CodecConfig


def test_full_pipeline_synthetic_clip():
    from fvc.data.datasets import SyntheticVideoDataset
    from fvc.gop.padding import iter_gops_padded, masked_mean, pad_to_multiple
    from fvc.models.iframe import IFrameCodec
    from fvc.models.lsvc import LSVC
    from fvc.models.bitstream import LSVCBitstreamCodec
    from fvc.sim.bola import simulate_over_trace

    # 1) data: 100x130 clip of 7 frames — ragged everything
    clip = SyntheticVideoDataset(1, frames=7, height=100, width=130)[0]
    clip, orig_hw = pad_to_multiple(clip, 128)  # learned-I needs 128-align
    gops = list(iter_gops_padded(clip, 4))
    assert len(gops) == 2 and gops[-1][1].sum() == 3

    # 2) codecs
    cfg = CodecConfig.from_name("LSVC")
    lsvc = LSVC(cfg)
    x0 = jnp.asarray(gops[0][0])
    lsvc_vars = lsvc.init(jax.random.PRNGKey(0), x0, training=False)
    icodec = IFrameCodec(planes=32)
    i_vars = icodec.init(jax.random.PRNGKey(1), x0[:1], training=False)

    # 3) code each GOP: learned I-frame then the tree codec, with real bits
    bitcodec = LSVCBitstreamCodec(lsvc, lsvc_vars)
    points = []
    for gop, mask in gops:
        x = jnp.asarray(gop)
        x0_hat, i_out = icodec.apply(i_vars, x[:1], training=False)
        x = x.at[0].set(x0_hat[0])
        streams, info = bitcodec.compress(np.asarray(x))
        decoded = bitcodec.decompress(np.asarray(x)[0], streams, info)
        np.testing.assert_allclose(decoded, info["recon"], atol=1e-5)
        T1, H, W = gop.shape[0] - 1, gop.shape[1], gop.shape[2]
        bpp_act = bitcodec.num_bits(streams) / (T1 * H * W) + float(i_out["bpp_est"]) / T1
        per_frame_mse = np.mean(
            (decoded - np.asarray(gop[1:])) ** 2, axis=(1, 2, 3))
        psnr = masked_mean(10 * np.log10(1.0 / np.maximum(per_frame_mse, 1e-12)), mask)
        points.append((bpp_act, psnr))
    assert all(b > 0 and np.isfinite(p) for b, p in points)

    # 4) feed a (synthetic) ladder into the QoE sim
    levels, segments = 3, 40
    base_bpp = points[0][0]
    bitrate = np.asarray([base_bpp * s * 100 * 130 * 30 for s in (0.5, 1.0, 2.0)]
                         )[:, None] * np.ones((1, segments))
    psnr = np.asarray([points[0][1] - 2, points[0][1], points[0][1] + 2]
                      )[:, None] * np.ones((1, segments))
    dect = np.full((levels, segments), 0.05)
    qoe, qual, rebuf, stall, bw = simulate_over_trace(
        psnr, bitrate, dect, [20e6] * 500, [0.0] * 500)
    assert np.isfinite(qoe) and qual > 0
