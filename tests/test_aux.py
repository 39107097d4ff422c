"""Aux subsystem tests: data pipelines, BOLA sim, checkpointing, meters."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_synthetic_dataset_motion_structure():
    from fvc.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(num_videos=2, frames=4, height=64, width=64)
    clip = ds[0]
    assert clip.shape == (4, 64, 64, 3)
    assert clip.min() >= 0 and clip.max() <= 1
    # consecutive frames correlated but not identical (motion + noise)
    d01 = np.abs(clip[1] - clip[0]).mean()
    drand = np.abs(ds[1][0] - clip[0]).mean()
    assert 0 < d01 < drand


def test_yuv_roundtrip(tmp_path):
    from fvc.data.datasets import read_yuv

    H, W, T = 32, 48, 3
    rng = np.random.RandomState(0)
    y = rng.randint(0, 256, (T, H, W), dtype=np.uint8)
    u = rng.randint(0, 256, (T, H // 2, W // 2), dtype=np.uint8)
    v = rng.randint(0, 256, (T, H // 2, W // 2), dtype=np.uint8)
    path = str(tmp_path / f"test_{W}x{H}.yuv")
    with open(path, "wb") as f:
        for t in range(T):
            f.write(y[t].tobytes())
            f.write(u[t].tobytes())
            f.write(v[t].tobytes())
    clip = read_yuv(path, W, H)
    assert clip.shape == (T, H, W, 3)
    assert clip.dtype == np.float32
    assert 0 <= clip.min() and clip.max() <= 1


def test_video_dataset_gop_iteration(tmp_path):
    from fvc.data.datasets import VideoDataset

    H, W = 16, 24
    rng = np.random.RandomState(0)
    path = str(tmp_path / f"clip_{W}x{H}.yuv")
    nframes = 10
    with open(path, "wb") as f:
        f.write(rng.randint(0, 256, nframes * (H * W + 2 * (H // 2) * (W // 2)),
                            dtype=np.uint8).tobytes())
    ds = VideoDataset(str(tmp_path))
    assert len(ds) == 1
    gops = list(ds.iter_gops(gop_size=4))
    assert len(gops) == 2  # 10 frames -> two full GOPs of 4, tail dropped
    assert gops[0].shape == (4, H, W, 3)


def test_frame_dataset_synthetic_fallback():
    from fvc.data.datasets import FrameDataset

    ds = FrameDataset(root=None, crop=64, frames=7, num_synthetic=3)
    assert len(ds) == 3
    assert ds[0].shape == (7, 64, 64, 3)


def test_multiview_dataset_and_sampling_pool():
    from fvc.data.datasets import MultiViewVideoDataset

    ds = MultiViewVideoDataset(category="office", gop=4, height=32, width=32,
                               sample_interval=2.0, c2s_ratio=1.0,
                               max_pool_size=3, num_samples=4)
    item = ds[0]
    assert item.shape == (4, 4, 32, 32, 3)  # [gop, views(office=4), H, W, 3]
    for _ in range(10):
        s = ds.sample()
        assert s.shape == (4, 4, 32, 32, 3)
    assert len(ds._pool) <= 3


def test_bola_simulation_prefers_high_bw():
    from fvc.sim.bola import BolaConfig, simulate_over_trace

    levels, segments = 4, 200
    rng = np.random.RandomState(0)
    psnr = np.linspace(32, 40, levels)[:, None] + rng.rand(levels, segments) * 0.1
    bitrate = np.linspace(1e6, 8e6, levels)[:, None] * np.ones((1, segments))
    dect = np.full((levels, segments), 0.2)

    hi = simulate_over_trace(psnr, bitrate, dect, [50e6] * 2000, [0.0] * 2000)
    lo = simulate_over_trace(psnr, bitrate, dect, [1.5e6] * 2000, [0.0] * 2000)
    assert hi[0] > lo[0]          # QoE better with bandwidth
    assert hi[1] >= lo[1]         # quality too
    assert lo[2] >= hi[2] - 1e-9  # rebuffering no better on slow link


def test_checkpoint_roundtrip_and_tolerant_loaders(tmp_path):
    from fvc.train.checkpoint import (
        latest_checkpoint, load_only, load_whatever, load_with_copy,
        restore_checkpoint, save_checkpoint,
    )

    payload = {"params": {"a": np.ones((2, 2), np.float32),
                          "b": np.zeros((3,), np.float32)},
               "step": np.asarray(7, np.int32)}
    path = save_checkpoint(str(tmp_path), 7, payload)
    assert latest_checkpoint(str(tmp_path)) == path
    restored = restore_checkpoint(path, payload)
    np.testing.assert_allclose(restored["params"]["a"], payload["params"]["a"])

    # tolerant loaders
    target = {"x": np.zeros((2, 2)), "y": np.zeros((5,)), "z": np.zeros((1,))}
    source = {"x": np.ones((2, 2)), "y": np.ones((3,)), "w": np.ones((1,))}
    out = load_whatever(target, source)
    np.testing.assert_allclose(out["x"], 1.0)   # shape match -> copied
    np.testing.assert_allclose(out["y"], 0.0)   # shape mismatch -> kept
    out2 = load_only(target, source, keyword="x")
    np.testing.assert_allclose(out2["x"], 1.0)

    tgt = {"img_decoder": {"k": np.zeros((2,))},
           "backup_img_decoder": {"k": np.zeros((2,))}}
    src = {"img_decoder": {"k": np.full((2,), 3.0)}}
    out3 = load_with_copy(tgt, src)
    np.testing.assert_allclose(out3["img_decoder"]["k"], 3.0)
    np.testing.assert_allclose(out3["backup_img_decoder"]["k"], 3.0)  # mirrored


def test_meters():
    from fvc.utils.meters import AverageMeter, encode_decode_summary, make_stage_meters

    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    meters = make_stage_meters()
    meters["E-FL"].update(0.5)
    meters["D-MV"].update(0.25)
    enc, dec = encode_decode_summary(meters)
    assert enc == 0.75 and dec == 0.25


def test_anchor_pack_views():
    from fvc.anchors.x26x import pack_views

    frames = np.random.RandomState(0).rand(2, 3, 8, 8, 3).astype(np.float32)
    assert pack_views(frames, 0).shape == (6, 8, 8, 3)
    assert pack_views(frames, 1).shape == (2, 8, 24, 3)
    assert pack_views(frames, 2).shape == (2, 24, 8, 3)
    assert pack_views(frames, 3).shape == (2, 16, 16, 3)  # 2x2 grid w/ 1 pad


def test_padding_helpers():
    from fvc.gop.padding import (
        crop_to, iter_gops_padded, masked_mean, pad_gop_tail, pad_to_multiple,
    )

    rng = np.random.RandomState(0)
    frames = rng.rand(5, 100, 130, 3).astype(np.float32)
    padded, hw = pad_to_multiple(frames, 64)
    assert padded.shape == (5, 128, 192, 3) and hw == (100, 130)
    np.testing.assert_allclose(crop_to(padded, hw), frames)
    # edge padding replicates the boundary
    np.testing.assert_allclose(padded[:, 100:, :130], 
                               np.repeat(frames[:, 99:100], 28, axis=1))

    tail, mask = pad_gop_tail(frames[:3], 8)
    assert tail.shape[0] == 8 and mask.tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    np.testing.assert_allclose(tail[3:], np.repeat(frames[2:3], 5, axis=0))

    # masked mean over P-frame scalars (mask has the I-frame slot)
    vals = np.array([1.0, 2.0, 100.0])
    m = np.array([1, 1, 1, 0], np.float32)  # gop 4: I + 2 valid P + 1 pad
    assert masked_mean(vals, m) == 1.5

    clip = rng.rand(10, 32, 32, 3).astype(np.float32)
    gops = list(iter_gops_padded(clip, 4))
    assert len(gops) == 3  # 4 + 4 + 2(padded)
    assert gops[-1][1].sum() == 2


def test_flow_to_image():
    from fvc.utils.flow_vis import flow_to_image

    flow = np.zeros((8, 8, 2), np.float32)
    img = flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert (img == 255).all()  # zero flow -> white
    flow[..., 0] = 5.0
    a = flow_to_image(flow)
    b = flow_to_image(-flow)
    assert (a != b).any()  # direction changes hue


def test_bola_from_eval_log_and_degenerate_ladder(tmp_path):
    """Eval logs feed the BOLA sim (reference task_to_video_trace,
    simulation.py:113-204); equal-bitrate ladders must not hang the
    level-selection loop (0/0 alpha guard)."""
    from fvc.sim.bola import BolaConfig, parse_eval_logs, simulate_over_trace

    log = tmp_path / "rd.log"
    log.write_text(
        "LSVC-l1 synthetic 0.500000 30.0000 0.010000\n"
        "29.5 30.5\n"
        "LSVC-l2 synthetic 0.500000 33.0000 0.012000\n"  # same bpp: degenerate
        "32.5 33.5\n")
    psnr, bitrate, dect, tags = parse_eval_logs(
        str(log), width=256, height=256, fps=30.0, gop=4, segments=20)
    assert tags == ["LSVC-l1", "LSVC-l2"]
    assert psnr.shape == bitrate.shape == dect.shape == (2, 20)
    assert np.allclose(bitrate, 0.5 * 256 * 256 * 30.0)
    down = np.full(500, 20e6)
    qoe, qual, rebuf, stall, bw = simulate_over_trace(
        psnr, bitrate, dect, down, np.zeros(500), BolaConfig(gop=4))
    assert np.isfinite([qoe, qual, rebuf, stall, bw]).all()


def test_parse_eval_logs_five_entry_psnr_lines(tmp_path):
    """Header detection must be tag-based: a 5-entry psnr line (GOP 6) is not
    a header even though headers also have 5 fields."""
    from fvc.sim.bola import parse_eval_logs

    log = tmp_path / "rd.log"
    log.write_text("LSVC-l1 uvg 0.300000 31.0000 0.010000\n"
                   "30.1 30.9 31.2 31.0 31.3\n"
                   "LSVC-l2 uvg 0.600000 34.0000 0.012000\n"
                   "33.8 34.1 34.2 34.0 34.4\n")
    psnr, br, dect, tags = parse_eval_logs(
        str(log), width=640, height=960, fps=30, gop=6, segments=10)
    assert tags == ["LSVC-l1", "LSVC-l2"]
    assert abs(psnr[0, 0] - 30.1) < 1e-6 and abs(psnr[1, 0] - 33.8) < 1e-6


def test_mjpeg_anchor_roundtrip_and_monotone():
    """In-container anchor (fvc/anchors/mjpeg.py): real byte counts, higher
    quality -> more bits and higher PSNR, reconstruction in [0,1]."""
    import numpy as np

    from fvc.anchors.mjpeg import compress_frame, compress_video

    rng = np.random.RandomState(0)
    img = rng.rand(48, 64, 3).astype(np.float32)
    k = np.ones(5, np.float32) / 5
    for ax in (0, 1):
        img = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, img)

    rec_lo, bits_lo = compress_frame(img, 10)
    rec_hi, bits_hi = compress_frame(img, 90)
    assert bits_hi > bits_lo > 0
    assert rec_lo.min() >= 0.0 and rec_lo.max() <= 1.0
    mse_lo = np.mean((rec_lo - img) ** 2)
    mse_hi = np.mean((rec_hi - img) ** 2)
    assert mse_hi < mse_lo

    out = compress_video(np.stack([img, img]), 50)
    assert out["bpp"] > 0 and len(out["psnr_list"]) == 2
    assert out["recon"].shape == (2, 48, 64, 3)


def test_committed_traces_load_and_simulate():
    """The committed trace set (data/traces, scripts/gen_traces.py) loads
    through the FCC CSV reader and drives the BOLA simulation."""
    import os

    import numpy as np

    from fvc.sim.bola import BolaConfig, load_fcc_trace_csv, simulate_over_trace

    path = "data/traces/lte_mobile.csv"
    assert os.path.exists(path), "run scripts/gen_traces.py"
    down, lat = load_fcc_trace_csv(path)
    assert len(down) > 500 and np.all(down > 1e6) and np.all(down < 100e6)

    L, S = 4, 50
    bitrate = np.geomspace(1e6, 8e6, L)[:, None] * np.ones((1, S))
    psnr = 30.0 + 3.0 * np.log2(bitrate / 1e6)
    dect = np.full_like(bitrate, 0.16)
    qoe, quality, rebuffer, stall, bw = simulate_over_trace(
        psnr, bitrate, dect, down[:100], lat[:100], BolaConfig())
    assert np.isfinite(qoe) and quality > 20.0
