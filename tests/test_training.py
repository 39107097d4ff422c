"""Training-loop smoke tests: short runs on synthetic data must reduce loss."""

import numpy as np
import pytest
import jax

from fvc.core.config import CodecConfig
from fvc.data.datasets import SyntheticVideoDataset


def test_train_iterpred_stable_and_improving():
    """With zero-init refinement heads the model starts near a sane operating
    point; assert training stays finite and does not diverge, and that the
    rate-distortion objective trends at or below its start."""
    from fvc.models.dvc import IterPredCodec
    from fvc.train.loop import train_iterpred

    cfg = CodecConfig.from_name("DVC", channels=16, compression_level=2)
    model = IterPredCodec(cfg)
    ds = SyntheticVideoDataset(num_videos=4, frames=4, height=64, width=64)
    _, history = train_iterpred(model, cfg, ds, steps=30, gop=3,
                                learning_rate=1e-3, log_every=1)
    losses = np.asarray([h["loss"] for h in history])
    assert np.isfinite(losses).all()
    head = losses[:5].mean()
    tail = losses[-5:].mean()
    assert tail < 1.5 * head + 1e-3, (head, tail)


def test_train_lsvc_stable_from_zero_init():
    from fvc.models.lsvc import LSVC
    from fvc.train.loop import train_single_view

    cfg = CodecConfig.from_name("LSVC", compression_level=1)
    model = LSVC(cfg)
    ds = SyntheticVideoDataset(num_videos=4, frames=4, height=64, width=64)
    _, history = train_single_view(model, cfg, ds, steps=30, gop=2,
                                   learning_rate=3e-4, log_every=1)
    losses = np.asarray([h["loss"] for h in history])
    psnrs = np.asarray([h["psnr"] for h in history])
    assert np.isfinite(losses).all()
    # zero-init heads start the codec at a sane PSNR (MC == warped frame);
    # threshold tracks the synthetic data's temporal delta (multi-layer
    # occluding clips put the warp-only floor near 19-20 dB)
    assert psnrs[0] > 18.0, psnrs[0]
    assert losses[-5:].mean() < 2.0 * losses[:5].mean() + 1e-3


def test_train_mcvc_olft_only_backup_params_change():
    from fvc.models.mcvc import MCVC
    from fvc.data.datasets import MultiViewVideoDataset
    from fvc.train.loop import train_multiview_olft

    cfg = CodecConfig.from_name("MCVC-IA-OLFT", num_views=4, resilience=1,
                                sample_ratio=0.05, compression_level=1)
    model = MCVC(cfg, planes=32, mid=16)
    ds = MultiViewVideoDataset(category="office", gop=2, height=128, width=128,
                               num_samples=2)
    variables, history = train_multiview_olft(
        model, cfg, ds, steps=3, learning_rate=1e-3)
    assert len(history) == 3
    assert all(np.isfinite(h["mse"]) and np.isfinite(h["psnr"])
               for h in history)


def test_probe_sample_interval():
    from fvc.train.loop import probe_sample_interval

    assert probe_sample_interval(0.5, 0.1) == 5.0
    assert probe_sample_interval(0.01, 0.1) == 1.0  # floor at 1


def test_bd_rate_known_values():
    from fvc.train.evaluate import bd_psnr, bd_rate

    # curve 2 = curve 1 shifted to half the rate at equal PSNR -> BD-rate -50%
    r1 = np.array([1.0, 2.0, 4.0, 8.0])
    p1 = np.array([30.0, 33.0, 36.0, 39.0])
    r2 = r1 / 2.0
    bd = bd_rate(r1, p1, r2, p1)
    assert abs(bd - (-50.0)) < 1.0, bd
    # identical curves -> 0
    assert abs(bd_rate(r1, p1, r1, p1)) < 1e-9
    assert abs(bd_psnr(r1, p1, r1, p1)) < 1e-9
    # curve 2 = +1 dB at equal rate
    assert abs(bd_psnr(r1, p1, r1, p1 + 1.0) - 1.0) < 1e-6


def test_eval_log_format(tmp_path):
    from fvc.train.evaluate import write_eval_log

    results = [{"bpp": 0.1, "psnr": 32.0, "psnr_list": [31.0, 33.0],
                "time_per_frame": 0.01, "i_bpp": None, "i_psnr": None}]
    path = str(tmp_path / "LSVC.UVG.log")
    write_eval_log(path, "LSVC", "UVG", results)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("LSVC UVG 0.1")


def test_pretrain_multiview_early_stop():
    from fvc.models.mcvc import MCVC
    from fvc.data.datasets import MultiViewVideoDataset
    from fvc.train.loop import pretrain_multiview

    cfg = CodecConfig.from_name("MCVC-IA", num_views=4, compression_level=1)
    model = MCVC(cfg, planes=32, mid=16)
    ds = MultiViewVideoDataset(category="office", gop=2, height=128, width=128,
                               num_samples=2)
    _, history = pretrain_multiview(model, cfg, ds, steps=4, learning_rate=1e-4)
    assert 1 <= len(history) <= 4
    assert all(np.isfinite(history))


def test_evolve_encoder_only():
    from fvc.models.lsvc import LSVC
    from fvc.train.loop import evolve

    cfg = CodecConfig.from_name("LSVC", compression_level=1)
    model = LSVC(cfg)
    clip = SyntheticVideoDataset(num_videos=1, frames=3, height=64, width=64)[0]
    _, history = evolve(model, cfg, clip, steps=4, gop=2, learning_rate=1e-4)
    assert len(history) == 4 and all(np.isfinite(history))


def test_lsvc_stage_times_smoke():
    import jax.numpy as jnp
    from fvc.models.lsvc import LSVC
    from fvc.bench.stages import lsvc_stage_times

    cfg = CodecConfig.from_name("LSVC")
    model = LSVC(cfg)
    x = jnp.asarray(SyntheticVideoDataset(1, 3, 64, 64)[0])
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    times = lsvc_stage_times(model, variables, x, iters=2)
    assert set(times) == {"E-FL", "E-MV", "D-MV", "E-MC", "D-MC", "E-RES", "D-RES"}
    assert all(t > 0 for t in times.values())


def test_stage_wp_trains_only_motion_branch():
    """models.py:1408: in WP/MC stages the residual rate is detached, so the
    residual codec gets no gradient; the flow/mv branch does."""
    import jax.numpy as jnp

    from fvc.models.registry import get_codec_model
    from fvc.train.step import lsvc_loss_fn

    model, cfg = get_codec_model("LSVC", compression_level=2)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), frames[0], training=True,
                           rng=jax.random.PRNGKey(1))
    loss_fn = lsvc_loss_fn(model, cfg, stage="WP")
    grads = jax.grad(lambda p: loss_fn(p, frames, jax.random.PRNGKey(2))[0])(
        variables)

    def max_abs(tree):
        return max(float(jnp.abs(g).max())
                   for g in jax.tree_util.tree_leaves(tree))

    g = grads["params"]
    assert max_abs(g["optic_flow"]) > 0
    assert max_abs(g["mv_encoder"]) > 0
    assert max_abs(g["res_encoder"]) == 0
    assert max_abs(g["res_decoder"]) == 0


def test_aug_pad_random_crops_vary_and_train():
    """aug_pad: pool clips are crop+pad; each step slices a random window on
    device. Training must run at the cropped size with finite losses."""
    from fvc.models.lsvc import LSVC
    from fvc.train.loop import train_single_view

    cfg = CodecConfig.from_name("LSVC", compression_level=1)
    model = LSVC(cfg)
    ds = SyntheticVideoDataset(num_videos=4, frames=3, height=80, width=80)
    _, history = train_single_view(model, cfg, ds, steps=4, gop=2,
                                   learning_rate=1e-4, log_every=1,
                                   aug_pad=16)
    losses = np.asarray([h["loss"] for h in history])
    assert np.isfinite(losses).all() and len(losses) == 4


def test_train_elfvc_sp_runs_and_is_finite():
    """ELFVC(-SP) trainer: scan over the ELFVCState chain with the reference's
    r*mse + bpp + alpha*pred_norm loss; losses stay finite and the SP
    pred-error norm is reported."""
    from fvc.models.elfvc import ELFVC
    from fvc.train.loop import train_elfvc

    cfg = CodecConfig.from_name("ELFVC-SP", compression_level=1)
    model = ELFVC(cfg, planes=32, mid=16)
    ds = SyntheticVideoDataset(num_videos=2, frames=3, height=128, width=128)
    _, history = train_elfvc(model, cfg, ds, steps=2, gop=2,
                             learning_rate=1e-4, log_every=1, alpha=1.0)
    assert len(history) == 2
    for h in history:
        assert np.isfinite(h["loss"]) and np.isfinite(h["pred_norm"])


def test_ladder_vmapped_levels_separate_and_resume(tmp_path):
    """Vmapped multi-λ ladder (fvc.train.ladder): one jit step advances every
    level; per-level inits differ; per-level checkpoints restore in lockstep
    (reference trains one job per --compression_level, train.py:438-449)."""
    from fvc.models.registry import get_codec_model
    from fvc.train import ladder

    model, _ = get_codec_model("DVC", compression_level=2)
    ds = SyntheticVideoDataset(num_videos=2, frames=3, height=64, width=64)
    root = str(tmp_path / "lad")
    v, hist = ladder.train_ladder_iterpred(
        model, ds, levels=[0, 4], steps=2, gop=2, log_every=1,
        ckpt_root=root, ckpt_every=10)
    assert len(hist) == 2
    for h in hist:
        assert np.isfinite(h["l0"]["loss"]) and np.isfinite(h["l4"]["loss"])
    leaf = jax.tree_util.tree_leaves(v)[0]
    assert np.asarray(jax.device_get(leaf[0] != leaf[1])).any()
    ref = ladder._slice_tree(jax.device_get(v), 0)
    stacked, step = ladder.resume_ladder(root, [0, 4], ref)
    assert step == 2 and stacked is not None
    restored = jax.tree_util.tree_leaves(stacked)[0]
    np.testing.assert_array_equal(np.asarray(restored[0]),
                                  np.asarray(jax.device_get(leaf[0])))


def test_ladder_divergence_rollback(tmp_path):
    """A level whose logged loss spikes above spike_factor x its trailing
    median is restored from its latest on-disk checkpoint (params change,
    siblings untouched, event logged) — fvc.train.ladder._ladder_loop."""
    from fvc.models.registry import get_codec_model
    from fvc.train import ladder

    import os

    model, _ = get_codec_model("DVC", compression_level=2)
    ds = SyntheticVideoDataset(num_videos=2, frames=3, height=64, width=64)
    root = str(tmp_path / "lad")
    # run 1: healthy (huge spike_factor) — writes the rollback targets
    ladder.train_ladder_iterpred(
        model, ds, levels=[0, 4], steps=4, gop=2, log_every=2,
        ckpt_root=root, ckpt_every=2, spike_factor=1e9)
    ckpts_before = {lvl: sorted(os.listdir(f"{root}_l{lvl}"))
                    for lvl in (0, 4)}
    # run 2: spike_factor tiny -> every level trips the detector at each log
    # point after its first (median established) and restores from run 1's
    # checkpoints; the health gate must also SKIP writing new checkpoints
    # (a diverged level never poisons its own rollback target).
    _, hist = ladder.train_ladder_iterpred(
        model, ds, levels=[0, 4], steps=4, gop=2, log_every=1,
        ckpt_root=root, ckpt_every=2, spike_factor=1e-9)
    rolled = [h for h in hist if "rollback" in h]
    assert rolled, hist
    assert all(set(h["rollback"]) <= {0, 4} for h in rolled)
    # training survives the rollbacks with finite losses throughout
    for h in hist:
        assert np.isfinite(h["l0"]["loss"]) and np.isfinite(h["l4"]["loss"])
    for lvl in (0, 4):
        assert sorted(os.listdir(f"{root}_l{lvl}")) == ckpts_before[lvl]


def test_msssim_loss_type_trains():
    """loss_type='M' (models.py:460-487): distortion = 1 - MS-SSIM with the
    [8,16,32,64] lambda ladder; gradients must be finite and differ from the
    MSE objective's."""
    import jax.numpy as jnp
    from fvc.models.lsvc import LSVC
    from fvc.train.step import distortion, lsvc_loss_fn

    cfg_m = CodecConfig.from_name("LSVC", loss_type="M", compression_level=2)
    cfg_p = CodecConfig.from_name("LSVC", loss_type="P", compression_level=2)
    assert cfg_m.rate_lambda != cfg_p.rate_lambda  # MSSSIM ladder selected

    r = np.random.RandomState(0)
    x = jnp.asarray(r.rand(2, 192, 192, 3).astype(np.float32))
    y = jnp.clip(x + 0.05 * jnp.asarray(r.randn(2, 192, 192, 3)), 0, 1)
    d_m = float(distortion(cfg_m, y, x))
    d_p = float(distortion(cfg_p, y, x))
    assert 0.0 < d_m < 1.0 and abs(d_m - d_p) > 1e-4

    model = LSVC(cfg_m)
    frames = jnp.asarray(r.rand(1, 3, 192, 192, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames[0],
                           training=False)
    loss_fn = lsvc_loss_fn(model, cfg_m)
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables, frames, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                               for g in jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0.0
