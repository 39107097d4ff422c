"""Vmapped RD-ladder training: every compression level of the λ ladder
trained simultaneously in ONE jit program.

The reference trains one model per λ level as separate jobs
(train.py:438-449 with --compression_level picking from the
[256..65536] ladder, models.py:72-76). On TPU that serializes poorly:
each 256x256 GOP step underfills the MXU and pays the dispatch latency
per level. Here the level axis is a vmap axis — params, optimizer
state, data batch and rate λ all carry a leading [L] dim, so one
train step advances the whole ladder with L-fold larger convolutions
(better MXU tiling) and one dispatch.

This also sidesteps the Adam λ-cancellation failure mode documented in
docs/ROUND1_NOTES.md: each level is an independent from-scratch
trajectory (per-level init seed + per-level data sampling), not a
fine-tune of a shared parent, so the levels separate into a real RD
ladder.

Per-family builders: `train_ladder_iterpred` (DVC/RLVC scan engine),
`train_ladder_gop` (LSVC-style whole-GOP apply), `train_ladder_elfvc`
(ELFVC/-SP state chain + SP aux), `train_ladder_ssf` (SSF/Base with the
learned keyframe branch). All share `_ladder_loop`.
"""

from __future__ import annotations

import json
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fvc.core.config import PSNR_LAMBDAS, CodecConfig
from fvc.train.checkpoint import save_checkpoint
from fvc.train.step import lsvc_loss_fn, make_optimizer


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _slice_tree(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


def _ckpt_dir(root: str, level: int) -> str:
    return f"{root}_l{level}"


def _ladder_loop(loss_fn, variables, lambdas, levels, dataset, *,
                 steps, gop, learning_rate, seed, log_every, ckpt_root,
                 ckpt_every, step_offset, batched_gop: bool,
                 log_keys=("loss", "psnr", "bpp_est"),
                 spike_factor: float = 10.0, clip_norm=None,
                 ema_decay: float = 0.999):
    """Shared ladder driver. loss_fn(params, lam, frames, key) ->
    (scalar, metrics). `batched_gop`: frames per level are [1,T,H,W,3]
    (whole-GOP models) vs [T,1,H,W,3] (sequential scan models).

    EMA (round-5, VERDICT r04 weak #3): RD training on a varied-content
    corpus keeps per-step params noisy (observed: the LSVC l2 point swings
    +-3 dB between adjacent log points even at lr 2e-5). A Polyak average
    of the params is tracked on device and checkpointed next to the raw
    ladder under `{ckpt_root}_ema_l{level}` — eval/bench read the EMA dirs.
    Raw params remain the resume/rollback state, so training dynamics are
    unchanged. ema_decay=0 disables.

    Per-level divergence rollback: unclipped Adam under RD lambdas can walk
    a level into a collapsed state it does not recover from (observed: one
    ladder level spiking loss 2 -> 350 with PSNR -> 4 while its siblings
    trained on). At every log point a level whose loss is non-finite or >
    spike_factor x its trailing median is restored from its last ON-DISK
    checkpoint (ckpt_every granularity; requires ckpt_root) with a fresh
    optimizer state for that level; sibling levels are untouched. Disk
    restore keeps zero extra HBM — an on-device snapshot of stacked
    params+opt does not fit next to the training step's activations on a
    shared chip (measured: RESOURCE_EXHAUSTED on resume)."""
    L = len(levels)
    optimizer = make_optimizer(learning_rate, clip_norm=clip_norm)
    opt_state = jax.vmap(optimizer.init)(variables)

    ema = None
    if ema_decay:
        if ckpt_root:  # resume the average alongside the raw ladder
            ref = jax.device_get(_slice_tree(variables, 0))
            ema, _ = resume_ladder(f"{ckpt_root}_ema", levels, ref)
        if ema is None:
            ema = jax.tree_util.tree_map(jnp.copy, variables)
    else:
        ema = ()  # leafless pytree: vmap/jit/donate all no-op on it

    def step_one(params, opt_state, ema, lam, frames, key):
        (loss, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lam, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay:
            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema, params)
        metrics = {k: jnp.mean(v) for k, v in outs.items()
                   if hasattr(v, "ndim") and v.ndim <= 1}
        metrics["loss"] = loss
        return params, opt_state, ema, metrics

    step_fn = jax.jit(jax.vmap(step_one), donate_argnums=(0, 1, 2))

    # Device-resident pool (per-step H2D through the tunnel leaks the
    # transfer buffer host-side — see train_single_view).
    stackd = np.stack([dataset[i][: gop + 1] for i in range(len(dataset))])
    data_dev = jnp.asarray(stackd[:, None] if batched_gop
                           else stackd[:, :, None])

    def _rollback_level(variables, opt_state, ema, i):
        """Restore level i's params from its latest on-disk checkpoint and
        re-init its optimizer state; other levels' slices are untouched.
        The EMA slice restores from its own dir when present, else resets
        to the restored raw params (a diverged level's average is
        contaminated by the walk into divergence)."""
        from fvc.train.checkpoint import latest_checkpoint, restore_checkpoint

        path = latest_checkpoint(_ckpt_dir(ckpt_root, levels[i]))
        if path is None:
            return variables, opt_state, ema, False
        ref = jax.device_get(_slice_tree(variables, i))
        good = restore_checkpoint(path, {"params": ref})["params"]
        variables = jax.tree_util.tree_map(
            lambda cur, g: cur.at[i].set(jnp.asarray(g)), variables, good)
        fresh_opt = optimizer.init(good)
        opt_state = jax.tree_util.tree_map(
            lambda cur, g: cur.at[i].set(jnp.asarray(g)), opt_state,
            fresh_opt)
        if ema_decay:
            epath = latest_checkpoint(_ckpt_dir(f"{ckpt_root}_ema", levels[i]))
            egood = (restore_checkpoint(epath, {"params": ref})["params"]
                     if epath else good)
            ema = jax.tree_util.tree_map(
                lambda cur, g: cur.at[i].set(jnp.asarray(g)), ema, egood)
        return variables, opt_state, ema, True

    rng = np.random.RandomState(seed)
    history = []
    recent = [[] for _ in range(L)]  # trailing logged losses per level
    for step in range(steps):
        idx = jnp.asarray(rng.randint(0, len(dataset), L))  # per-level clip
        frames = data_dev[idx]
        keys = jax.random.split(
            jax.random.PRNGKey(seed + 7919 * (step_offset + step)), L)
        variables, opt_state, ema, metrics = step_fn(
            variables, opt_state, ema, lambdas, frames, keys)
        if step % log_every == 0 or step == steps - 1:
            rec = {"step": step_offset + step, "t": round(time.time(), 1)}
            m = {k: np.asarray(v) for k, v in metrics.items()}
            for i, lvl in enumerate(levels):
                rec[f"l{lvl}"] = {k: round(float(m[k][i]), 4)
                                  for k in log_keys if k in m}
            # ---- divergence rollback (see docstring) ----
            losses = np.asarray(m["loss"], np.float64)
            rolled = []
            for i in range(L):
                med = np.median(recent[i]) if recent[i] else np.inf
                bad = (not np.isfinite(losses[i])
                       or losses[i] > spike_factor * med)
                if bad and ckpt_root:
                    variables, opt_state, ema, ok = _rollback_level(
                        variables, opt_state, ema, i)
                    if ok:
                        rolled.append(levels[i])
                        continue
                # Only finite losses enter the trailing median — a NaN here
                # would make the median NaN and permanently disable spike
                # detection for this level (factor * NaN compares False).
                if np.isfinite(losses[i]):
                    recent[i] = (recent[i] + [losses[i]])[-5:]
            if rolled:
                rec["rollback"] = rolled
            history.append(rec)
            print(json.dumps(rec), flush=True)
        if ckpt_root and (step + 1) % ckpt_every == 0:
            skip = _unhealthy_levels(metrics, recent, L, spike_factor)
            _save_ladder(ckpt_root, levels, variables,
                         step_offset + step + 1, skip=skip)
            if ema_decay:
                _save_ladder(f"{ckpt_root}_ema", levels, ema,
                             step_offset + step + 1, skip=skip)
    if ckpt_root:
        skip = _unhealthy_levels(metrics, recent, L, spike_factor)
        _save_ladder(ckpt_root, levels, variables, step_offset + steps,
                     best=True, skip=skip)
        if ema_decay:
            _save_ladder(f"{ckpt_root}_ema", levels, ema,
                         step_offset + steps, best=True, skip=skip)
    return variables, history


def _unhealthy_levels(metrics, recent, L, spike_factor):
    """Levels whose CURRENT loss is non-finite or spiking vs their trailing
    median. Checkpoint writes are gated on this so a level that diverges
    between log points never overwrites its last healthy checkpoint — the
    rollback machinery restores from disk, so a poisoned checkpoint would
    be restored repeatedly and the level could never recover."""
    losses = np.asarray(jax.device_get(metrics["loss"]), np.float64)
    skip = []
    for i in range(L):
        med = np.median(recent[i]) if recent[i] else np.inf
        if not np.isfinite(losses[i]) or losses[i] > spike_factor * med:
            skip.append(i)
    return skip


def train_ladder_iterpred(model, dataset, *, levels: Sequence[int],
                          steps: int = 1000, gop: int = 4,
                          learning_rate: float = 1e-4, seed: int = 0,
                          log_every: int = 50,
                          ckpt_root: Optional[str] = None,
                          ckpt_every: int = 5000, step_offset: int = 0,
                          init_params=None, spike_factor: float = 10.0,
                          loss_type: str = "P", clip_norm=None,
                          ema_decay: float = 0.999):
    """DVC/RLVC ladder (scan engine, reference loss train.py:185-207).

    loss_type 'M' trains the MS-SSIM operating points: distortion is
    1 - ms_ssim(recon, target) with the [8,16,32,64] ladder
    (reference models.py:72-76 init_training_params loss_type=='M')."""
    from fvc.gop.engine import code_gop_scan

    from fvc.core.config import MSSSIM_LAMBDAS

    table = PSNR_LAMBDAS if loss_type == "P" else MSSSIM_LAMBDAS
    lambdas = jnp.asarray([table[l] for l in levels], jnp.float32)
    sample = jnp.asarray(dataset[0][: gop + 1])
    state0 = model.init_state(1, sample.shape[1], sample.shape[2])

    if init_params is None:
        init_params = _stack_trees([
            model.init(jax.random.PRNGKey(seed + 101 * (i + 1)),
                       sample[0][None], sample[1][None], state0, False,
                       training=True, rng=jax.random.PRNGKey(seed + i))
            for i in range(len(levels))])

    def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
        return model.apply(params, x_ref, x_cur, st, flag,
                           training=training, rng=rng)

    def loss_fn(params, lam, frames, key):
        recons, outs = code_gop_scan(apply_fn, params, frames, state0,
                                     training=True, rng=key)
        if loss_type == "M":
            from fvc.ops.ms_ssim import ms_ssim

            H, W, C = recons.shape[-3:]
            # clamp at 0: f32 cancellation in the windowed variances lets
            # ms_ssim overshoot 1.0 by ~1e-3 at saturation, which would
            # make the distortion (and with small bpp the whole loss)
            # negative; the gradient there is noise anyway
            dist = jnp.maximum(jnp.mean(1.0 - ms_ssim(
                recons.reshape(-1, H, W, C).astype(jnp.float32),
                frames[1:].reshape(-1, H, W, C).astype(jnp.float32))), 0.0)
        else:
            dist = jnp.mean(outs["img_loss"])
        return lam * dist + jnp.mean(outs["bpp_est"]), outs

    return _ladder_loop(loss_fn, init_params, lambdas, levels, dataset,
                        steps=steps, gop=gop, learning_rate=learning_rate,
                        seed=seed, log_every=log_every, ckpt_root=ckpt_root,
                        ckpt_every=ckpt_every, step_offset=step_offset,
                        batched_gop=False, spike_factor=spike_factor,
                        clip_norm=clip_norm, ema_decay=ema_decay)


def train_ladder_gop(model, cfg: CodecConfig, dataset, *,
                     levels: Sequence[int], steps: int = 1000, gop: int = 5,
                     learning_rate: float = 1e-4, seed: int = 0,
                     log_every: int = 50, ckpt_root: Optional[str] = None,
                     ckpt_every: int = 5000, step_offset: int = 0,
                     bf16: bool = False, stage: str = "REC",
                     init_params=None, spike_factor: float = 10.0,
                     ema_decay: float = 0.999):
    """LSVC-style (whole-GOP apply) ladder, vmapped over lsvc_loss_fn."""
    lambdas = jnp.asarray([PSNR_LAMBDAS[l] for l in levels], jnp.float32)
    sample = jnp.asarray(dataset[0][: gop + 1])

    if init_params is None:
        init_params = _stack_trees([
            model.init(jax.random.PRNGKey(seed + 101 * (i + 1)), sample,
                       training=True, rng=jax.random.PRNGKey(seed + i))
            for i in range(len(levels))])

    base = lsvc_loss_fn(model, cfg, bf16=bf16, stage=stage)
    dist_key = {"REC": "rec_loss", "WP": "warp_loss", "MC": "mc_loss"}[stage]

    def loss_fn(params, lam, frames, key):
        # lsvc_loss_fn closes over cfg.rate_lambda; swap in this level's λ
        # (loss is linear in λ: mean(λ·dist + rate) = λ·mean(dist) +
        # mean(rate), so the correction keeps any aux terms intact).
        loss, metrics = base(params, frames, key)
        loss = loss + (lam - cfg.rate_lambda) * metrics[dist_key]
        return loss, metrics

    return _ladder_loop(loss_fn, init_params, lambdas, levels, dataset,
                        steps=steps, gop=gop, learning_rate=learning_rate,
                        seed=seed, log_every=log_every, ckpt_root=ckpt_root,
                        ckpt_every=ckpt_every, step_offset=step_offset,
                        batched_gop=True, spike_factor=spike_factor,
                        log_keys=("loss", "psnr", "bpp_est", "rec_loss"),
                        ema_decay=ema_decay)


def train_ladder_elfvc(model, dataset, *, levels: Sequence[int],
                       steps: int = 1000, gop: int = 4,
                       learning_rate: float = 1e-4, seed: int = 0,
                       log_every: int = 50, ckpt_root: Optional[str] = None,
                       ckpt_every: int = 5000, step_offset: int = 0,
                       alpha: float = 100.0, init_params=None,
                       spike_factor: float = 10.0, ema_decay: float = 0.999):
    """ELFVC(-SP) ladder: state-chain scan + α·pred_norm SP aux
    (reference parallel_compression models.py:274-308)."""
    from fvc.models.elfvc import elfvc_frame_metrics

    lambdas = jnp.asarray([PSNR_LAMBDAS[l] for l in levels], jnp.float32)
    sample = jnp.asarray(dataset[0][: gop + 1])
    state0 = model.init_state(1, sample.shape[1], sample.shape[2])

    if init_params is None:
        init_params = _stack_trees([
            model.init(jax.random.PRNGKey(seed + 101 * (i + 1)),
                       sample[1][None], sample[0][None], state0,
                       training=True, rng=jax.random.PRNGKey(seed + i))
            for i in range(len(levels))])

    def loss_fn(params, lam, frames, key):
        def body(carry, inp):
            x_ref, st = carry
            x_cur, k = inp
            x_rec, st2, lk = model.apply(params, x_cur, x_ref, st,
                                         training=True, rng=k)
            m = elfvc_frame_metrics(x_cur, x_rec, lk)
            return (jax.lax.stop_gradient(x_rec), st2), m

        keys = jax.random.split(key, frames.shape[0] - 1)
        (_, _), ms = jax.lax.scan(body, (frames[0], state0),
                                  (frames[1:], keys))
        loss = jnp.mean(lam * ms["img_loss"] + ms["bpp_est"]
                        + alpha * ms["pred_norm"])
        return loss, ms

    return _ladder_loop(loss_fn, init_params, lambdas, levels, dataset,
                        steps=steps, gop=gop, learning_rate=learning_rate,
                        seed=seed, log_every=log_every, ckpt_root=ckpt_root,
                        ckpt_every=ckpt_every, step_offset=step_offset,
                        batched_gop=False, spike_factor=spike_factor,
                        log_keys=("loss", "psnr", "bpp_est", "pred_norm"),
                        ema_decay=ema_decay)


def train_ladder_ssf(model, dataset, *, levels: Sequence[int],
                     steps: int = 1000, gop: int = 4,
                     learning_rate: float = 1e-4, seed: int = 0,
                     log_every: int = 50, ckpt_root: Optional[str] = None,
                     ckpt_every: int = 5000, step_offset: int = 0,
                     init_params=None, spike_factor: float = 10.0,
                     ema_decay: float = 0.999):
    """SSF/Base ladder: stateless sequential scan; the learned keyframe
    branch (when present) trains jointly per level (fvc.train.loop.train_ssf
    semantics)."""
    from fvc.models.ssf import inter_bpp_est
    from fvc.ops.math import bits_from_likelihood, psnr as _psnr

    lambdas = jnp.asarray([PSNR_LAMBDAS[l] for l in levels], jnp.float32)
    sample = jnp.asarray(dataset[0][: gop + 1])
    has_keyframe = hasattr(model, "init_all")

    if init_params is None:
        def one_init(i):
            key = jax.random.PRNGKey(seed + 101 * (i + 1))
            kw = dict(training=True, rng=jax.random.PRNGKey(seed + i))
            if has_keyframe:
                return model.init(key, sample[1][None], sample[0][None],
                                  method=model.init_all, **kw)
            return model.init(key, sample[1][None], sample[0][None], **kw)
        init_params = _stack_trees([one_init(i) for i in range(len(levels))])

    def loss_fn(params, lam, frames, key):
        B, H, W = frames.shape[1], frames.shape[2], frames.shape[3]

        def body(x_ref, inp):
            x_cur, k = inp
            x_rec, lk = model.apply(params, x_cur, x_ref, training=True,
                                    rng=k)
            if "bpp_est" in lk:  # Base-style out dict
                m = {"img_loss": lk["img_loss"], "bpp_est": lk["bpp_est"],
                     "psnr": lk["psnr"]}
            else:  # SSF-style likelihoods
                bpp, _ = inter_bpp_est(lk, B, H, W)
                m = {"img_loss": jnp.mean(jnp.square(x_cur - x_rec)),
                     "bpp_est": bpp, "psnr": _psnr(x_cur, x_rec)}
            return jax.lax.stop_gradient(x_rec), m

        k0, key = jax.random.split(key)
        if has_keyframe:
            x0_hat, lk0 = model.apply(params, frames[0], training=True,
                                      rng=k0, method=model.forward_keyframe)
            kf_bpp = (bits_from_likelihood(lk0["keyframe"]["y"])
                      + bits_from_likelihood(lk0["keyframe"]["z"])) / (B * H * W)
            kf_loss = (lam * jnp.mean(jnp.square(frames[0] - x0_hat))
                       + kf_bpp)
            chain0 = jax.lax.stop_gradient(x0_hat)
        else:
            kf_loss = 0.0
            chain0 = frames[0]
        keys = jax.random.split(key, frames.shape[0] - 1)
        _, ms = jax.lax.scan(body, chain0, (frames[1:], keys))
        return (jnp.mean(lam * ms["img_loss"] + ms["bpp_est"]) + kf_loss,
                ms)

    return _ladder_loop(loss_fn, init_params, lambdas, levels, dataset,
                        steps=steps, gop=gop, learning_rate=learning_rate,
                        seed=seed, log_every=log_every, ckpt_root=ckpt_root,
                        ckpt_every=ckpt_every, step_offset=step_offset,
                        batched_gop=False, spike_factor=spike_factor,
                        ema_decay=ema_decay)


def resume_ladder(root: str, levels, ref_tree):
    """Restore a stacked ladder from per-level checkpoint dirs. Returns
    (stacked_params or None, step_offset). Levels may sit at different
    steps (a diverged level's checkpoint write is skipped, so it resumes
    from an older healthy state); levels train independently under vmap,
    so this only affects how much each has trained. step_offset = max."""
    import os

    from fvc.train.checkpoint import latest_checkpoint, restore_checkpoint

    paths = [latest_checkpoint(_ckpt_dir(root, lvl)) for lvl in levels]
    if not all(paths):
        return None, 0
    steps = []
    trees = []
    for p in paths:
        tag = os.path.basename(p)
        steps.append(int(tag.split("_")[1]) if tag.startswith("ckpt_") else 0)
        trees.append(restore_checkpoint(p, {"params": ref_tree})["params"])
    if len(set(steps)) != 1:
        print(f"resume_ladder: levels at different steps {steps} "
              "(diverged-level saves are skipped); resuming from max")
    return _stack_trees(trees), max(steps)


def _save_ladder(root: str, levels, stacked, step: int, best: bool = False,
                 skip=()):
    for i, lvl in enumerate(levels):
        if i in skip:  # diverged level: keep its last healthy checkpoint
            continue
        payload = {"params": jax.device_get(_slice_tree(stacked, i))}
        save_checkpoint(_ckpt_dir(root, lvl), step, payload)
        if best:
            save_checkpoint(_ckpt_dir(root, lvl), step, payload, best=True)
