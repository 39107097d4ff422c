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


def train_ladder_iterpred(model, dataset, *, levels: Sequence[int],
                          steps: int = 1000, gop: int = 4,
                          learning_rate: float = 1e-4, seed: int = 0,
                          log_every: int = 50,
                          ckpt_root: Optional[str] = None,
                          ckpt_every: int = 5000, step_offset: int = 0,
                          init_params=None):
    """DVC/RLVC ladder: one vmapped step over L levels of the λ ladder.

    Returns (stacked_params, history). Per-level checkpoints land in
    `{ckpt_root}_l{level}` and restore with the standard single-level
    eval CLI.
    """
    from fvc.gop.engine import code_gop_scan

    lambdas = jnp.asarray([PSNR_LAMBDAS[l] for l in levels], jnp.float32)
    L = len(levels)
    rng = np.random.RandomState(seed)
    sample = jnp.asarray(dataset[0][: gop + 1])
    state0 = model.init_state(1, sample.shape[1], sample.shape[2])

    if init_params is None:
        inits = [model.init(jax.random.PRNGKey(seed + 101 * (i + 1)),
                            sample[0][None], sample[1][None], state0, False,
                            training=True, rng=jax.random.PRNGKey(seed + i))
                 for i in range(L)]
        variables = _stack_trees(inits)
    else:
        variables = init_params
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = jax.vmap(optimizer.init)(variables)

    def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
        return model.apply(params, x_ref, x_cur, st, flag,
                           training=training, rng=rng)

    def loss_fn(params, lam, frames, key):
        _, outs = code_gop_scan(apply_fn, params, frames, state0,
                                training=True, rng=key)
        return jnp.mean(lam * outs["img_loss"] + outs["bpp_est"]), outs

    def step_one(params, opt_state, lam, frames, key):
        (loss, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lam, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "psnr": jnp.mean(outs["psnr"]),
            "bpp_est": jnp.mean(outs["bpp_est"])}

    step_fn = jax.jit(jax.vmap(step_one), donate_argnums=(0, 1))

    # Device-resident pool (see train_single_view: per-step H2D through the
    # tunnel leaks host memory).
    data_dev = jnp.asarray(np.stack(
        [dataset[i][: gop + 1] for i in range(len(dataset))]))[:, :, None]

    history = []
    for step in range(steps):
        idx = jnp.asarray(rng.randint(0, len(dataset), L))  # per-level clip
        frames = data_dev[idx]
        keys = jax.random.split(
            jax.random.PRNGKey(seed + 7919 * (step_offset + step)), L)
        variables, opt_state, metrics = step_fn(
            variables, opt_state, lambdas, frames, keys)
        if step % log_every == 0 or step == steps - 1:
            rec = {"step": step_offset + step, "t": round(time.time(), 1)}
            m = {k: np.asarray(v) for k, v in metrics.items()}
            for i, lvl in enumerate(levels):
                rec[f"l{lvl}"] = {k: round(float(v[i]), 4)
                                  for k, v in m.items()}
            history.append(rec)
            print(json.dumps(rec), flush=True)
        if ckpt_root and (step + 1) % ckpt_every == 0:
            _save_ladder(ckpt_root, levels, variables,
                         step_offset + step + 1)
    if ckpt_root:
        _save_ladder(ckpt_root, levels, variables, step_offset + steps,
                     best=True)
    return variables, history


def train_ladder_gop(model, cfg: CodecConfig, dataset, *,
                     levels: Sequence[int], steps: int = 1000, gop: int = 5,
                     learning_rate: float = 1e-4, seed: int = 0,
                     log_every: int = 50, ckpt_root: Optional[str] = None,
                     ckpt_every: int = 5000, step_offset: int = 0,
                     bf16: bool = False, stage: str = "REC",
                     init_params=None):
    """LSVC-style (whole-GOP apply) ladder: vmapped levels over
    lsvc_loss_fn. frames per level [1, T, H, W, 3]."""
    lambdas = jnp.asarray([PSNR_LAMBDAS[l] for l in levels], jnp.float32)
    L = len(levels)
    rng = np.random.RandomState(seed)
    sample = jnp.asarray(dataset[0][: gop + 1])

    if init_params is None:
        inits = [model.init(jax.random.PRNGKey(seed + 101 * (i + 1)),
                            sample, training=True,
                            rng=jax.random.PRNGKey(seed + i))
                 for i in range(L)]
        variables = _stack_trees(inits)
    else:
        variables = init_params
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = jax.vmap(optimizer.init)(variables)

    base = lsvc_loss_fn(model, cfg, bf16=bf16, stage=stage)

    dist_key = {"REC": "rec_loss", "WP": "warp_loss", "MC": "mc_loss"}[stage]

    def loss_fn(params, lam, frames, key):
        # lsvc_loss_fn closes over cfg.rate_lambda; swap in this level's λ
        # (loss is linear in λ: mean(λ·dist + rate) = λ·mean(dist) +
        # mean(rate), so the correction keeps any aux terms intact).
        loss, metrics = base(params, frames, key)
        loss = loss + (lam - cfg.rate_lambda) * metrics[dist_key]
        return loss, metrics

    def step_one(params, opt_state, lam, frames, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, lam, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return params, opt_state, metrics

    step_fn = jax.jit(jax.vmap(step_one), donate_argnums=(0, 1))

    data_dev = jnp.asarray(np.stack(
        [dataset[i][: gop + 1] for i in range(len(dataset))]))

    history = []
    for step in range(steps):
        idx = jnp.asarray(rng.randint(0, len(dataset), L))
        frames = data_dev[idx][:, None]  # [L, 1, T, H, W, 3]
        keys = jax.random.split(
            jax.random.PRNGKey(seed + 7919 * (step_offset + step)), L)
        variables, opt_state, metrics = step_fn(
            variables, opt_state, lambdas, frames, keys)
        if step % log_every == 0 or step == steps - 1:
            rec = {"step": step_offset + step, "t": round(time.time(), 1)}
            m = {k: np.asarray(v) for k, v in metrics.items()
                 if np.asarray(v).ndim == 1}
            for i, lvl in enumerate(levels):
                rec[f"l{lvl}"] = {k: round(float(v[i]), 4)
                                  for k, v in m.items()
                                  if k in ("loss", "psnr", "bpp_est",
                                           "rec_loss")}
            history.append(rec)
            print(json.dumps(rec), flush=True)
        if ckpt_root and (step + 1) % ckpt_every == 0:
            _save_ladder(ckpt_root, levels, variables,
                         step_offset + step + 1)
    if ckpt_root:
        _save_ladder(ckpt_root, levels, variables, step_offset + steps,
                     best=True)
    return variables, history


def resume_ladder(root: str, levels, ref_tree):
    """Restore a stacked ladder from per-level checkpoint dirs. Returns
    (stacked_params or None, step_offset). All levels must resume from the
    same step (they train in lockstep)."""
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
        raise ValueError(f"ladder levels at different steps: {steps}")
    return _stack_trees(trees), steps[0]


def _save_ladder(root: str, levels, stacked, step: int, best: bool = False):
    for i, lvl in enumerate(levels):
        payload = {"params": jax.device_get(_slice_tree(stacked, i))}
        save_checkpoint(_ckpt_dir(root, lvl), step, payload)
        if best:
            save_checkpoint(_ckpt_dir(root, lvl), step, payload, best=True)
