"""Training steps: single-chip and mesh-sharded (pjit) variants.

The sharded train step is the TPU-native replacement for the reference's
AMP+DataParallel loops (train.py:157-252, train_multiview.py:213-303): one jit
program over a Mesh; the batch axis shards over 'data', activations over
'spatial'; gradient all-reduce is inserted by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from fvc.core.config import CodecConfig
from fvc.dist.mesh import frames_spec, replicated


def make_optimizer(learning_rate: float = 1e-4, weight_decay: float = 0.0,
                   clip_norm: Optional[float] = None):
    # zero_nans + elementwise clip BEFORE the global-norm clip: a single
    # inf/NaN gradient spike would otherwise make the global norm inf and
    # clip_by_global_norm emit 0*inf = NaN into every parameter.
    #
    # clip_norm defaults OFF in the training loops: with rate-distortion
    # lambdas of 256..65536 the raw global grad norm is >> 1, so a unit clip
    # silently divides the effective learning rate by ~1000x (measured: 200
    # unclipped steps at 256x256 reach PSNR 27 where 6000 clipped steps
    # plateaued at 11.5). The reference trains unclipped Adam (train.py:162).
    tx = [optax.zero_nans(), optax.clip(1e3)]
    if clip_norm:
        tx.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        tx.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    else:
        tx.append(optax.adam(learning_rate))
    return optax.chain(*tx)


def distortion(cfg: CodecConfig, x_rec, x_tgt):
    """The reference's loss_type dispatch (models.py:460-487 calc_metric /
    init_training_params): 'P' -> MSE with the PSNR lambda ladder, 'M' ->
    1 - MS-SSIM with the [8,16,32,64] ladder. Inputs broadcast-stack to
    [N,H,W,C]; needs min(H,W) >= 176 for the 5-scale window (train crops
    are 256x256)."""
    if cfg.loss_type == "M":
        from fvc.ops.ms_ssim import ms_ssim

        H, W, C = x_rec.shape[-3:]
        return jnp.mean(1.0 - ms_ssim(
            x_rec.reshape(-1, H, W, C).astype(jnp.float32),
            x_tgt.reshape(-1, H, W, C).astype(jnp.float32)))
    return jnp.mean(jnp.square(x_rec - x_tgt))


def lsvc_loss_fn(model, cfg: CodecConfig, *, bf16: bool = False,
                 stage: str = "REC"):
    """Rate-distortion loss for a batch of GOPs: frames [B, T, H, W, 3]
    (T = GOP+1 incl. the reconstructed I-frame). Stage weighting follows
    init_training_params defaults (r_img = r_bpp = 1, stage REC).

    `stage` mirrors the reference's model.stage knob (models.py:70,1408):
    - 'WP':  distortion = warp loss; residual rate detached (only the
             flow/mv branch trains).
    - 'MC':  distortion = motion-compensation loss; residual rate detached.
    - 'REC': full RD objective (the reference's operating default).

    bf16=True runs the transform stacks under the bf16 activation policy
    (entropy/metric math stays f32 — fvc.core.policy); the TPU analogue of the
    reference's AMP training, no loss scaling needed."""
    assert stage in ("WP", "MC", "REC"), stage

    def loss_fn(params, frames, rng):
        from fvc.core.policy import bf16_compute, compute_in

        def per_gop(x, r):
            ctx = bf16_compute() if bf16 else compute_in(None)
            with ctx:
                com, out = model.apply(params, x, training=True, rng=r)
            if stage == "REC":
                dist = (distortion(cfg, com, x[1:]) if cfg.loss_type == "M"
                        else out["rec_loss"])
                rate = out["bpp_est"]
            else:  # WP/MC: residual rate detached, models.py:1408
                dist = out["warp_loss"] if stage == "WP" else out["mc_loss"]
                rate = out["bpp_mv"] + jax.lax.stop_gradient(out["bpp_res"])
            return (cfg.rate_lambda * dist + rate, out)

        rngs = jax.random.split(rng, frames.shape[0])
        losses, outs = jax.vmap(per_gop)(frames, rngs)
        metrics = {k: jnp.mean(v) for k, v in outs.items()
                   if v.ndim <= 1}
        return jnp.mean(losses), metrics

    return loss_fn


def make_train_step(loss_fn, optimizer, *, mesh=None, donate: bool = True):
    """Returns jitted (params, opt_state, frames, rng) -> (params, opt_state,
    metrics). If `mesh` is given, frames shard over it and params replicate."""

    def step(params, opt_state, frames, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return params, opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    fspec = frames_spec(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, rep, fspec, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1) if donate else (),
    )
