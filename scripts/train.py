#!/usr/bin/env python
"""CLI trainer — reference train.py equivalent.

Examples:
  python scripts/train.py --codec DVC  --level 2 --steps 1000 --gop 5
  python scripts/train.py --codec LSVC --level 3 --steps 2000 --gop 6 \
      --data /path/to/vimeo --ckpt ckpts/lsvc_l3
  python scripts/train.py --codec LSVC --mesh-data 4 --mesh-spatial 2  # pjit
"""

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="DVC")
    ap.add_argument("--level", type=int, default=2, dest="compression_level")
    ap.add_argument("--loss-type", default="P", choices=["P", "M"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--gop", type=int, default=5)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr-final", type=float, default=None,
                    help="cosine-decay the lr to this value over "
                         "--lr-decay-steps (ladder mode; schedule is shifted "
                         "by the resumed step offset)")
    ap.add_argument("--lr-decay-steps", type=int, default=None,
                    help="total schedule length for --lr-final "
                         "(default: resume offset + --steps)")
    ap.add_argument("--alpha", type=float, default=100.0,
                    help="super-precision pred-error aux weight for ELFVC-SP "
                         "(reference train.py --alpha)")
    ap.add_argument("--data", default=None, help="Vimeo-style frame dirs; synthetic if absent")
    ap.add_argument("--corpus", default="hard", choices=["easy", "hard"],
                    help="synthetic-fallback content profile (round-5: the "
                         "'easy' rounds-1..4 corpus lets DVC code residuals "
                         "at 0.0016 bpp — see SyntheticVideoDataset)")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--aug-pad", type=int, default=0,
                    help="on-device random-crop augmentation: pool clips are "
                         "crop+aug_pad px and each step slices a random "
                         "crop-sized window (gradient variety; see "
                         "ROUND1_NOTES lambda-cancellation)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--ckpt-every", type=int, default=5000)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--stage", default="REC", choices=["WP", "MC", "REC"],
                    help="training stage (reference models.py:70,1408): "
                         "WP/MC pretrain the flow/MC branch with the "
                         "residual rate detached; REC is the full RD loss")
    ap.add_argument("--resume", default=None,
                    help="checkpoint dir to restore params from before training")
    ap.add_argument("--mesh-data", type=int, default=0)
    ap.add_argument("--mesh-spatial", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--spynet-npy", default=None,
                    help="graft the reference's pretrained SpyNet .npy conv "
                         "weights (DVC/flow_pretrain_np) into a fresh init — "
                         "the reference trains with pretrained flow "
                         "(endecoder.py:122-139); training from random flow "
                         "risks the motion branch rate-collapsing to zero "
                         "bits before the flow becomes useful")
    ap.add_argument("--ladder", default=None,
                    help="comma-separated compression levels to train "
                         "JOINTLY in one vmapped multi-λ step (per-level "
                         "from-scratch inits; checkpoints at "
                         "{--ckpt}_l{level}). One jit program advances the "
                         "whole RD ladder — see fvc.train.ladder")
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument("--ema-decay", type=float, default=0.999,
                    help="Polyak-average decay for the eval params tracked "
                         "next to the raw ladder ({ckpt}_ema_l{level} dirs); "
                         "0 disables (see fvc.train.ladder)")
    ap.add_argument("--clip-norm", type=float, default=None,
                    help="global-norm gradient clip for ladder training "
                         "(OFF by default — see fvc.train.step.make_optimizer; "
                         "needed when fine-tuning onto a NEW loss surface, "
                         "e.g. the MS-SSIM ladder from a PSNR parent, where "
                         "the first unclipped Adam steps explode the model)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon site hook routes to "
                         "the TPU tunnel by default)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from fvc.data.datasets import FrameDataset
    from fvc.models.registry import get_codec_model
    from fvc.train.loop import (train_elfvc, train_iterpred,
                                train_single_view, train_ssf)

    model, cfg = get_codec_model(
        args.codec, compression_level=args.compression_level,
        loss_type=args.loss_type)
    ds = FrameDataset(root=args.data, crop=args.crop + args.aug_pad,
                      frames=args.gop + 1, seed=args.seed,
                      profile=args.corpus)

    mesh = None
    if args.mesh_data:
        from fvc.dist.mesh import make_mesh
        mesh = make_mesh(n_data=args.mesh_data, n_spatial=args.mesh_spatial)

    print(f"training {args.codec} level={cfg.compression_level} "
          f"steps={args.steps} gop={args.gop}", flush=True)
    resume_params = None
    step_offset = 0
    if args.resume:
        from fvc.train.checkpoint import latest_checkpoint, restore_checkpoint
        path = latest_checkpoint(args.resume)
        if path:
            import os as _os
            tag = _os.path.basename(path)
            if tag.startswith("ckpt_"):
                step_offset = int(tag.split("_")[1])
            from fvc.data.datasets import SyntheticVideoDataset as _S
            from fvc.train.evaluate import init_family_variables
            probe = _S(1, frames=args.gop + 1, height=args.crop, width=args.crop)[0]
            ref = init_family_variables(args.codec, model, probe)
            resume_params = restore_checkpoint(path, {"params": ref})["params"]
            print(f"resumed from {path}", flush=True)
    if args.spynet_npy and resume_params is None and not args.ladder:
        import jax as _jax
        import jax.numpy as _jnp
        from fvc.data.datasets import SyntheticVideoDataset as _S
        from fvc.ops.spynet import load_npy_weights

        probe = _jnp.asarray(
            _S(1, frames=args.gop + 1, height=args.crop, width=args.crop)[0])
        if args.codec in ("DVC", "RLVC", "RLVC2"):
            st = model.init_state(1, args.crop, args.crop)
            fresh = model.init(_jax.random.PRNGKey(args.seed), probe[0][None],
                               probe[1][None], st, False, training=False)
        else:
            fresh = model.init(_jax.random.PRNGKey(args.seed), probe,
                               training=False)
        import flax
        fresh = flax.core.unfreeze(fresh)
        fresh["params"]["optic_flow"] = load_npy_weights(
            fresh["params"]["optic_flow"], args.spynet_npy)
        resume_params = fresh
        print(f"grafted pretrained SpyNet from {args.spynet_npy}", flush=True)

    if args.ladder:
        import jax as _jax
        import jax.numpy as _jnp

        from fvc.data.datasets import SyntheticVideoDataset as _S
        from fvc.train import ladder as _ladder

        levels = [int(x) for x in args.ladder.split(",")]
        probe = _jnp.asarray(
            _S(1, frames=args.gop + 1, height=args.crop, width=args.crop)[0])
        iterpred = args.codec in ("DVC", "RLVC", "RLVC2")
        elfvc = args.codec.startswith("ELFVC")
        ssf = args.codec.startswith("SSF") or args.codec.startswith("Base")

        def fresh_init(i):
            key = _jax.random.PRNGKey(args.seed + 101 * (i + 1))
            rng = _jax.random.PRNGKey(args.seed + i)
            if iterpred:
                st = model.init_state(1, args.crop, args.crop)
                v = model.init(key, probe[0][None], probe[1][None], st, False,
                               training=False)
            elif elfvc:
                st = model.init_state(1, args.crop, args.crop)
                v = model.init(key, probe[1][None], probe[0][None], st,
                               training=True, rng=rng)
            elif ssf:
                kw = dict(training=True, rng=rng)
                if hasattr(model, "init_all"):
                    kw["method"] = model.init_all
                v = model.init(key, probe[1][None], probe[0][None], **kw)
            else:
                v = model.init(key, probe, training=False)
            if args.spynet_npy:
                import flax

                from fvc.ops.spynet import load_npy_weights
                v = flax.core.unfreeze(v)
                v["params"]["optic_flow"] = load_npy_weights(
                    v["params"]["optic_flow"], args.spynet_npy)
            return v

        init_stacked, step_offset = (None, 0)
        if args.ckpt:
            init_stacked, step_offset = _ladder.resume_ladder(
                args.ckpt, levels, fresh_init(0))
            if init_stacked is not None:
                print(f"resumed ladder at step {step_offset}", flush=True)
        if init_stacked is None:
            init_stacked = _ladder._stack_trees(
                [fresh_init(i) for i in range(len(levels))])
            if args.spynet_npy:
                print(f"grafted pretrained SpyNet from {args.spynet_npy}",
                      flush=True)
        lr = args.lr
        if args.lr_final is not None:
            import optax

            total = args.lr_decay_steps or (step_offset + args.steps)
            base_sched = optax.cosine_decay_schedule(
                args.lr, max(total, 1), alpha=args.lr_final / args.lr)
            off = step_offset

            def lr(count, _b=base_sched, _o=off):
                return _b(count + _o)
            print(f"cosine lr {args.lr} -> {args.lr_final} over {total} "
                  f"steps (offset {off})", flush=True)
        common = dict(levels=levels, steps=args.steps, gop=args.gop,
                      learning_rate=lr, seed=args.seed,
                      ckpt_root=args.ckpt, ckpt_every=args.ckpt_every,
                      step_offset=step_offset, init_params=init_stacked,
                      log_every=args.log_every, ema_decay=args.ema_decay)
        if iterpred:
            _ladder.train_ladder_iterpred(model, ds,
                                          loss_type=args.loss_type,
                                          clip_norm=args.clip_norm, **common)
        elif elfvc:
            _ladder.train_ladder_elfvc(model, ds, alpha=args.alpha, **common)
        elif ssf:
            _ladder.train_ladder_ssf(model, ds, **common)
        else:
            _ladder.train_ladder_gop(
                model, cfg, ds, bf16=args.bf16, stage=args.stage, **common)
        return

    if args.codec.startswith("SSF") or args.codec.startswith("Base"):
        params, history = train_ssf(
            model, cfg, ds, steps=args.steps, gop=args.gop,
            learning_rate=args.lr, seed=args.seed,
            init_params=resume_params, ckpt_dir=args.ckpt,
            ckpt_every=args.ckpt_every, step_offset=step_offset)
    elif args.codec.startswith("ELFVC"):
        params, history = train_elfvc(
            model, cfg, ds, steps=args.steps, gop=args.gop,
            learning_rate=args.lr, seed=args.seed,
            init_params=resume_params, ckpt_dir=args.ckpt,
            ckpt_every=args.ckpt_every, step_offset=step_offset,
            alpha=args.alpha)
    elif args.codec in ("DVC", "RLVC", "RLVC2"):
        params, history = train_iterpred(
            model, cfg, ds, steps=args.steps, gop=args.gop,
            learning_rate=args.lr, seed=args.seed,
            init_params=resume_params, ckpt_dir=args.ckpt,
            ckpt_every=args.ckpt_every, step_offset=step_offset)
    else:
        params, history = train_single_view(
            model, cfg, ds, steps=args.steps, batch_size=args.batch,
            gop=args.gop, learning_rate=args.lr, ckpt_dir=args.ckpt,
            ckpt_every=args.ckpt_every, seed=args.seed, mesh=mesh,
            bf16=args.bf16, init_params=resume_params,
            step_offset=step_offset, stage=args.stage, aug_pad=args.aug_pad)
    if args.ckpt:
        from fvc.train.checkpoint import save_checkpoint
        save_checkpoint(args.ckpt, step_offset + args.steps,
                        {"params": params}, best=True)
    for h in history[-5:]:
        print(json.dumps(h))


if __name__ == "__main__":
    main()
