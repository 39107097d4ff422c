#!/usr/bin/env python
"""CLI evaluator — reference eval.py equivalent (static_simulation_model).

Examples:
  python scripts/eval.py --codec LSVC --data /path/uvg --gop 16 --log LSVC.UVG.log
  python scripts/eval.py --codec LSVC --synthetic --real-bits   # rANS bitstream
  python scripts/eval.py --codec x264 --preset veryslow --crf 23 --synthetic
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="LSVC")
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--data", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--corpus", default="hard", choices=["easy", "hard"],
                    help="synthetic eval-content profile (round-5 default "
                         "'hard': the easy corpus cannot support quality "
                         "claims — see SyntheticVideoDataset)")
    ap.add_argument("--corpus-seed", type=int, default=9000,
                    help="seed for synthetic eval clips; keep disjoint from "
                         "training pools (training uses seed+0..63)")
    ap.add_argument("--gop", type=int, default=16)
    ap.add_argument("--max-gops", type=int, default=4)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--levels", type=int, nargs="+", default=None,
                    help="RD sweep over compression levels in one run "
                         "(reference eval.py --level_range); prints one JSON "
                         "line per level plus a final rd_curve line")
    ap.add_argument("--ckpt-pattern", default=None, metavar="PAT",
                    help="per-level checkpoint dir with a {level} placeholder, "
                         "e.g. ckpts/lsvc_l{level} (reference LoadModel "
                         "filename waterfall, eval.py:37-88)")
    ap.add_argument("--log", default=None)
    ap.add_argument("--torch-model", default=None, metavar="FILE",
                    help="reference DVC .model checkpoint "
                         "(torch.save(state_dict), net.py:19) to load into "
                         "the DVC-pretrained architecture "
                         "(fvc.models.torch_interop)")
    ap.add_argument("--real-bits", action="store_true")
    ap.add_argument("--evolve", type=int, default=0, metavar="STEPS",
                    help="per-video online adaptation before coding "
                         "(reference eval.py:357-473): fine-tune encoder-side "
                         "params on each clip for STEPS steps, decoder fixed")
    ap.add_argument("--evolve-lr", type=float, default=1e-5)
    ap.add_argument("--bP", type=int, default=0,
                    help="backward P-frames for DVC/RLVC: the I-frame sits at "
                         "index bP of each GOP window and the prefix is coded "
                         "time-reversed (RLVC GOP-13 fP=6,bP=6 window, "
                         "reference train.py:266,321,346-357)")
    ap.add_argument("--preset", default="veryslow")
    ap.add_argument("--crf", type=int, default=23)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon site hook routes to "
                         "the TPU tunnel by default)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    # ---- gather GOPs ----
    if args.data:
        from fvc.data.datasets import VideoDataset
        ds = VideoDataset(args.data, max_frames=args.gop * args.max_gops)
        gops = list(ds.iter_gops(args.gop))[: args.max_gops]
    else:
        from fvc.data.datasets import SyntheticVideoDataset
        sds = SyntheticVideoDataset(num_videos=args.max_gops, frames=args.gop,
                                    height=256, width=256,
                                    seed=args.corpus_seed,
                                    profile=args.corpus)
        gops = [sds[i] for i in range(len(sds))]

    # ---- anchors ----
    if args.codec == "mjpeg":
        # pure-Python MJPEG-class intra anchor (real bytes; runs in-container
        # where ffmpeg/bpg are absent) — fvc/anchors/mjpeg.py
        from fvc.anchors.mjpeg import QUALITY_LADDER, compress_video
        qualities = ([QUALITY_LADDER[l] for l in args.levels]
                     if args.levels else [args.crf])
        curve = []
        for qual in qualities:
            rows = [compress_video(np.asarray(g, np.float32), qual)
                    for g in gops]
            s = {"codec": "mjpeg", "quality": qual,
                 "bpp_act": float(np.mean([r["bpp"] for r in rows])),
                 "psnr": float(np.mean([r["psnr"] for r in rows]))}
            print(json.dumps(s), flush=True)
            curve.append(s)
        if args.levels:
            print(json.dumps({"rd_curve": {
                "codec": "mjpeg",
                "levels": qualities,
                "bpp": [c["bpp_act"] for c in curve],
                "psnr": [c["psnr"] for c in curve]}}))
        return

    if args.codec in ("x264", "x265"):
        from fvc.anchors.x26x import compress_whole_video, ffmpeg_available
        if not ffmpeg_available():
            print(json.dumps({"error": "ffmpeg not available"}))
            return
        rows = []
        for g in gops:
            _, bpp, psnr = compress_whole_video(
                g, codec=args.codec, preset=args.preset, crf=args.crf,
                gop=args.gop)
            rows.append({"bpp": bpp, "psnr": psnr})
        print(json.dumps({"codec": args.codec,
                          "bpp": float(np.mean([r["bpp"] for r in rows])),
                          "psnr": float(np.mean([r["psnr"] for r in rows]))}))
        return

    # ---- learned codecs (family dispatch, reference eval.py:254-354) ----
    from fvc.models.registry import get_codec_model
    from fvc.train.evaluate import (
        eval_family_on_gops, eval_lsvc_on_gops, init_family_variables,
        write_eval_log)

    def eval_one_level(level, ckpt_dir):
        extra = {"num_views": 1} if args.codec.startswith("MCVC") else {}
        model, cfg = get_codec_model(args.codec, compression_level=level,
                                     **extra)

        variables = init_family_variables(args.codec, model, gops[0])
        if args.torch_model:
            from fvc.models.torch_interop import load_dvc_model
            variables = load_dvc_model(variables, args.torch_model)
            print(f"# loaded torch .model {args.torch_model}", file=sys.stderr)
        if ckpt_dir:
            from fvc.train.checkpoint import (latest_checkpoint,
                                              restore_checkpoint)
            path = latest_checkpoint(ckpt_dir)
            if path is None:
                raise SystemExit(f"--ckpt {ckpt_dir}: no checkpoint found")
            variables = restore_checkpoint(path, {"params": variables})["params"]
            print(f"# restored {path}", file=sys.stderr)

        if args.evolve:
            # per-video online adaptation (reference eval.py:357-473):
            # encoder-side fine-tune on the clip being coded, decoder fixed,
            # then evaluate the adapted model on that clip only. Every family
            # is supported (the reference evolve drives parallel_compression
            # for any codec).
            from fvc.train.loop import evolve as evolve_fn
            results = []
            for g in gops:
                adapted, hist = evolve_fn(
                    model, cfg, np.asarray(g), steps=args.evolve,
                    gop=g.shape[0] - 1, learning_rate=args.evolve_lr,
                    init_params=variables, codec_name=args.codec)
                print(f"# evolve loss {hist[0]:.3f} -> {hist[-1]:.3f}",
                      file=sys.stderr)
                results += eval_family_on_gops(args.codec, model, adapted, [g],
                                               real_bits=args.real_bits)
        elif args.codec.startswith("LSVC") and args.real_bits:
            # software-pipelined: GOP n+1's device transform overlaps GOP n's
            # host rANS coding (bit-identical to sequential compress())
            from fvc.models.bitstream import LSVCBitstreamCodec
            results = eval_lsvc_on_gops(model, variables, gops)
            codec = LSVCBitstreamCodec(model, variables)
            coded = codec.compress_pipelined([np.asarray(g) for g in gops])
            for g, r, (streams, info) in zip(gops, results, coded):
                T, H, W = g.shape[0] - 1, g.shape[1], g.shape[2]
                r["bpp_act"] = codec.num_bits(streams) / (T * H * W)
        else:
            results = eval_family_on_gops(args.codec, model, variables, gops,
                                          real_bits=args.real_bits, bP=args.bP)
        if args.log:
            write_eval_log(args.log, f"{args.codec}-l{level}",
                           args.data or "synthetic", results)
        summary = {
            "codec": args.codec,
            "level": level,
            "bpp_est": float(np.mean([r["bpp"] for r in results])),
            "psnr": float(np.mean([r["psnr"] for r in results])),
            "bpp_act": (float(np.mean([r["bpp_act"] for r in results]))
                        if args.real_bits else None),
            "time_per_frame": float(
                np.mean([r["time_per_frame"] for r in results])),
        }
        # motion/residual bit-allocation split (plot_hermes.py:708-719) and
        # per-frame PSNR across the GOP for error-propagation analysis
        # (plot_hermes.py:814-831) — present when the family reports them
        mss = [r["msssim_db"] for r in results
               if np.isfinite(r.get("msssim_db", float("nan")))]
        if mss:
            summary["msssim_db"] = float(np.mean(mss))
        if any("bpp_mv" in r for r in results):
            summary["bpp_mv"] = float(
                np.mean([r.get("bpp_mv", 0.0) for r in results]))
            summary["bpp_res"] = float(
                np.mean([r.get("bpp_res", 0.0) for r in results]))
        lists = [r["psnr_list"] for r in results
                 if r.get("psnr_list") is not None]
        if lists and len({len(l) for l in lists}) == 1:
            summary["psnr_per_frame"] = [
                round(float(v), 3) for v in np.mean(lists, axis=0)]
        print(json.dumps(summary), flush=True)
        return summary

    if args.levels:
        # RD sweep (reference eval.py --level_range): one run, one model per
        # level, per-level checkpoints via --ckpt-pattern.
        curve = []
        for level in args.levels:
            ckpt_dir = (args.ckpt_pattern.format(level=level)
                        if args.ckpt_pattern else args.ckpt)
            curve.append(eval_one_level(level, ckpt_dir))
        key = "bpp_act" if args.real_bits else "bpp_est"
        print(json.dumps({
            "rd_curve": {
                "codec": args.codec,
                "levels": [c["level"] for c in curve],
                "bpp": [c[key] for c in curve],
                "psnr": [c["psnr"] for c in curve],
            }}))
    else:
        eval_one_level(args.level, args.ckpt)


if __name__ == "__main__":
    main()
