"""Benchmark: LSVC (flagship tree codec) P-frame encode+decode throughput on
one TPU chip, at the reference's own benchmark setting.

Prints ONE JSON line (stdout, last line) carrying the headline metric plus a
"submetrics" object with the full perf story (VERDICT r02 #4): decode-only,
1080p, subGOP scalability sweep, batched-stream throughput, MFU, and quality
fields measured on a FRESH-INPUT pass (the chained feedback loop converges to
a fixed point on an untrained model and reports degenerate PSNR — never use
its quality numbers).

Baseline (BASELINE.md "LSVC enc/dec split", plot_hermes.py:678-691): on an RTX
3090 the reference encodes at 32.4 fps and decodes at 46 fps; a full
encode+decode pass (what LSVC.forward computes: flow + mv codec + MC + residual
codec + reconstruction, models.py:1347-1411) therefore runs at
1/(1/32.4 + 1/46) ~= 19.0 fps. vs_baseline = ours / 19.0.

Resolution: the reference's Hermes suite evaluates UVG at 640x960
(eval.py:514, dataset.py:78-79). The headline matches that workload; the
1080p submetric covers the BASELINE.json north-star resolution.

Run: python bench.py [--fast] [--gop 6] [--iters 5] [--ckpt DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_ENCDEC_FPS = 19.0  # RTX 3090 enc+dec serial, plot_hermes.py:678-691
# Decode-only baseline from the SAME source table as the headline (3090
# column of the enc/dec split, plot_hermes.py:678-691). NB the reference
# also carries a faster 3090 decode figure (0.010 s/frame = 100 fps,
# simulation.py:137 / plot_hermes.py:737); the submetric reports both ratios.
BASELINE_DEC_FPS = 46.0
BASELINE_DEC_FPS_ALT = 100.0
# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 (394 int8). MFU below is
# against bf16 peak — the policy runs the conv path in bf16.
PEAK_BF16_FLOPS = 197e12


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gop", type=int, default=14,
                    help="subGOP per tree program. Default 14: the wavefront "
                         "operating point (VERDICT r04 #4) — the batched tree "
                         "gains throughput with subGOP (reference's own "
                         "scalability suite sweeps 1..30 and REPORTS the "
                         "rising curve, plot_hermes.py:849-857); 6 remains in "
                         "--gop-sweep for the round<=4 comparison point")
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chain", type=int, default=4, metavar="K",
                    help="GOPs coded per timed program (lax.fori_loop chain; "
                         "reconstructions feed back as the next GOP's input). "
                         "Amortizes the device-tunnel's fixed per-call "
                         "latency, which varies with external relay load and "
                         "is not a property of this program.")
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="headline only (skip decode/sweep/1080p/batch)")
    ap.add_argument("--gop-sweep", default="2,6,30", metavar="G1,G2,..",
                    help="subGOP sizes for the scalability sweep (the "
                         "reference's suite, plot_hermes.py:849-857: fps "
                         "RISES with subGOP for the batched tree)")
    ap.add_argument("--batch", type=int, default=2, metavar="B",
                    help="B concurrent streams vmapped into one program "
                         "(serving throughput per chip); 0 disables")
    ap.add_argument("--no-1080p", action="store_true")
    ap.add_argument("--ckpt", default="trained/lsvc_ladder_ema_l2",
                    help="LSVC checkpoint dir for REAL quality fields "
                         "(falls back to the raw trained l2 dir, then "
                         "pretrained_lsvc_l2, then fresh init)")
    ap.add_argument("--corpus", default="hard", choices=["easy", "hard"],
                    help="quality-clip content profile; must match the eval "
                         "CLI corpus for the gate to be comparable")
    ap.add_argument("--min-psnr", type=float, default=30.0,
                    help="quality-gate floor for the benched checkpoint "
                         "(recorded in the artifact so the gate is "
                         "self-describing; defaults tuned for the l2 ladder "
                         "point on the hard corpus)")
    ap.add_argument("--max-bpp", type=float, default=0.60,
                    help="quality-gate rate ceiling (see --min-psnr)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fvc.core.policy import bf16_compute, compute_in
    from fvc.models.registry import get_codec_model

    model, cfg = get_codec_model("LSVC")
    gop, H, W = args.gop, args.height, args.width
    x = jnp.asarray(
        np.random.RandomState(0).rand(gop + 1, H, W, 3).astype(np.float32))

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda k, xs: model.init(k, xs, training=False)
    )(jax.random.PRNGKey(0), x[: 3, : 128, : 128])
    jax.block_until_ready(variables)
    init_s = time.perf_counter() - t0

    ckpt_used = None
    for cand in (args.ckpt, "trained/lsvc_ladder_l2", "pretrained_lsvc_l2"):
        if cand and os.path.isdir(cand):
            try:
                from fvc.train.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint)
                path = latest_checkpoint(cand)
                if path:
                    variables = restore_checkpoint(
                        path, {"params": variables})["params"]
                    ckpt_used = path
                    break
            except Exception as e:  # quality fields degrade, timing unaffected
                log(f"# ckpt restore failed ({cand}): {e}")
    log(f"# ckpt={ckpt_used}")

    def fwd(variables, x):
        ctx = compute_in(None) if args.fp32 else bf16_compute()
        with ctx:
            com, out = model.apply(variables, x, training=False)
        return com, out["bpp_est"], out["psnr"]

    # K GOPs coded inside ONE program: each iteration's reconstructions feed
    # back as the next GOP's references, so iterations serialize on a real
    # data dependency — this measures sustained coding throughput, with the
    # relay's fixed per-dispatch latency (30ms+, load-dependent — see
    # docs/ROUND1_NOTES.md) paid once per K GOPs instead of once per GOP.
    K = max(1, args.chain)

    def chain(variables, x):
        def body(_, carry):
            cur, _, _ = carry
            com, bpp, psnr = fwd(variables, cur)
            nxt = jnp.concatenate([cur[:1], com], axis=0)
            return nxt, bpp, psnr
        return jax.lax.fori_loop(
            0, K, body, (x, jnp.float32(0.0), jnp.float32(0.0)))

    forward = jax.jit(chain)

    t0 = time.perf_counter()
    com_k, _, _ = forward(variables, x)
    jax.block_until_ready(com_k)
    compile_s = time.perf_counter() - t0

    for _ in range(args.warmup):
        jax.block_until_ready(forward(variables, x)[0])

    def time_call(fn, *a, iters=None):
        """min-of-N wall time; each call ends with a tiny dependent D2H fetch
        (through the tunnel, block_until_ready alone can return before the
        computation retires, but a host fetch of a dependent value cannot).
        min-of-N is the standard contention-resistant estimate on the shared
        tunnel chip."""
        ts = []
        for _ in range(iters or args.iters):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jnp.ravel(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts), ts

    t_min, times = time_call(lambda: forward(variables, x)[0])
    sec_per_gop = t_min / K
    fps = gop / sec_per_gop

    sub = {}

    # ---- quality on EVAL-CORPUS clips (VERDICT r03 weak #3: quality fields
    # measured on iid noise frames can't distinguish a trained codec from a
    # broken one). Clips come from the same SyntheticVideoDataset generator,
    # profile and seed family the eval CLI scores (scripts/eval.py
    # --corpus/--corpus-seed); the clip COUNT/length track this bench's
    # --gop rather than eval's, so numbers are comparable, not identical. ----
    try:
        from fvc.data.datasets import SyntheticVideoDataset

        qds = SyntheticVideoDataset(num_videos=4, frames=gop + 1,
                                    height=256, width=256, seed=9000,
                                    profile=args.corpus)
        fwd1 = jax.jit(fwd)
        ps, bs = [], []
        for i in range(len(qds)):
            clip = jnp.asarray(qds[i][: gop + 1])
            _, bpp_i, psnr_i = fwd1(variables, clip)
            ps.append(float(psnr_i))
            bs.append(float(bpp_i))
        psnr_q, bpp_q = float(np.mean(ps)), float(np.mean(bs))
        # NaN is not valid JSON and poisons the artifact — report only
        # finite values (an undertrained/odd checkpoint can emit NaN bpp)
        if np.isfinite(psnr_q):
            sub["psnr_eval_clips"] = round(psnr_q, 2)
        if np.isfinite(bpp_q):
            sub["bpp_est_eval_clips"] = round(bpp_q, 4)
        sub["quality_ckpt"] = ckpt_used
        # self-describing gate (ADVICE r04): thresholds + corpus recorded in
        # the artifact; they describe the default l2 ladder point — pass
        # --min-psnr/--max-bpp when benching a different level's checkpoint
        sub["quality_gate"] = {"min_psnr": args.min_psnr,
                               "max_bpp": args.max_bpp,
                               "corpus": args.corpus, "seed": 9000}
        sub["quality_ok"] = bool(np.isfinite(psnr_q) and np.isfinite(bpp_q)
                                 and psnr_q >= args.min_psnr
                                 and bpp_q <= args.max_bpp)
        log(f"# quality eval-clips psnr={psnr_q:.2f} bpp={bpp_q:.4f} "
            f"ok={sub['quality_ok']}")
    except Exception as e:
        log(f"# eval-clips quality failed: {e}")

    # ---- MFU from XLA's own cost model for the compiled chain ----
    try:
        ca = forward.lower(variables, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = (flops / t_min) / PEAK_BF16_FLOPS
            sub["mfu_bf16"] = round(mfu, 4)
            sub["program_tflops"] = round(flops / 1e12, 3)
        byt = float(ca.get("bytes accessed", 0.0))
        if byt > 0:
            # the other roofline wall: fraction of the measured time that
            # pure HBM traffic would take at v5e's 819 GB/s — >1 means the
            # program is bandwidth-bound and MXU% is not the limiter
            sub["program_gb_accessed"] = round(byt / 1e9, 2)
            sub["hbm_bound_fraction"] = round((byt / 819e9) / t_min, 3)
    except Exception as e:
        log(f"# cost_analysis unavailable: {e}")

    log(f"# device={jax.devices()[0].device_kind} gop={gop} chain={K} "
        f"init={init_s:.1f}s compile={compile_s:.1f}s "
        f"gop_time_min={sec_per_gop * 1e3:.0f}ms "
        f"chain_times={[round(t, 2) for t in times]}")

    if not args.fast:
        # ---- subGOP scalability sweep (plot_hermes.py:849-857) ----
        try:
            sweep = {}
            for g in [int(s) for s in args.gop_sweep.split(",") if s]:
                xg = jnp.asarray(np.random.RandomState(2).rand(
                    g + 1, H, W, 3).astype(np.float32))
                jax.block_until_ready(forward(variables, xg)[0])
                tg, _ = time_call(lambda xg=xg: forward(variables, xg)[0])
                sweep[str(g)] = round(g / (tg / K), 2)
                log(f"# gop_sweep gop={g} fps={sweep[str(g)]}")
            sweep[str(gop)] = round(fps, 2)
            sub["gop_sweep_fps"] = sweep
        except Exception as e:
            log(f"# gop-sweep failed: {e}")

        # ---- decode-only (TreeFrameReconDecompress device half) ----
        try:
            lat = jax.jit(
                lambda v, xx: model.apply(v, xx, method=model.collect_latents)
            )(variables, x)
            mv_q, feat_q = lat["mv_q"], lat["feat_q"]

            def dec_chain(variables, x0, mv_q, feat_q):
                def body(_, cur):
                    ctx = compute_in(None) if args.fp32 else bf16_compute()
                    with ctx:
                        com = model.apply(variables, cur, mv_q, feat_q,
                                          method=model.reconstruct)
                    return com[-1]
                return jax.lax.fori_loop(0, K, body, x0)

            dec_jit = jax.jit(dec_chain)
            jax.block_until_ready(dec_jit(variables, x[0], mv_q, feat_q))
            td, _ = time_call(lambda: dec_jit(variables, x[0], mv_q, feat_q))
            fps_d = gop / (td / K)
            sub["decode_fps"] = round(fps_d, 2)
            sub["decode_vs_3090"] = round(fps_d / BASELINE_DEC_FPS, 3)
            sub["decode_vs_3090_sim_table"] = round(
                fps_d / BASELINE_DEC_FPS_ALT, 3)
            log(f"# decode-only fps={fps_d:.1f}")
        except Exception as e:
            log(f"# decode bench failed: {e}")

        # ---- 1080p variant (north-star resolution) ----
        if not args.no_1080p:
            try:
                xh = jnp.asarray(np.random.RandomState(3).rand(
                    gop + 1, 1088, 1920, 3).astype(np.float32))
                jax.block_until_ready(forward(variables, xh)[0])
                th, _ = time_call(lambda: forward(variables, xh)[0])
                sub["fps_1080p"] = round(gop / (th / K), 2)
                log(f"# 1080p fps={sub['fps_1080p']}")
            except Exception as e:
                log(f"# 1080p bench failed: {e}")

        # ---- batched streams (serving throughput) ----
        if args.batch:
            try:
                B = args.batch
                xb = jnp.asarray(np.random.RandomState(1).rand(
                    B, gop + 1, H, W, 3).astype(np.float32))
                fwd_b = jax.jit(jax.vmap(fwd, in_axes=(None, 0)))
                jax.block_until_ready(fwd_b(variables, xb)[0])
                tb, _ = time_call(lambda: fwd_b(variables, xb)[0])
                sub[f"batch{B}_fps"] = round(B * gop / tb, 2)
                log(f"# batch={B} fps={sub[f'batch{B}_fps']}")
            except Exception as e:
                log(f"# batch bench failed: {e}")

    sub["gop"] = gop
    result = {
        "metric": f"lsvc_{H}x{W}_pframe_encdec_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_ENCDEC_FPS, 3),
        "submetrics": sub,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
