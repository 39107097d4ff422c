#!/usr/bin/env python
"""End-of-round RD results (round 5): evaluate the trained ladders with REAL
bitstreams ON THE HARD CORPUS, compute BD-rate between families and vs the
in-container anchor, run the paper-analysis tables, and write
docs/RD_RESULTS.md.

Round-5 deltas over round4_results.py (VERDICT r04):
- every RD number moves to the calibrated HARD synthetic corpus
  (SyntheticVideoDataset profile='hard', eval seed 9000 — disjoint from the
  training pools; missing #2),
- ladders evaluate their EMA (Polyak) checkpoints when present
  (trained/*_ema_l{level}; weak #3), with per-level checkpoint/step
  provenance in every table (polish #9),
- the MS-SSIM ladder covers the extended 6-level lambda [8..256] table
  (weak #7),
- the bench quality gate (bench.py --min-psnr/--max-bpp) is evaluated inline
  on the LSVC l2 row so the doc and BENCH artifact can't disagree silently.

Usage: python scripts/round5_results.py [--cpu] [--gop 8] [--clips 3]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")

DRIFT_GATE_DB = 2.0  # frame1 - frameN PSNR drift gate (plot_hermes.py:814-831)
CORPUS_SEED = 9000   # eval clips; training pools use seed+0..63


def run_eval(codec, ckpt_pattern, levels, gop, clips, cpu, extra=()):
    cmd = [sys.executable, "scripts/eval.py", "--codec", codec,
           "--levels", *map(str, levels), "--synthetic",
           "--corpus", "hard", "--corpus-seed", str(CORPUS_SEED),
           "--gop", str(gop), "--max-gops", str(clips),
           "--ckpt-pattern", ckpt_pattern, "--real-bits", *extra]
    if cpu:
        cmd.append("--cpu")
    out = subprocess.run(cmd, capture_output=True, text=True)
    rows, curve = [], None
    for line in out.stdout.splitlines():
        if not line.startswith("{"):
            continue
        obj = json.loads(line)
        if "rd_curve" in obj:
            curve = obj["rd_curve"]
        elif "psnr" in obj:
            rows.append(obj)
    if curve is None:
        print(out.stdout[-2000:], out.stderr[-2000:])
        raise SystemExit(f"eval failed for {codec}")
    return rows, curve


def read_jsonl(path):
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip().startswith("{")]


def pick_pattern(ema_pattern, raw_pattern, levels):
    """Prefer the EMA ladder dirs; fall back per-ladder to raw if any level's
    EMA dir is missing (all rows of a table come from the same kind)."""
    if all(os.path.isdir(ema_pattern.format(level=l)) for l in levels):
        return ema_pattern, "EMA"
    return raw_pattern, "raw"


def ckpt_steps(pattern, levels):
    """Per-level newest checkpoint step for table provenance."""
    from fvc.train.checkpoint import latest_checkpoint

    steps = {}
    for l in levels:
        p = latest_checkpoint(pattern.format(level=l))
        tag = os.path.basename(p) if p else ""
        steps[l] = int(tag.split("_")[1]) if tag.startswith("ckpt_") else None
    return steps


def fmt_bd(v, suffix="%"):
    return (f"**{v:+.1f}{suffix}**" if np.isfinite(v)
            else "n/a (no PSNR overlap — BD needs a shared quality span)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--gop", type=int, default=8)
    ap.add_argument("--clips", type=int, default=3)
    ap.add_argument("--out", default="docs/RD_RESULTS.md")
    ap.add_argument("--skip-ablation", action="store_true")
    ap.add_argument("--skip-m", action="store_true")
    # ladder checkpoints live in git-tracked trained/ (round-3 reset lesson)
    ap.add_argument("--lsvc-levels", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--dvc-levels", type=int, nargs="+", default=[0, 2, 4, 6])
    ap.add_argument("--m-levels", type=int, nargs="+",
                    default=[0, 1, 2, 3, 4, 5])
    ap.add_argument("--gate-min-psnr", type=float, default=30.0,
                    help="bench.py quality-gate floor echoed here")
    ap.add_argument("--gate-max-bpp", type=float, default=0.60)
    args = ap.parse_args()

    from fvc.core.config import MSSSIM_LAMBDAS, PSNR_LAMBDAS
    from fvc.train.evaluate import bd_psnr, bd_rate

    lsvc_pat, lsvc_kind = pick_pattern("trained/lsvc_ladder_ema_l{level}",
                                       "trained/lsvc_ladder_l{level}",
                                       args.lsvc_levels)
    dvc_pat, dvc_kind = pick_pattern("trained/dvc_ladder_ema_l{level}",
                                     "trained/dvc_ladder_l{level}",
                                     args.dvc_levels)
    m_pat, m_kind = pick_pattern("trained/dvc_m_ema_l{level}",
                                 "trained/dvc_m_l{level}", args.m_levels)

    results = {}
    print(f"== LSVC ladder ({lsvc_kind}) ==", flush=True)
    results["LSVC"] = run_eval("LSVC", lsvc_pat, args.lsvc_levels,
                               args.gop, args.clips, args.cpu)
    print(f"== DVC ladder ({dvc_kind}) ==", flush=True)
    results["DVC"] = run_eval("DVC", dvc_pat, args.dvc_levels,
                              args.gop, args.clips, args.cpu)
    steps = {"LSVC": ckpt_steps(lsvc_pat, args.lsvc_levels),
             "DVC": ckpt_steps(dvc_pat, args.dvc_levels)}

    # in-container anchor curve on the SAME clips (same profile AND seed)
    from fvc.anchors.mjpeg import QUALITY_LADDER, compress_video
    from fvc.data.datasets import SyntheticVideoDataset

    sds = SyntheticVideoDataset(num_videos=args.clips, frames=args.gop,
                                height=256, width=256, seed=CORPUS_SEED,
                                profile="hard")
    gops = [sds[i] for i in range(len(sds))]
    mj_q = [QUALITY_LADDER[i] for i in (0, 2, 4, 6)]
    mj_bpp, mj_psnr = [], []
    for q in mj_q:
        rows = [compress_video(np.asarray(g, np.float32), q) for g in gops]
        mj_bpp.append(float(np.mean([r["bpp"] for r in rows])))
        mj_psnr.append(float(np.mean([r["psnr"] for r in rows])))

    def monotone(curve):
        """Drop broken ladder points before BD integration: a level whose
        PSNR falls below the previous (cheaper) level's is a diverged/
        undertrained checkpoint, and feeding it to the piecewise-cubic BD
        fit corrupts the whole integral. The TABLES still show every row."""
        bpp, psnr, levels = [], [], []
        for b, p, l in zip(curve["bpp"], curve["psnr"], curve["levels"]):
            if psnr and p < psnr[-1]:
                print(f"# BD: dropping non-monotone point l{l} "
                      f"({p:.2f} dB @ {b:.3f} bpp)", flush=True)
                continue
            bpp.append(b); psnr.append(p); levels.append(l)
        return {"bpp": bpp, "psnr": psnr, "levels": levels,
                "codec": curve["codec"]}

    lsvc_c = monotone(results["LSVC"][1])
    dvc_c = monotone(results["DVC"][1])
    bd_lsvc_vs_dvc = bd_rate(dvc_c["bpp"], dvc_c["psnr"],
                             lsvc_c["bpp"], lsvc_c["psnr"])
    bdp_lsvc_vs_dvc = bd_psnr(dvc_c["bpp"], dvc_c["psnr"],
                              lsvc_c["bpp"], lsvc_c["psnr"])
    bd_dvc_vs_mjpeg = bd_rate(mj_bpp, mj_psnr, dvc_c["bpp"], dvc_c["psnr"])
    bd_lsvc_vs_mjpeg = bd_rate(mj_bpp, mj_psnr, lsvc_c["bpp"], lsvc_c["psnr"])

    # est-vs-actual bits consistency
    def est_act(rows):
        vals = [abs(r["bpp_act"] - r["bpp_est"]) / r["bpp_est"]
                for r in rows if r.get("bpp_act")]
        return max(vals) if vals else float("nan")

    # MS-SSIM-trained ladder (extended table; reference base [8,16,32,64],
    # models.py:72-76)
    m_rows = None
    if not args.skip_m and os.path.isdir(m_pat.format(level=args.m_levels[0])):
        print(f"== MS-SSIM ladder ({m_kind}) ==", flush=True)
        try:
            m_rows, _ = run_eval("DVC", m_pat, args.m_levels,
                                 args.gop, args.clips, args.cpu)
            steps["M"] = ckpt_steps(m_pat, args.m_levels)
        except SystemExit:
            m_rows = None

    ablation = None
    if not args.skip_ablation:
        print("== tree ablation ==", flush=True)
        cmd = [sys.executable, "scripts/analysis.py", "tree-ablation",
               "--ckpt-pattern", lsvc_pat,
               "--levels", "1", "2", "--gop", "6", "--max-gops", "2"]
        out = subprocess.run(cmd, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                ablation = json.loads(line).get("tree_ablation")

    def fmt_curve(name, rows, curve, step_map):
        lines = [f"### {name}\n",
                 "| level | lambda | bpp (real) | bpp (est) | PSNR | "
                 "MS-SSIM dB | bpp_mv | bpp_res | ckpt step |",
                 "|---|---|---|---|---|---|---|---|---|"]
        for r in rows:
            mss = r.get("msssim_db", float("nan"))
            lines.append(
                f"| {r['level']} | {PSNR_LAMBDAS[r['level']]} | "
                f"{r['bpp_act']:.4f} | {r['bpp_est']:.4f} | "
                f"{r['psnr']:.2f} | {mss:.2f} | {r.get('bpp_mv', 0):.4f} | "
                f"{r.get('bpp_res', 0):.4f} | {step_map.get(r['level'])} |")
        return "\n".join(lines)

    doc = ["# Round-5 rate-distortion results (trained ladders, REAL rANS "
           "bitstreams, HARD corpus)\n",
           f"Setting: HARD synthetic corpus (profile='hard', eval seed "
           f"{CORPUS_SEED} — fractal textures, affine global+local motion, "
           "occluders, photometric drift, sensor noise; calibrated so the "
           "MJPEG/DCT anchor needs real-video-like rates, see the anchor "
           f"table), {args.clips} held-out clips, GOP {args.gop}, 256x256, "
           "frame 0 = given I-frame. Every bpp_act is counted from the "
           "actual byte strings produced by the C++ rANS coder and the "
           "decoder output is the bitstream reconstruction. Ladder rows "
           f"evaluate {lsvc_kind}/{dvc_kind} checkpoints (EMA = Polyak "
           "average tracked during training).\n",
           fmt_curve(f"LSVC (ladder levels {args.lsvc_levels}, lambda "
                     f"{[PSNR_LAMBDAS[l] for l in args.lsvc_levels]}, "
                     f"{lsvc_kind} ckpts)",
                     *results["LSVC"], steps["LSVC"]) + "\n",
           fmt_curve(f"DVC (ladder levels {args.dvc_levels}, lambda "
                     f"{[PSNR_LAMBDAS[l] for l in args.dvc_levels]}, "
                     f"{dvc_kind} ckpts)",
                     *results["DVC"], steps["DVC"]) + "\n",
           "### MJPEG-class intra anchor (same clips)\n",
           "| quality | bpp (real) | PSNR |", "|---|---|---|"]
    for q, b, p in zip(mj_q, mj_bpp, mj_psnr):
        doc.append(f"| {q} | {b:.4f} | {p:.2f} |")
    doc += ["\n### Bjontegaard deltas\n",
            f"- BD-rate(LSVC vs DVC): {fmt_bd(bd_lsvc_vs_dvc)} "
            f"(BD-PSNR {bdp_lsvc_vs_dvc:+.2f} dB) — negative = LSVC cheaper "
            "at equal quality (the reference's core Hermes claim, "
            "plot_hermes.py:752-769)",
            f"- BD-rate(DVC vs MJPEG anchor): {fmt_bd(bd_dvc_vs_mjpeg)}",
            f"- BD-rate(LSVC vs MJPEG anchor): {fmt_bd(bd_lsvc_vs_mjpeg)}",
            f"- max |bpp_act - bpp_est|/bpp_est: LSVC "
            f"{est_act(results['LSVC'][0]):.2%}, DVC "
            f"{est_act(results['DVC'][0]):.2%}"]

    # bench quality gate echoed on the LSVC l2 row (self-consistency with
    # BENCH_r05.json's quality_ok field)
    l2 = next((r for r in results["LSVC"][0] if r["level"] == 2), None)
    if l2 is not None:
        ok = (l2["psnr"] >= args.gate_min_psnr
              and l2["bpp_act"] <= args.gate_max_bpp)
        doc += [f"- bench quality gate (LSVC l2: PSNR >= "
                f"{args.gate_min_psnr:.0f} dB, bpp <= "
                f"{args.gate_max_bpp:.2f}): measured {l2['psnr']:.2f} dB @ "
                f"{l2['bpp_act']:.3f} bpp -> "
                f"{'PASS' if ok else 'FAIL'}"]

    if m_rows:
        mss_vals = [r.get("msssim_db", float("nan")) for r in m_rows]
        span = (np.nanmax(mss_vals) - np.nanmin(mss_vals)
                if np.isfinite(mss_vals).any() else float("nan"))
        doc += ["\n### MS-SSIM-trained ladder (loss_type M, lambda "
                f"{[MSSSIM_LAMBDAS[l] for l in args.m_levels]}; base table "
                f"models.py:72-76, extended past 64; {m_kind} ckpts)\n",
                "| level | lambda_M | bpp (real) | MS-SSIM dB | PSNR | "
                "ckpt step |",
                "|---|---|---|---|---|---|"]
        for r in m_rows:
            mss = r.get("msssim_db", float("nan"))
            doc.append(f"| {r['level']} | {MSSSIM_LAMBDAS[r['level']]} | "
                       f"{r['bpp_act']:.4f} | {mss:.2f} | {r['psnr']:.2f} | "
                       f"{steps.get('M', {}).get(r['level'])} |")
        doc += [f"\nM-ladder MS-SSIM span: {span:.2f} dB "
                f"(gate >= 2 dB: {'PASS' if span >= 2.0 else 'FAIL'})"]

    # error propagation: per-frame PSNR across the GOP (plot_hermes.py:814-831)
    doc += ["\n### Error propagation: per-frame PSNR across the GOP "
            "(plot_hermes.py:814-831)\n",
            "DVC predicts each frame from the previous reconstruction, so "
            "errors compound along the chain; LSVC's tree bounds the "
            "reference depth at O(log GOP). Gate: decay <= "
            f"{DRIFT_GATE_DB:.0f} dB over the GOP.\n"]
    drift = {}
    for name in ("LSVC", "DVC"):
        rows = results[name][0]
        per = [r["psnr_per_frame"] for r in rows if r.get("psnr_per_frame")]
        if not per:
            continue
        n = min(len(p) for p in per)
        mean = np.mean([p[:n] for p in per], axis=0)
        drift[name] = float(mean[0] - mean[-1])
        gate = "PASS" if drift[name] <= DRIFT_GATE_DB else "FAIL"
        doc += [f"{name} (mean over levels): " +
                " ".join(f"{v:.2f}" for v in mean) +
                f"  (frame1 - frameN = {drift[name]:+.2f} dB -> {gate})"]
    # bit allocation: motion vs residual split (plot_hermes.py:708-719)
    doc += ["\n### Bit allocation: motion vs residual share "
            "(plot_hermes.py:708-719; reference mv share ~25%)\n",
            "| codec | level | bpp_mv | bpp_res | mv share |",
            "|---|---|---|---|---|"]
    for name in ("LSVC", "DVC"):
        for r in results[name][0]:
            mv, res = r.get("bpp_mv", 0.0), r.get("bpp_res", 0.0)
            tot = (mv + res) or 1.0
            doc.append(f"| {name} | {r['level']} | {mv:.4f} | {res:.4f} | "
                       f"{mv / tot:.1%} |")
    if ablation:
        doc += ["\n### LSVC tree ablation (shared trained weights; "
                "plot_hermes.py:570-609)\n",
                "| variant | level | bpp | PSNR | fps |",
                "|---|---|---|---|---|"]
        for r in ablation:
            doc.append(f"| {r['variant']} | {r['level']} | {r['bpp']:.3f} | "
                       f"{r['psnr']:.2f} | {r['fps']:.1f} |")

    # multiview story: trained finetune + benchmark + OLFT records
    # (reference train_multiview.py:487-497, 570-604)
    mv_sections = []
    for tag, title in (("finetune.office", "multiview fine-tune (office)"),
                       ("benchmark.office", "benchmark from trained ckpt"),
                       ("office.l2", "OLFT bandwidth accounting "
                                     "(joint psnr+bandwidth, r5 fix)")):
        recs = read_jsonl(f"logs/MCVC-IA-OLFT.{tag}.log")
        if recs:
            mv_sections.append(f"- {title}: `{json.dumps(recs[-1])}`")
    if mv_sections:
        doc += ["\n### MCVC-IA multiview (train_multiview.py:487-604)\n",
                *mv_sections]

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(doc) + "\n")
    print(json.dumps({
        "bd_rate_lsvc_vs_dvc_pct": round(bd_lsvc_vs_dvc, 2),
        "bd_psnr_lsvc_vs_dvc_db": round(bdp_lsvc_vs_dvc, 3),
        "drift_db": {k: round(v, 2) for k, v in drift.items()},
        "lsvc": lsvc_c, "dvc": dvc_c, "out": args.out}))


if __name__ == "__main__":
    main()
