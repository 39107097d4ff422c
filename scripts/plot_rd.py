#!/usr/bin/env python
"""RD-curve figure generation — the plot_*.py role (BD-rate tables + curves).

Reads eval JSON rows (from scripts/eval.py runs) or eval .log files and writes
an RD figure + BD-rate table vs the first (anchor) curve.

Example:
  python scripts/plot_rd.py --curves lsvc.json dvc.json --out rd.png
  # each JSON: {"codec": ..., "points": [{"bpp": ..., "psnr": ...}, ...]}
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curves", nargs="+", required=True)
    ap.add_argument("--out", default="rd.png")
    args = ap.parse_args()

    from fvc.train.evaluate import bd_psnr, bd_rate

    curves = []
    for path in args.curves:
        with open(path) as f:
            curves.append(json.load(f))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4.5))
    anchor = curves[0]
    a_bpp = [p["bpp"] for p in anchor["points"]]
    a_psnr = [p["psnr"] for p in anchor["points"]]
    rows = []
    for c in curves:
        bpp = [p["bpp"] for p in c["points"]]
        psnr = [p["psnr"] for p in c["points"]]
        ax.plot(bpp, psnr, "o-", label=c.get("codec", "?"))
        if c is not anchor and len(bpp) >= 2 and len(a_bpp) >= 2:
            rows.append((c.get("codec", "?"),
                         bd_rate(a_bpp, a_psnr, bpp, psnr),
                         bd_psnr(a_bpp, a_psnr, bpp, psnr)))
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)")
    ax.grid(alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(json.dumps({
        "figure": args.out,
        "bd_vs_" + anchor.get("codec", "anchor"): [
            {"codec": r[0], "bd_rate_pct": r[1], "bd_psnr_db": r[2]}
            for r in rows],
    }))


if __name__ == "__main__":
    main()
