#!/usr/bin/env python
"""BOLA ABR / QoE simulation CLI — reference simulation.py equivalent.

Feeds per-level (PSNR, bitrate, decode-time) ladders (from eval logs or
defaults mirroring the reference hardware tables, simulation.py:130-147) into
the BOLA simulator over synthetic or FCC traces.

Example:
  python scripts/simulate.py --traces 20 --levels 4
  python scripts/simulate.py --trace-csv curr_videostream.csv
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--traces", type=int, default=10)
    ap.add_argument("--trace-csv", default=None)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--segments", type=int, default=200)
    ap.add_argument("--gop", type=int, default=16)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--decode-time", type=float, default=0.010,
                    help="s/frame at top level (reference 3090 ladder)")
    ap.add_argument("--eval-log", default=None,
                    help="build the rate ladder from an eval-CLI log instead "
                         "of the synthetic one (reference task_to_video_trace, "
                         "simulation.py:113-204); pair with --width/--height")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from fvc.sim.bola import (BolaConfig, load_fcc_trace_csv, parse_eval_logs,
                              simulate_over_trace)

    rng = np.random.RandomState(args.seed)
    if args.eval_log:
        psnr, bitrate, dect, tags = parse_eval_logs(
            args.eval_log, width=args.width, height=args.height,
            fps=args.fps, gop=args.gop, segments=args.segments)
        print(json.dumps({"ladder_tags": tags,
                          "bitrates_bps": bitrate[:, 0].tolist()}), flush=True)
    else:
        # rate ladder: log-spaced bitrates, PSNR from a typical RD curve shape
        bitrate = np.geomspace(1e6, 8e6, args.levels)[:, None] * \
            np.ones((1, args.segments))
        psnr = (30.0 + 3.0 * np.log2(bitrate / 1e6)) + rng.rand(*bitrate.shape) * 0.2
        dect = np.full_like(bitrate, args.decode_time * args.gop)

    if args.trace_csv:
        down, lat = load_fcc_trace_csv(args.trace_csv)
        traces = [(down[i * 500:(i + 1) * 500], lat[i * 500:(i + 1) * 500])
                  for i in range(min(args.traces, len(down) // 500))]
    else:
        traces = []
        for i in range(args.traces):
            mean_bw = rng.uniform(2e6, 50e6)
            down = np.clip(mean_bw * (1 + 0.3 * rng.randn(500)), 1e6, 100e6)
            traces.append((down, np.zeros(500)))

    cfg = BolaConfig(gop=args.gop, fps=args.fps)
    rows = []
    for down, lat in traces:
        qoe, qual, rebuf, stall, bw = simulate_over_trace(
            psnr, bitrate, dect, down, lat, cfg)
        rows.append((qoe, qual, rebuf, stall, bw))
    arr = np.asarray(rows)
    print(json.dumps({
        "QoE": [float(arr[:, 0].mean()), float(arr[:, 0].std())],
        "quality": [float(arr[:, 1].mean()), float(arr[:, 1].std())],
        "rebuffer": [float(arr[:, 2].mean()), float(arr[:, 2].std())],
        "stall": [float(arr[:, 3].mean()), float(arr[:, 3].std())],
        "bw": [float(arr[:, 4].mean()), float(arr[:, 4].std())],
    }))


if __name__ == "__main__":
    main()
