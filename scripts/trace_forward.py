#!/usr/bin/env python
"""Trace the full LSVC forward on-device and bucket device time by HLO
category + top ops (the jax.profiler replacement for the reference's
perf_counter meters — SURVEY §5). Works through the axon tunnel.

Usage: python scripts/trace_forward.py [--gop 6] [--height 640] [--width 960]
       [--codec LSVC] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def run_and_trace(args, logdir):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fvc.core.policy import bf16_compute
    from fvc.models.registry import get_codec_model

    model, cfg = get_codec_model(args.codec)
    gop, H, W = args.gop, args.height, args.width
    x = jnp.asarray(
        np.random.RandomState(0).rand(gop + 1, H, W, 3).astype(np.float32))
    variables = jax.jit(lambda k, xs: model.init(k, xs, training=False))(
        jax.random.PRNGKey(0), x[:3, :128, :128])
    jax.block_until_ready(variables)

    def fwd(variables, x):
        with bf16_compute():
            com, out = model.apply(variables, x, training=False)
        return com

    forward = jax.jit(fwd)
    jax.block_until_ready(forward(variables, x))  # compile + warm

    jax.profiler.start_trace(logdir)
    com = forward(variables, x)
    _ = float(jnp.ravel(com)[0])
    jax.profiler.stop_trace()


def parse(logdir, top):
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files under", logdir)
        return
    cat = collections.Counter()
    ops = collections.Counter()
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            a = ev.get("args") or {}
            hc = a.get("hlo_category")
            if hc is None or ev.get("dur") is None:
                continue
            us = ev["dur"]
            cat[hc] += us
            ops[(hc, ev.get("name", "?"))] += us
            total += us
    print(f"total device op time: {total / 1e3:.1f} ms")
    print("\nby category:")
    for k, v in cat.most_common():
        print(f"  {k:32s} {v / 1e3:9.2f} ms  {100 * v / total:5.1f}%")
    print(f"\ntop {top} ops:")
    for (hc, name), v in ops.most_common(top):
        print(f"  {v / 1e3:9.2f} ms  [{hc}] {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gop", type=int, default=6)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--codec", default="LSVC")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--logdir", default="/tmp/fvc_trace")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        import shutil

        shutil.rmtree(args.logdir, ignore_errors=True)
        run_and_trace(args, args.logdir)
    parse(args.logdir, args.top)


if __name__ == "__main__":
    main()
