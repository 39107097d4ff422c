#!/usr/bin/env python
"""One-shot perf measurement suite for a quiet-TPU window (training paused).

Runs, in order, and appends JSON lines to docs/PERF_r03.jsonl:
1. LSVC per-stage chain times (reference E-FL/E-MV/... meter taxonomy)
2. bf16 vs f32 GOP time and the warp-radius sensitivity of the headline
3. family bench variants are run separately via scripts/bench_family.py

Usage: python scripts/perf_window.py [--out docs/PERF_r03.jsonl]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/PERF_r03.jsonl")
    ap.add_argument("--gop", type=int, default=6)
    ap.add_argument("--height", type=int, default=640)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fvc.bench.stages import lsvc_stage_times
    from fvc.core.policy import bf16_compute, compute_in
    from fvc.models.registry import get_codec_model
    from fvc.ops.warp import warp_method

    out = open(args.out, "a")

    def emit(obj):
        obj["t"] = round(time.time(), 1)
        out.write(json.dumps(obj) + "\n")
        out.flush()
        print(json.dumps(obj), flush=True)

    model, cfg = get_codec_model("LSVC")
    gop, H, W = args.gop, args.height, args.width
    x = jnp.asarray(np.random.RandomState(0).rand(
        gop + 1, H, W, 3).astype(np.float32))
    variables = jax.jit(
        lambda k, xs: model.init(k, xs, training=False)
    )(jax.random.PRNGKey(0), x[:3, :128, :128])
    jax.block_until_ready(variables)

    # ---- per-stage times (reference meter taxonomy, models.py:81-86) ----
    with bf16_compute():
        st = lsvc_stage_times(model, variables, x, iters=args.iters)
    emit({"kind": "lsvc_stage_times_ms",
          **{k: round(v * 1e3, 2) for k, v in st.items()}})

    # ---- whole-forward timing under policy/warp variants ----
    def time_fwd(ctx_policy, method, radius):
        def fwd(v, xx):
            with ctx_policy():
                with warp_method(method, radius):
                    com, o = model.apply(v, xx, training=False)
            return com

        def chain(v, xx):
            def body(_, cur):
                com = fwd(v, cur)
                return jnp.concatenate([cur[:1], com], axis=0)
            return jax.lax.fori_loop(0, 4, body, xx)

        f = jax.jit(chain)
        jax.block_until_ready(f(variables, x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(variables, x)
            _ = float(jnp.ravel(o)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / 4

    for label, pol, meth, rad in [
            ("bf16_window_r16", bf16_compute, "window", 16),
            ("bf16_window_r8", bf16_compute, "window", 8),
            ("bf16_window_r32", bf16_compute, "window", 32),
            ("f32_window_r16", lambda: compute_in(None), "window", 16),
    ]:
        dt = time_fwd(pol, meth, rad)
        emit({"kind": "lsvc_fwd_variant", "variant": label,
              "gop_time_ms": round(dt * 1e3, 1),
              "fps": round(gop / dt, 2)})

    out.close()


if __name__ == "__main__":
    main()
