#!/usr/bin/env python
"""Per-stage device time + compiled-FLOP speed-of-light report for LSVC
(reference meter taxonomy E-FL/E-MV/..., models.py:81-86).

Usage: python scripts/profile_stages.py [--gop 6] [--height 1088] [--width 1920]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gop", type=int, default=6)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fvc.bench.stages import _chain_time
    from fvc.core.policy import bf16_compute, compute_in
    from fvc.gop.graphs import graph_from_batch, ref_index_from_graph
    from fvc.models.registry import get_codec_model
    from fvc.ops.warp import flow_warp

    model, cfg = get_codec_model("LSVC")
    gop, H, W = args.gop, args.height, args.width
    x = jnp.asarray(
        np.random.RandomState(0).rand(gop + 1, H, W, 3).astype(np.float32))
    variables = jax.jit(lambda k, xs: model.init(k, xs, training=False))(
        jax.random.PRNGKey(0), x[:3, :128, :128])
    jax.block_until_ready(variables)

    policy = (lambda: compute_in(None)) if args.fp32 else bf16_compute

    bs = gop
    g, _, _ = graph_from_batch(bs)
    ref_index = ref_index_from_graph(g, bs)
    target = x[1:]
    refs = x[jnp.asarray(ref_index)]

    def wrap(fn):
        def run(*a):
            with policy():
                return fn(*a)
        return jax.jit(run)

    flow_fn = wrap(lambda t: model.apply(
        variables, t, refs, method=lambda m, a, b: m.optic_flow(a, b)))
    flow = flow_fn(target)
    mv_enc = wrap(lambda f: model.apply(
        variables, f, method=lambda m, y: m.mv_encoder(y)))
    mv_lat = jnp.round(mv_enc(flow))
    mv_dec = wrap(lambda l: model.apply(
        variables, l, method=lambda m, y: m.mv_decoder(y)))
    mv_hat = mv_dec(mv_lat)
    warp_fn = wrap(lambda r, f: flow_warp(r, f))
    warped = warp_fn(refs, mv_hat)
    mc_in = jnp.concatenate([warped, refs], axis=-1)
    mc_fn = wrap(lambda z: model.apply(
        variables, z, method=lambda m, y: m.warpnet(y)))
    res = target - warped
    res_enc = wrap(lambda r: model.apply(
        variables, r, method=lambda m, y: m.res_encoder(y)))
    feat = jnp.round(res_enc(res))
    res_dec = wrap(lambda f: model.apply(
        variables, f, method=lambda m, y: m.res_decoder(y)))

    stages = [
        ("E-FL", flow_fn, (target,)),
        ("E-MV", mv_enc, (flow,)),
        ("D-MV", mv_dec, (mv_lat,)),
        ("WARP", warp_fn, (refs, mv_hat)),
        ("E-MC", mc_fn, (mc_in,)),
        ("E-RES", res_enc, (res,)),
        ("D-RES", res_dec, (feat,)),
    ]

    def loop_time(fn, a, iters):
        """Device time per call: iters applications inside ONE jit program
        (fori_loop; carry = input perturbed by a scalar of the output), so
        per-dispatch tunnel latency (~30ms/call) is amortized away."""
        def body(i, carry):
            out = fn(carry, *a[1:])
            probe = jnp.mean(jax.tree_util.tree_leaves(out)[0]).astype(
                carry.dtype)
            return carry + 0.0 * probe
        run = jax.jit(lambda x0: jax.lax.fori_loop(0, iters, body, x0))
        jax.block_until_ready(run(a[0]))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(a[0])
            _ = float(jnp.ravel(out)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts) / iters

    PEAK_TFLOPS = 197.0  # v5e bf16
    total_t = total_f = 0.0
    print(f"{'stage':8s} {'ms':>9s} {'GFLOP':>9s} {'TFLOP/s':>8s} {'%SoL':>6s}")
    for name, fn, a in stages:
        lowered = fn.lower(*a).compile()
        ca = lowered.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gflop = (ca or {}).get("flops", 0.0) / 1e9
        t = loop_time(fn, a, args.iters)
        tfs = gflop / t / 1e3
        print(f"{name:8s} {t*1e3:9.1f} {gflop:9.1f} {tfs:8.2f} "
              f"{100*tfs/PEAK_TFLOPS:5.1f}%", flush=True)
        total_t += t
        total_f += gflop
    print(f"{'TOTAL':8s} {total_t*1e3:9.1f} {total_f:9.1f} "
          f"{total_f/total_t/1e3:8.2f} {100*total_f/total_t/1e3/PEAK_TFLOPS:5.1f}%")
    print(f"# fps at this stage-sum: {gop/total_t:.2f}")


if __name__ == "__main__":
    main()
