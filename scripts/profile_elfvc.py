#!/usr/bin/env python
"""Per-stage device time + speed-of-light report for ELFVC-SP (the Vesper
suite), at the reference's 2048x1024 benchmark resolution — VERDICT r04 #8's
"measured per-stage SoL table showing where the rest is pinned".

Stages mirror forward_inter (fvc/models/elfvc.py:109-152 / reference
models.py:2080-2124): FLOW-PRED, SS-PRED (scale-space warp), M-ENC, M-HYP,
M-DEC, R-ENC, R-HYP, R-DEC.

Usage: python scripts/profile_elfvc.py [--codec ELFVC-SP-HR] [--height 1024]
       [--width 2048] [--pyramid]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="ELFVC-SP-HR")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pyramid", action="store_true",
                    help="fused native-res scale-space pyramid for SS-PRED "
                         "(the -HR+pyr operating point)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fvc.core.policy import bf16_compute, ssf_pyramid
    from fvc.models.registry import get_codec_model
    from fvc.models.ssf import forward_prediction

    model, cfg = get_codec_model(args.codec)
    H, W = args.height, args.width
    rng = np.random.RandomState(0)
    x_ref = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    x_cur = jnp.asarray(
        np.clip(np.asarray(x_ref) + 0.02 * rng.randn(1, H, W, 3), 0, 1)
        .astype(np.float32))
    state = model.init_state(1, H, W)
    s = min(H, W, 256)
    variables = jax.jit(
        lambda k: model.init(k, x_cur[:, :s, :s], x_ref[:, :s, :s],
                             model.init_state(1, s, s), training=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)

    import contextlib

    @contextlib.contextmanager
    def policy():
        if args.pyramid:
            with bf16_compute(), ssf_pyramid():
                yield
        else:
            with bf16_compute():
                yield

    def wrap(fn):
        def run(*a):
            with policy():
                return fn(*a)
        return jax.jit(run)

    mprior = state.motion_info_prior
    fp_in = jnp.concatenate([x_ref, state.x_ref_ref, mprior], axis=-1)
    flow_fn = wrap(lambda z: model.apply(
        variables, z, method=lambda m, y: m.flow_predictor(y)))
    motion = flow_fn(fp_in)
    ss_fn = wrap(lambda r, mo: forward_prediction(
        r, mo, sigma0=model.sigma0, num_levels=model.num_levels,
        scale_field_shift=model.scale_field_shift))
    x_pred = ss_fn(x_ref, motion)
    menc_in = jnp.concatenate([x_cur, x_pred], axis=-1)
    menc = wrap(lambda z: model.apply(
        variables, z, method=lambda m, y: m.motion_encoder(y)))
    y_motion = menc(menc_in)
    mhyp = wrap(lambda y: model.apply(
        variables, y, None, training=False,
        method=lambda m, yy, q, **kw: m.motion_hyperprior(yy, q, **kw)))
    y_motion_hat = mhyp(y_motion)[0]
    mdec = wrap(lambda y: model.apply(
        variables, y, method=lambda m, yy: m.motion_decoder(yy)))
    _ = mdec(y_motion_hat)
    x_res = x_cur - x_pred
    renc = wrap(lambda z: model.apply(
        variables, z, method=lambda m, y: m.res_encoder(y)))
    y_res = renc(x_res)
    rhyp = wrap(lambda y: model.apply(
        variables, y, None, training=False,
        method=lambda m, yy, q, **kw: m.res_hyperprior(yy, q, **kw)))
    y_res_hat = rhyp(y_res)[0]
    rdec_in = jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
    rdec = wrap(lambda y: model.apply(
        variables, y, method=lambda m, yy: m.res_decoder(yy)))
    _ = rdec(rdec_in)

    stages = [
        ("FLOW-PRED", flow_fn, (fp_in,)),
        ("SS-PRED", ss_fn, (x_ref, motion)),
        ("M-ENC", menc, (menc_in,)),
        ("M-HYP", mhyp, (y_motion,)),
        ("M-DEC", mdec, (y_motion_hat,)),
        ("R-ENC", renc, (x_res,)),
        ("R-HYP", rhyp, (y_res,)),
        ("R-DEC", rdec, (rdec_in,)),
    ]

    def loop_time(fn, a, iters):
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
    print(f"# {args.codec} {H}x{W} pyramid={args.pyramid}")
    print(f"{'stage':10s} {'ms':>9s} {'GFLOP':>9s} {'TFLOP/s':>8s} {'%SoL':>6s}")
    for name, fn, a in stages:
        ca = fn.lower(*a).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gflop = (ca or {}).get("flops", 0.0) / 1e9
        t = loop_time(fn, a, args.iters)
        tfs = gflop / t / 1e3
        total_t += t
        total_f += gflop
        print(f"{name:10s} {t*1e3:9.1f} {gflop:9.1f} {tfs:8.2f} "
              f"{100*tfs/PEAK_TFLOPS:5.1f}%")
    print(f"{'TOTAL':10s} {total_t*1e3:9.1f} {total_f:9.1f} "
          f"{total_f/total_t/1e3:8.2f} "
          f"{100*(total_f/total_t/1e3)/PEAK_TFLOPS:5.1f}%")
    print(f"# fps at this stage-sum: {1.0/total_t:.2f}")


if __name__ == "__main__":
    main()
