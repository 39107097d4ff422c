#!/usr/bin/env python
"""Microbench: resize / pool / deconv formulations at WarpNet shapes."""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--h", type=int, default=320)
    ap.add_argument("--w", type=int, default=480)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, C = args.b, args.h, args.w, args.c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    def timeit(name, fn, x):
        def body(i, c):
            y = fn(c)
            return c + 0.0 * jnp.mean(y).astype(c.dtype)
        run = jax.jit(lambda x0: jax.lax.fori_loop(0, args.iters, body, x0))
        jax.block_until_ready(run(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            _ = float(jnp.ravel(out)[0])
            ts.append(time.perf_counter() - t0)
        t = min(ts) / args.iters
        gb = x.size * x.dtype.itemsize / 1e9
        print(f"{name:40s} {t*1e3:8.2f} ms  (in-tensor {gb*1e3:.0f} MB)",
              flush=True)
        return t

    from fvc.ops.resize import avg_pool2, bilinear_resize, upsample2x

    timeit("upsample2x align=True (take-based)",
           lambda c: upsample2x(c, align_corners=True), x)
    timeit("upsample2x align=False (take-based)",
           lambda c: upsample2x(c, align_corners=False), x)
    timeit("avg_pool2 (reduce_window)", avg_pool2, x)

    # repeat-based nearest 2x for reference (pure bandwidth baseline)
    timeit("nearest 2x (jnp.repeat)",
           lambda c: jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2), x)

    # phase-decomposed align_corners=False 2x:
    # out[2i] = .25 x[i-1] + .75 x[i]; out[2i+1] = .75 x[i] + .25 x[i+1]
    def up2_phase(c):
        for ax in (1, 2):
            lo = jnp.concatenate([c[:, :1] if ax == 1 else c[:, :, :1],
                                  jax.lax.slice_in_dim(c, 0, c.shape[ax] - 1, axis=ax)], axis=ax)
            hi = jnp.concatenate([jax.lax.slice_in_dim(c, 1, c.shape[ax], axis=ax),
                                  c[:, -1:] if ax == 1 else c[:, :, -1:]], axis=ax)
            q = jnp.asarray(0.25, c.dtype)
            t = jnp.asarray(0.75, c.dtype)
            even = q * lo + t * c
            odd = t * c + q * hi
            c = jnp.stack([even, odd], axis=ax + 1)
            sh = list(c.shape)
            sh[ax] *= 2
            del sh[ax + 1]
            c = c.reshape(sh)
        return c
    y1 = up2_phase(x.astype(jnp.float32))
    y2 = bilinear_resize(x.astype(jnp.float32), 2 * H, 2 * W, align_corners=False)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    timeit(f"up2 phase-decomposed aligned=False (err={err:.2e})", up2_phase, x)

    # deconv: lhs_dilation vs subpixel (4-phase conv + pixel shuffle)
    dn = ("NHWC", "HWIO", "NHWC")
    k = 5
    w5 = jnp.asarray(rng.rand(k, k, C, C).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def deconv_dilated(c):
        p = k // 2
        lo, hi = k - 1 - p, k - 1 - p + 1
        return jax.lax.conv_general_dilated(
            c, w5, (1, 1), ((lo, hi), (lo, hi)), lhs_dilation=(2, 2),
            dimension_numbers=dn, preferred_element_type=jnp.bfloat16)
    timeit("deconv5x5 s2 (lhs_dilation)", deconv_dilated, x)

    from fvc.ops.conv import depth_to_space

    def deconv_subpixel(c):
        # out[2i+a, 2j+b] = sum_{u,v s.t. taps align} w[...] x[...]
        # phase (a,b) uses taps u ≡ (k-1-p+a) mod 2 — build 4 phase kernels
        p = k // 2
        outs = []
        for a in (0, 1):
            for b in (0, 1):
                # dilated output index 2i+a reads dilated input positions
                # 2i+a - (k-1-p) + u for u in 0..k-1; valid when even.
                us = [u for u in range(k) if (a - (k - 1 - p) + u) % 2 == 0]
                vs = [v for v in range(k) if (b - (k - 1 - p) + v) % 2 == 0]
                wk = w5[jnp.asarray(us)][:, jnp.asarray(vs)]
                # input offset for first tap
                su = (a - (k - 1 - p) + us[0]) // 2
                sv = (b - (k - 1 - p) + vs[0]) // 2
                ph = jax.lax.conv_general_dilated(
                    c, wk[::-1, ::-1] if False else wk, (1, 1),
                    ((len(us) - 1 + su, -su), (len(vs) - 1 + sv, -sv)),
                    dimension_numbers=dn, preferred_element_type=jnp.bfloat16)
                outs.append(ph)
        y = jnp.concatenate(outs, axis=-1)  # [B,H,W,4C] phases (a,b)
        return depth_to_space(y, 2)
    try:
        ya = deconv_dilated(x.astype(jnp.float32).astype(jnp.bfloat16))
        yb = deconv_subpixel(x.astype(jnp.float32).astype(jnp.bfloat16))
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    except Exception as e:  # noqa
        err = float("nan")
        print("subpixel construction error:", e)
    timeit(f"deconv5x5 s2 (subpixel 4-phase, err={err:.2e})", deconv_subpixel, x)

    # stride-2 5x5 conv (encoder side)
    def conv_s2(c):
        return jax.lax.conv_general_dilated(
            c, w5, (2, 2), ((2, 2), (2, 2)), dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)
    timeit("conv5x5 s2", conv_s2, x)

    # GDN at latent shape
    from fvc.ops.gdn import GDN
    g = GDN()
    gv = g.init(jax.random.PRNGKey(0), x)
    timeit("GDN (xla)", lambda c: g.apply(gv, c), x)


if __name__ == "__main__":
    main()
