#!/usr/bin/env python
"""Microbench: 3x3 64-ch conv formulations on the v5e chip (WarpNet hot shape).

Times each variant as a fori_loop chain inside ONE jit program (per-call
dispatch through the device tunnel is ~30 ms, so per-call loops lie).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=6)
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W = args.b, args.h, args.w
    rng = np.random.RandomState(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def timeit(name, fn, x, gflop):
        def body(i, c):
            y = fn(c)
            # feed a scalar back so iterations serialize
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
        print(f"{name:34s} {t*1e3:8.2f} ms  {gflop/t/1e3:7.1f} TFLOP/s "
              f"({100*gflop/t/1e3/197:4.1f}% SoL)", flush=True)
        return t

    C = 64
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.rand(3, 3, C, C).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    gflop = B * H * W * 9 * C * C * 2 / 1e9

    # 1. plain lax conv (what Conv does today)
    timeit("conv3x3 64->64 bf16 (lax.conv)",
           lambda c: jax.lax.conv_general_dilated(
               c, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
               preferred_element_type=jnp.bfloat16), x, gflop)

    # 2. 128 channels for reference scaling
    C2 = 128
    x2 = jnp.asarray(rng.rand(B, H, W, C2).astype(np.float32)).astype(jnp.bfloat16)
    w32 = jnp.asarray(rng.rand(3, 3, C2, C2).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    timeit("conv3x3 128->128 bf16",
           lambda c: jax.lax.conv_general_dilated(
               c, w32, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
               preferred_element_type=jnp.bfloat16),
           x2, B * H * W * 9 * C2 * C2 * 2 / 1e9)

    # 3. s2d-packed exact equivalent of (1)
    from fvc.ops.conv import pack_s2d_weights, space_to_depth, depth_to_space
    wp, pad = pack_s2d_weights(w3, 2)
    P = wp.shape[0]
    gflop_p = B * (H // 2) * (W // 2) * P * P * (4 * C) * (4 * C) * 2 / 1e9

    def s2d_conv(c):
        cp = space_to_depth(c, 2)
        y = jax.lax.conv_general_dilated(
            cp, wp, (1, 1), (pad, pad), dimension_numbers=dn,
            preferred_element_type=jnp.bfloat16)
        return depth_to_space(y, 2)
    timeit(f"conv3x3 s2d-packed (P={P}, 256ch)", s2d_conv, x, gflop)
    print(f"  (structural FLOPs {gflop_p:.0f} vs logical {gflop:.0f})")

    # 4. im2col matmul: unfold 9 taps into contraction dim (576)
    def im2col_conv(c):
        patches = jnp.concatenate(
            [jnp.roll(c, (dy, dx), axis=(1, 2))
             for dy in (1, 0, -1) for dx in (1, 0, -1)], axis=-1)
        return patches.reshape(B, H, W, 9 * C) @ w3.reshape(9 * C, C)
    timeit("conv3x3 im2col matmul (K=576)", im2col_conv, x, gflop)

    # 5. 5-conv WarpNet-ish stack (fusion behavior across convs)
    def stack5(c):
        y = c
        for _ in range(5):
            y = jax.nn.relu(jax.lax.conv_general_dilated(
                y, w3, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
                preferred_element_type=jnp.bfloat16))
        return y
    timeit("5x(conv3x3+relu) 64ch", stack5, x, 5 * gflop)

    # 6. first conv of WarpNet: 6->64 (tiny cin)
    x6 = jnp.asarray(rng.rand(B, H, W, 6).astype(np.float32)).astype(jnp.bfloat16)
    w6 = jnp.asarray(rng.rand(3, 3, 6, C).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    timeit("conv3x3 6->64",
           lambda c: jax.lax.conv_general_dilated(
               c, w6, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
               preferred_element_type=jnp.bfloat16),
           x6, B * H * W * 9 * 6 * C * 2 / 1e9)


if __name__ == "__main__":
    main()
