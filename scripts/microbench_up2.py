#!/usr/bin/env python
"""Isolate 2x-upsample cost: H-only vs W-only vs channel-phase vs Pallas."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, C = 6, 320, 480, 64
    iters = 20
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    big = jnp.asarray(rng.rand(B, 2 * H, 2 * W, C).astype(np.float32)).astype(jnp.bfloat16)

    def timeit(name, fn, *a):
        def body(i, c):
            y = fn(c, *a[1:])
            return c + 0.0 * jnp.ravel(y)[0].astype(c.dtype)
        run = jax.jit(lambda x0: jax.lax.fori_loop(0, iters, body, x0))
        jax.block_until_ready(run(a[0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(a[0])
            _ = float(jnp.ravel(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(ts)/iters*1e3:8.2f} ms", flush=True)

    # pure H-axis double (take-based lerp along H only)
    from fvc.ops.resize import bilinear_resize
    timeit("up2 H only (take)", lambda c: bilinear_resize(c, 2 * H, W, align_corners=False), x)
    timeit("up2 W only (take)", lambda c: bilinear_resize(c, H, 2 * W, align_corners=False), x)

    # channel-phase W doubling: [B,H,W,C] -> [B,H,W,2C] (no sublane interleave)
    def w_phase(c):
        lo = jnp.concatenate([c[:, :, :1], c[:, :, :-1]], axis=2)
        hi = jnp.concatenate([c[:, :, 1:], c[:, :, -1:]], axis=2)
        q = jnp.asarray(0.25, c.dtype); t = jnp.asarray(0.75, c.dtype)
        return jnp.concatenate([q * lo + t * c, t * c + q * hi], axis=-1)
    timeit("up2 W as channel phases (no interleave)", w_phase, x)

    # the d2s relayout alone
    from fvc.ops.conv import depth_to_space
    xp = w_phase(x)

    def d2s_w(c):
        B_, H_, W_, C2 = c.shape
        return c.reshape(B_, H_, W_, 2, C2 // 2).transpose(0, 1, 2, 3, 4).reshape(
            B_, H_, W_ * 2, C2 // 2)
    timeit("W interleave reshape alone", d2s_w, xp)

    # fused add path: c1 + up2(c3) then relu (WarpNet skip shape)
    def skip_take(c, c1):
        return jax.nn.relu(c1 + bilinear_resize(c, 2 * H, 2 * W, align_corners=True))
    timeit("c1 + up2(c3, align=True) + relu (take)", skip_take, x, big)

    # Pallas availability probe + fused upsample-add kernel
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def k_double(in_ref, out_ref):
            out_ref[:] = in_ref[:] * 2.0

        y = pl.pallas_call(
            k_double,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x[:1, :64, :128])
        jax.block_until_ready(y)
        print("pallas basic kernel: OK", flush=True)
    except Exception as e:
        print(f"pallas basic kernel FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return

    # fused upsample(align=True)+add+relu pallas kernel, blocked over H rows
    def mk_up_add(Hs, Ws, align=True):
        # static per-output-row/col lo index + frac (align_corners=True)
        def weights(n_out, n_in):
            if align:
                pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
            else:
                pos = np.clip((np.arange(n_out) + 0.5) / 2 - 0.5, 0, n_in - 1)
            lo = np.clip(np.floor(pos).astype(np.int32), 0, n_in - 1)
            hi = np.minimum(lo + 1, n_in - 1)
            fr = (pos - lo).astype(np.float32)
            return lo, hi, fr
        lo_h, hi_h, fr_h = weights(2 * Hs, Hs)
        lo_w, hi_w, fr_w = weights(2 * Ws, Ws)
        # W gather as one-hot matmul inside VMEM? cheaper: precompute col mix
        # matrix [Ws, 2Ws] (sparse 2-banded) as dense bf16 -> MXU matmul.
        M = np.zeros((Ws, 2 * Ws), np.float32)
        M[lo_w, np.arange(2 * Ws)] += 1 - fr_w
        M[hi_w, np.arange(2 * Ws)] += fr_w
        Mj = jnp.asarray(M, jnp.bfloat16)
        fr_hj = jnp.asarray(fr_h, jnp.float32)
        lo_hj = jnp.asarray(lo_h, jnp.int32)

        TILE = 64  # output rows per block

        def kernel(x_ref, skip_ref, m_ref, out_ref):
            # x_ref: [B?, Hs, Ws, C] full (small); skip/out: [TILE, 2Ws, C]
            i = pl.program_id(0)  # row-block
            b = pl.program_id(1)
            acc = jnp.zeros((TILE, 2 * Ws, C), jnp.float32)
            # per output row r in tile: rows lo_h[r], lo_h[r]+1 lerped
            # vectorize: gather rows via dynamic slice per row -> loop TILE
            def row(rr, acc):
                r = i * TILE + rr
                l = lo_hj[r]
                a = x_ref[b, l]          # [Ws, C]
                bb = x_ref[b, jnp.minimum(l + 1, Hs - 1)]
                f = fr_hj[r]
                mixed = a.astype(jnp.float32) * (1 - f) + bb.astype(jnp.float32) * f
                # W mix: [2Ws, Ws] @ [Ws, C]
                mw = jax.lax.dot_general(
                    m_ref[:].astype(jnp.float32), mixed, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return acc.at[rr].set(mw)
            acc = jax.lax.fori_loop(0, TILE, row, acc)
            out_ref[:] = jax.nn.relu(
                acc.astype(skip_ref.dtype) + skip_ref[:])

        def up_add(xs, skip):
            Bq = xs.shape[0]
            return pl.pallas_call(
                kernel,
                grid=(2 * Hs // TILE, Bq),
                in_specs=[
                    pl.BlockSpec((Bq, Hs, Ws, C), lambda i, b: (0, 0, 0, 0),
                                 memory_space=pltpu.ANY),
                    pl.BlockSpec((1, TILE, 2 * Ws, C), lambda i, b: (b, i, 0, 0)),
                    pl.BlockSpec((Ws, 2 * Ws), lambda i, b: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, TILE, 2 * Ws, C), lambda i, b: (b, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((Bq, 2 * Hs, 2 * Ws, C), skip.dtype),
            )(xs, skip, Mj)
        return up_add

    try:
        up_add = mk_up_add(H, W)
        y = up_add(x, big)
        jax.block_until_ready(y)
        ref = jax.nn.relu(big + bilinear_resize(x, 2 * H, 2 * W, align_corners=True).astype(big.dtype))
        err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"pallas up_add err={err:.3e}", flush=True)
        timeit("pallas fused up2+add+relu", lambda s: up_add(x, s), big)
    except Exception as e:
        print(f"pallas up_add FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
