"""Fused WarpNet ResBlock — the pre-activation 2-conv residual block as ONE
Pallas program.

Why: after round-4's SpyNet s2d packing, WarpNet (the reference's Warp_net MC
refinement, models.py:796-830) became LSVC's #1 encode stage: 87.4 ms at 8.7%
speed-of-light for 640x960x6 frames (docs/PERF_r04.log). The program is
occupancy-bound, not roofline-bound — fourteen separate 64-channel XLA convs
each dispatch a low-utilization kernel and bounce intermediates through HBM.
Each WarpNet ResBlock is two 3x3 64->64 convs; fusing the pair keeps the
intermediate in VMEM and halves the dispatch count of the U-net body.

Mosaic status (round-5 probes, docs/PERF_r05.log + ROUND5_NOTES):
- the round-4 "helper 500s on anything non-trivial" had an i1-mask bug of
  OURS as a co-trigger (bool [..., None] minor-dim insert) — fixed here
  with 3-D iotas; small 18-dot chains and 49-dot 7x7 convs now compile.
- THIS kernel still does not deploy on the container's toolchain: the
  full-width tile hangs the helper, and every halo'd tiling tried
  (32x256 / 16x256 / 32x192, reshape-free 3-D dots) trips the 16 MiB
  scoped-VMEM stack limit with an erratically scaling allocation
  (17.3M / 46.3M / 66.6M) — the +4 halo breaks (8,128) lane alignment,
  forcing in-stack relayouts. A deployable variant needs aligned tiles
  with in-register shifts instead of halo'd loads; left gated off
  (FVC_PALLAS_WARPNET) with the XLA path as default.

Tiling mirrors fvc.ops.pallas_spynet.fused_mebasic_tiles: XLA-side
materialized overlapping row tiles + affine BlockSpecs only (no dynamic
memref slicing), with the single intermediate layer's outside-image halo
positions masked back to zero so the fused result is EXACT vs the XLA path
everywhere, including borders.

Exactness: the block computes out = x + conv2(relu(conv1(relu(x)))) with
per-conv SAME zero padding. relu maps the tile's zero padding to zero, so
conv1 sees exactly XLA's padded input; after conv1 the halo columns/rows that
fall outside the image hold relu(bias)-contaminated values and are re-zeroed
before conv2 consumes them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 3
PAD = K // 2      # per-layer halo
HALO = 2 * PAD    # two conv layers


def _conv3_rows(x, w, rows_out, width_out, cdt):
    """x: [rows_out+2, width_out+2, Cin], w: [3, 3, Cin, Cout]; valid conv.
    Nine taps as 3-D [rows, W, Cin] x [Cin, Cout] dot_generals — no
    flatten-reshape (the [rows*W, Cin] flatten materialized per-tap copies
    on Mosaic's scoped-VMEM stack and blew the 16 MiB limit)."""
    cout = w.shape[-1]
    acc = jnp.zeros((rows_out, width_out, cout), jnp.float32)
    for ki in range(K):
        row_slab = x[ki:ki + rows_out]
        for kj in range(K):
            tap = row_slab[:, kj:kj + width_out]
            acc = acc + jax.lax.dot_general(
                tap.astype(cdt), w[ki, kj].astype(cdt),
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc


def fused_resblock(x, params, *, block_rows: int = 16, block_cols: int = 256,
                   compute_dtype=None):
    """out = x + conv2(relu(conv1(relu(x)))), both convs 3x3 SAME, channels
    preserved (the WarpNet ResBlock shape, models.py:771-794).

    x: [B, H, W, C]; params: {'Conv_0': {kernel, bias}, 'Conv_1': ...}.
    compute_dtype: dot-operand dtype (None = x.dtype); accumulation is
    always f32 and the output keeps x.dtype.

    Tiled over rows AND columns: the full-width (964-col) variant hangs
    this container's Mosaic helper, and 32x256 tiles exceed the 16 MiB
    scoped-VMEM stack limit (measured 17.32M); 16x256 fits. Overlap cost
    on the input tile is (br+4)(bc+4)/(br*bc) ~ 1.27x at 16x256.
    """
    B, H, W, C = x.shape
    w1 = params["Conv_0"]["kernel"]
    b1 = params["Conv_0"]["bias"]
    w2 = params["Conv_1"]["kernel"]
    b2 = params["Conv_1"]["bias"]
    assert w1.shape == (K, K, C, C) and w2.shape == (K, K, C, C), (
        w1.shape, w2.shape, x.shape)
    cdt = compute_dtype or x.dtype
    out_dt = x.dtype

    block_cols = min(block_cols, W)
    n_h = -(-H // block_rows)
    n_w = -(-W // block_cols)
    pad_h = n_h * block_rows - H
    pad_w = n_w * block_cols - W
    rows_in = block_rows + 2 * HALO
    cols_in = block_cols + 2 * HALO
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + pad_h), (HALO, HALO + pad_w),
                     (0, 0)))
    # [B, n_h, n_w, rows_in, cols_in, C] — static strided windows
    rows = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * block_rows, i * block_rows + rows_in,
                              axis=1) for i in range(n_h)], axis=1)
    tiles = jnp.stack(
        [jax.lax.slice_in_dim(rows, j * block_cols,
                              j * block_cols + cols_in, axis=3)
         for j in range(n_w)], axis=2)

    in_specs = [
        pl.BlockSpec((1, 1, 1, rows_in, cols_in, C),
                     lambda b, i, j: (b, i, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, K, C, C), lambda b, i, j: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, K, C, C), lambda b, i, j: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
    ]

    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        i = pl.program_id(1)
        j = pl.program_id(2)
        x_t = x_ref[0, 0, 0]
        h = _conv3_rows(jax.nn.relu(x_t), w1_ref[:],
                        rows_in - 2 * PAD, cols_in - 2 * PAD, cdt)
        h = jax.nn.relu(h + b1_ref[:])
        # re-zero intermediate positions outside the image (XLA's conv2
        # input is zero there via its own SAME padding). NB: 3-D iota — a
        # 2-D bool mask expanded via [..., None] hits Mosaic's "insertion
        # of minor dim that is not a no-op only supported for 32-bit
        # types" on i1 vectors.
        hr, hc = h.shape[0], h.shape[1]
        r = (i * block_rows - PAD
             + jax.lax.broadcasted_iota(jnp.int32, (hr, hc, 1), 0))
        c = (j * block_cols - PAD
             + jax.lax.broadcasted_iota(jnp.int32, (hr, hc, 1), 1))
        ok = (r >= 0) & (r < H) & (c >= 0) & (c < W)
        h = h * ok.astype(h.dtype)
        y = _conv3_rows(h, w2_ref[:], block_rows, block_cols, cdt) + b2_ref[:]
        o_ref[0] = (x_t[HALO:HALO + block_rows, HALO:HALO + block_cols]
                    .astype(jnp.float32) + y).astype(out_dt)

    out = pl.pallas_call(
        kernel,
        grid=(B, n_h, n_w),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_rows, block_cols, C),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_h * block_rows, n_w * block_cols, C), out_dt),
    )(tiles, w1, b1, w2, b2)
    return out[:, :H, :W]
