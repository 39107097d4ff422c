"""Pallas TPU direct convolution for the codec's dominant conv shapes.

`conv3x3_pallas`: stride-1 3x3 SAME conv, NHWC, as 9 shifted MXU matmuls
accumulated in VMEM — no im2col materialization, no XLA space-to-batch
copies. Targets the transform stacks' hot stride-1 shapes (MV
analysis/synthesis 128ch layers, WarpNet 64ch ResBlocks), where XLA's conv
emitter measures ~25-33% MXU utilization (docs/ROUND1_NOTES.md, "Conv MXU
utilization by channel width").

Design: the padded input stays in HBM; each grid step (batch b, row-tile r,
col-tile c) DMAs its (tile_h+2, tile_w+8)-halo slab into a VMEM scratch
(overlapping slabs cannot be expressed with BlockSpec index maps, which
offset in block-size units; the +8 keeps the DMA width sublane-aligned),
then accumulates 9 [tile_h*tile_w, C] @ [C, F] tap matmuls into an f32
scratch. Tap shifts are value-level slices (sublane-dim memref slices must
be 8-aligned on TPU; value slices relayout via sublane/lane rotates).

Fallback: fvc.ops.conv.conv2d (XLA). Numerics: bf16 operands, f32
accumulation — the same contract as conv2d under the bf16 policy.

Measured (v5e, [6,320,480,128]->128, bf16, chained in-program iters): XLA
conv 50.6 TFLOP/s; this kernel 46-49 TFLOP/s across tile_h 8/16/32 — AT
PARITY, so the transform stacks keep the XLA conv (no wiring). Beating the
emitter would need double-buffered halo DMA + an in-VMEM patch matrix to
amortize the per-tap relayout rotates; kept as infrastructure for that
follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_kernel(x_hbm, w_ref, b_ref, o_ref, acc_ref, *, tile_h: int,
                    tile_w: int, F: int):
    b = pl.program_id(0)
    r = pl.program_id(1)
    c = pl.program_id(2)
    C = x_hbm.shape[-1]

    def inner(slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r * tile_h, tile_h + 2),
                     pl.ds(c * tile_w, tile_w + 8)],
            slab, sem)
        dma.start()
        dma.wait()
        v = slab[...]
        acc_ref[...] = jnp.zeros_like(acc_ref)
        for t in range(9):
            dy, dx = t // 3, t % 3
            patch = jax.lax.slice(
                v, (dy, dx, 0), (dy + tile_h, dx + tile_w, C))
            acc_ref[...] += jax.lax.dot_general(
                patch.reshape(tile_h * tile_w, C), w_ref[t],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[...] = (acc_ref[...].reshape(tile_h, tile_w, F)
                      + b_ref[...]).astype(o_ref.dtype)[None]

    pl.run_scoped(
        inner,
        pltpu.VMEM((tile_h + 2, tile_w + 8, C), x_hbm.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


def conv3x3_pallas(x: jax.Array, w: jax.Array, b: jax.Array | None = None,
                   *, tile_h: int = 8, tile_w: int = 240,
                   interpret: bool = False) -> jax.Array:
    """x: [B,H,W,C]; w: [3,3,C,F] (HWIO); b: [F] or None. SAME padding,
    stride 1. Output [B,H,W,F] in x.dtype, f32 accumulation. tile_w must be
    a multiple of 8 (DMA slab alignment)."""
    B, H, W, C = x.shape
    F = w.shape[-1]
    tile_w = min(tile_w, ((W + 7) // 8) * 8)
    assert tile_w % 8 == 0, tile_w
    pad_h = (-H) % tile_h
    pad_w = (-W) % tile_w
    Hp, Wp = H + pad_h, W + pad_w
    # 1-px conv halo on the left; right side carries the conv halo, the
    # tile remainder, and the +6 DMA alignment slack
    xp = jnp.pad(x, ((0, 0), (1, 1 + pad_h), (1, 7 + pad_w), (0, 0)))
    wt = w.reshape(9, C, F).astype(x.dtype)
    bias = jnp.zeros((F,), jnp.float32) if b is None else b.astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_conv3x3_kernel, tile_h=tile_h, tile_w=tile_w, F=F),
        grid=(B, Hp // tile_h, Wp // tile_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # HBM; manual halo DMA
            pl.BlockSpec((9, C, F), lambda bi, ri, ci: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F,), lambda bi, ri, ci: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, tile_w, F), lambda bi, ri, ci: (bi, ri, ci, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, F), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h * tile_w, F), jnp.float32)],
        interpret=interpret,
    )(xp, wt, bias)
    return out[:, :H, :W]
