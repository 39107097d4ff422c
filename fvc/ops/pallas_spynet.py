"""Fused MEBasic kernel — one SpyNet pyramid level's 5-conv (7x7) stack as a
single Pallas program.

Why: SpyNet is ~39% of LSVC encode time (fvc.bench.stages); its tiny-channel
(8->32->64->32->16->2) full-resolution convs are HBM-bandwidth-bound when run
as 5 separate XLA convs (each intermediate makes an HBM round trip:
B*H*W*64ch*4B per layer at full res). This kernel keeps every intermediate in
VMEM: the grid tiles over rows; each step loads one input tile with a 15-row /
15-column halo (5 layers x kernel-3 halo each) and runs all five convolutions
in-register, writing only the 2-channel flow delta back to HBM.

Convolution-in-Pallas strategy: per layer, accumulate over the 7 kernel rows;
each row term is an im2col-over-columns matmul
    [rows*W, 7*Cin] @ [7*Cin, Cout]
so the MXU sees contraction depths 56..448 instead of 8..64.

The XLA path (fvc.ops.spynet.MEBasic) remains the default and the autodiff
path; this kernel is the inference fast path (enable via
`fused_mebasic(...)`), numerics-checked against it in tests.

STATUS: interpret-mode validated (interior exact to 6e-7 vs XLA;
tests/test_pallas.py). This container's remote Mosaic compile helper crashes /
hangs on the 245-matmul unrolled program (HTTP 500 from tpu_compile_helper),
so on-hardware validation is deferred to an environment with a standard
toolchain; treat as experimental until then.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 7
PAD = K // 2          # per-layer halo
LAYERS = 5
HALO = PAD * LAYERS   # total halo: 15 rows/cols each side
CHANNELS = (8, 32, 64, 32, 16, 2)


def _conv7_rows(x, w, rows_out, width_out):
    """x: [rows_in, cols_in, Cin] (rows_in = rows_out+6, cols_in = width_out+6)
    w: [7, 7, Cin, Cout]. Valid conv -> [rows_out, width_out, Cout].
    Accumulates over kernel rows; columns fold into the contraction."""
    cin = x.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((rows_out * width_out, cout), jnp.float32)
    for ki in range(K):
        # accumulate the 49 taps as [rows*W, Cin] @ [Cin, Cout] matmuls:
        # materializing a 7x-im2col patch would exceed VMEM at full width.
        # static slices only — dynamic_slice has no Pallas TC lowering.
        row_slab = x[ki:ki + rows_out]
        for kj in range(K):
            tap = row_slab[:, kj:kj + width_out].reshape(
                rows_out * width_out, cin)
            acc = acc + jnp.dot(tap, w[ki, kj],
                                preferred_element_type=jnp.float32)
    return acc.reshape(rows_out, width_out, cout)


def _mebasic_kernel(x_hbm, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, o_ref,
                    *, block_rows: int, width: int):
    """x_hbm: full padded input resident in HBM/ANY; each grid step DMAs its
    overlapping (block_rows + 2*HALO)-row tile into VMEM scratch (BlockSpecs
    cannot express overlapping windows)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows_in = block_rows + 2 * HALO

    def body(tile, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(i * block_rows, rows_in)], tile, sem)
        dma.start()
        dma.wait()
        x = tile[:]
        h = _conv7_rows(x, w1[:], rows_in - 2 * PAD, width + 2 * HALO - 2 * PAD)
        h = jax.nn.relu(h + b1[:])
        h = _conv7_rows(h, w2[:], rows_in - 4 * PAD, width + 2 * HALO - 4 * PAD)
        h = jax.nn.relu(h + b2[:])
        h = _conv7_rows(h, w3[:], rows_in - 6 * PAD, width + 2 * HALO - 6 * PAD)
        h = jax.nn.relu(h + b3[:])
        h = _conv7_rows(h, w4[:], rows_in - 8 * PAD, width + 2 * HALO - 8 * PAD)
        h = jax.nn.relu(h + b4[:])
        h = _conv7_rows(h, w5[:], block_rows, width)
        o_ref[0] = h + b5[:]

    pl.run_scoped(
        body,
        pltpu.VMEM((rows_in, width + 2 * HALO, CHANNELS[0]), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


def fused_mebasic_tiles(x, params, *, block_rows: int = 16):
    """Variant of `fused_mebasic` with XLA-side materialized overlapping row
    tiles and affine BlockSpecs only — no manual DMA, no dynamic memref
    slicing (the `.at[b, pl.ds(...)]` HBM slice in `fused_mebasic` hits a
    Mosaic memref_slice lowering bug with dynamic offsets on this
    container's toolchain).

    The overlap costs (block_rows + 2*HALO)/block_rows extra HBM traffic on
    the 8-channel INPUT only (~2.9x at block_rows=16); every intermediate
    (32/64-channel) still stays in VMEM, which is where the XLA path pays
    5 full-res HBM round trips. x: [B, H, W, 8] -> [B, H, W, 2].

    EXACT vs the XLA path everywhere, including borders: XLA's SAME convs
    zero-pad every LAYER's input, so after each in-kernel conv the halo
    positions that fall outside the image are masked back to zero before
    the next layer consumes them (without this, halo intermediates hold
    relu(bias)-contaminated values and the outer 15 px of flow deltas
    diverge — the round-3 kernel had exactly that caveat)."""
    B, H, W, C = x.shape
    assert C == CHANNELS[0], x.shape
    n_blocks = -(-H // block_rows)
    pad_h = n_blocks * block_rows - H
    rows_in = block_rows + 2 * HALO
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + pad_h), (HALO, HALO), (0, 0)))
    xp = xp.astype(jnp.float32)
    # [B, n_blocks, rows_in, W+2*HALO, 8] — static strided row windows
    tiles = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * block_rows, i * block_rows + rows_in,
                              axis=1) for i in range(n_blocks)], axis=1)

    ws = []
    in_specs = [pl.BlockSpec((1, 1, rows_in, W + 2 * HALO, CHANNELS[0]),
                             lambda b, i: (b, i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    for i in range(LAYERS):
        cin, cout = CHANNELS[i], CHANNELS[i + 1]
        ws.append(params[f"Conv_{i}"]["kernel"].astype(jnp.float32))
        ws.append(params[f"Conv_{i}"]["bias"].astype(jnp.float32))
        in_specs.append(pl.BlockSpec((K, K, cin, cout),
                                     lambda b, i: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((cout,), lambda b, i: (0,),
                                     memory_space=pltpu.VMEM))

    def kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, o_ref):
        i = pl.program_id(1)

        def mask_outside(h, layer):
            # zero positions outside the image so the next conv sees the
            # zeros XLA's per-layer SAME padding would have given it.
            # 3-D iota: expanding a 2-D i1 mask via [..., None] hits
            # Mosaic's "insertion of minor dim only supported for 32-bit
            # types" (the round-4 'HTTP 500 on any non-trivial kernel'
            # had THIS as a co-trigger, not just program size).
            rows, cols = h.shape[0], h.shape[1]
            g_row0 = i * block_rows - HALO + layer * PAD
            r = g_row0 + jax.lax.broadcasted_iota(
                jnp.int32, (rows, cols, 1), 0)
            c = (-HALO + layer * PAD
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, cols, 1), 1))
            ok = ((r >= 0) & (r < H) & (c >= 0) & (c < W))
            return h * ok.astype(h.dtype)

        x_t = x_ref[0, 0]
        h = _conv7_rows(x_t, w1[:], rows_in - 2 * PAD,
                        W + 2 * HALO - 2 * PAD)
        h = mask_outside(jax.nn.relu(h + b1[:]), 1)
        h = _conv7_rows(h, w2[:], rows_in - 4 * PAD, W + 2 * HALO - 4 * PAD)
        h = mask_outside(jax.nn.relu(h + b2[:]), 2)
        h = _conv7_rows(h, w3[:], rows_in - 6 * PAD, W + 2 * HALO - 6 * PAD)
        h = mask_outside(jax.nn.relu(h + b3[:]), 3)
        h = _conv7_rows(h, w4[:], rows_in - 8 * PAD, W + 2 * HALO - 8 * PAD)
        h = mask_outside(jax.nn.relu(h + b4[:]), 4)
        h = _conv7_rows(h, w5[:], block_rows, W)
        o_ref[0] = h + b5[:]

    out = pl.pallas_call(
        kernel,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_rows, W, CHANNELS[-1]),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks * block_rows, W, CHANNELS[-1]), jnp.float32),
    )(tiles, *ws)
    return out[:, :H]


def fused_mebasic(x, params, *, block_rows: int = 16):
    """x: [B, H, W, 8]; params: MEBasic param pytree
    ({'Conv_0': {'kernel','bias'}, ...}). Returns [B, H, W, 2].
    SAME padding applied once up front (edge zeros like the XLA path)."""
    B, H, W, C = x.shape
    assert C == CHANNELS[0], x.shape
    n_blocks = -(-H // block_rows)
    pad_h = n_blocks * block_rows - H
    xp = jnp.pad(x, ((0, 0), (HALO, HALO + pad_h), (HALO, HALO), (0, 0)))
    xp = xp.astype(jnp.float32)

    ws = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for i in range(LAYERS):
        cin, cout = CHANNELS[i], CHANNELS[i + 1]
        ws.append(params[f"Conv_{i}"]["kernel"].astype(jnp.float32))
        ws.append(params[f"Conv_{i}"]["bias"].astype(jnp.float32))
        in_specs.append(pl.BlockSpec((K, K, cin, cout),
                                     lambda b, i: (0, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((cout,), lambda b, i: (0,),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_mebasic_kernel, block_rows=block_rows, width=W),
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_rows, W, CHANNELS[-1]),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, n_blocks * block_rows, W, CHANNELS[-1]), jnp.float32),
    )(xp, *ws)
    return out[:, :H]
