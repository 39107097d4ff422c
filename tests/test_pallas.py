"""Pallas kernel numerics vs XLA fallbacks (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _interpret(monkeypatch):
    """Force interpret mode so kernels run on the CPU test platform."""
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_gdn_pallas_matches_xla():
    from fvc.ops.pallas_kernels import gdn_pallas
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    C = 128
    x = jnp.asarray(rng.randn(2, 8, 8, C).astype(np.float32))
    gamma = jnp.asarray((0.1 * np.eye(C) + 0.01 * rng.rand(C, C)).astype(np.float32))
    beta = jnp.asarray((1.0 + 0.1 * rng.rand(C)).astype(np.float32))

    ref = x / jnp.sqrt(jnp.square(x) @ gamma + beta)
    with pltpu.force_tpu_interpret_mode():
        out = gdn_pallas(x, gamma, beta, block=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    ref_i = x * jnp.sqrt(jnp.square(x) @ gamma + beta)
    with pltpu.force_tpu_interpret_mode():
        out_i = gdn_pallas(x, gamma, beta, inverse=True, block=64)
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i), atol=1e-5)


def test_rate_bits_pallas_matches_reference_math():
    from fvc.ops.pallas_kernels import rate_bits_pallas
    from fvc.ops.math import bits_from_likelihood, laplace_interval_likelihood
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(1)
    x = jnp.asarray(np.round(rng.randn(4, 16, 16, 32) * 3).astype(np.float32))
    sigma = jnp.asarray(np.exp(rng.uniform(-2, 2, (4, 16, 16, 32))).astype(np.float32))

    ref = bits_from_likelihood(laplace_interval_likelihood(x, sigma))
    with pltpu.force_tpu_interpret_mode():
        out = rate_bits_pallas(x, sigma, block=64)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-4)


def test_fused_mebasic_matches_xla_interior():
    """Fused 5-conv SpyNet level: interior numerics exact vs the XLA path.
    Borders differ by design (valid-conv over one padded input vs per-layer
    zero re-padding) within a 15px frame — documented in pallas_spynet."""
    import flax
    from jax.experimental.pallas import tpu as pltpu
    from fvc.ops.spynet import MEBasic
    from fvc.ops.pallas_spynet import fused_mebasic

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 48, 40, 8).astype(np.float32))
    m = MEBasic()
    variables = m.init(jax.random.PRNGKey(0), x)
    p = flax.core.unfreeze(variables)["params"]
    p["Conv_4"]["kernel"] = jnp.asarray(
        rng.randn(7, 7, 16, 2).astype(np.float32) * 0.05)
    ref = m.apply({"params": p}, x)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mebasic(x, p, block_rows=16)
    assert out.shape == ref.shape
    err = np.abs(np.asarray(out - ref))
    assert err[:, 15:-15, 15:-15].max() < 1e-5


def test_fused_mebasic_tiles_exact_everywhere():
    """The affine-BlockSpec variant (materialized overlapping tiles — the
    one that LOWERS on this container's Mosaic, unlike the manual-DMA
    kernel) masks halo intermediates to zero outside the image, so it is
    exact vs the XLA path INCLUDING borders."""
    import flax
    from jax.experimental.pallas import tpu as pltpu
    from fvc.ops.spynet import MEBasic
    from fvc.ops.pallas_spynet import fused_mebasic_tiles

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 40, 48, 8).astype(np.float32))
    m = MEBasic()
    variables = m.init(jax.random.PRNGKey(0), x)
    p = flax.core.unfreeze(variables)["params"]
    for name in p:  # randomize every layer incl. the zero-init head
        p[name]["kernel"] = jnp.asarray(
            rng.randn(*p[name]["kernel"].shape).astype(np.float32) * 0.05)
    ref = m.apply({"params": p}, x)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mebasic_tiles(x, p, block_rows=16)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_conv3x3_pallas_matches_xla():
    """Direct 3x3 stride-1 conv kernel (fvc.ops.pallas_conv): 9 shifted MXU
    matmuls over DMA'd halo slabs must match the XLA conv, including the
    row/col tile seams and non-multiple H/W."""
    from fvc.ops.pallas_conv import conv3x3_pallas

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 21, 27, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 16, 32).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    got = conv3x3_pallas(x, w, b, tile_h=4, tile_w=16, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    assert got.shape == ref.shape
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fused_resblock_exact_everywhere():
    """Fused WarpNet ResBlock (fvc.ops.pallas_warpnet): two 3x3 convs + the
    residual add in one kernel; the intermediate's outside-image halo is
    re-zeroed, so the result is exact vs the XLA ResBlock INCLUDING borders
    and non-multiple H."""
    import flax
    from jax.experimental.pallas import tpu as pltpu
    from fvc.ops.blocks import ResBlock
    from fvc.ops.pallas_warpnet import fused_resblock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 37, 41, 64).astype(np.float32))
    m = ResBlock(64)
    variables = m.init(jax.random.PRNGKey(0), x)
    p = flax.core.unfreeze(variables)["params"]
    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.1), p)
    ref = m.apply({"params": p}, x)
    with pltpu.force_tpu_interpret_mode():
        out = fused_resblock(x, p, block_rows=16)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
