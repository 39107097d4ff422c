"""Halo-exchange tiled warp vs the unsharded reference warp."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P, NamedSharding


def test_tiled_warp_matches_unsharded():
    from fvc.dist.mesh import make_mesh
    from fvc.dist.tiled_warp import flow_warp_tiled
    from fvc.ops.warp import flow_warp

    mesh = make_mesh(n_data=1, n_spatial=4, devices=jax.devices()[:4])
    B, H, W, C = 2, 64, 48, 3
    halo = 8
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    flow = jnp.asarray((rng.rand(B, H, W, 2) - 0.5).astype(np.float32) * 12)
    # clamp vertical flow exactly as the tiled path will
    flow_ref = jnp.concatenate(
        [flow[..., :1], jnp.clip(flow[..., 1:2], -halo, halo)], axis=-1)

    expected = np.asarray(flow_warp(img, flow_ref, method="gather"))

    sharding = NamedSharding(mesh, P(None, "spatial", None, None))
    img_s = jax.device_put(img, sharding)
    flow_s = jax.device_put(flow, sharding)
    out = flow_warp_tiled(img_s, flow_s, mesh=mesh, halo=halo)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_tiled_warp_single_shard_fallback():
    from fvc.dist.mesh import make_mesh
    from fvc.dist.tiled_warp import flow_warp_tiled
    from fvc.ops.warp import flow_warp

    mesh = make_mesh(n_data=8, n_spatial=1)
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 32, 32, 2) - 0.5).astype(np.float32) * 4)
    out = flow_warp_tiled(img, flow, mesh=mesh, halo=8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(flow_warp(img, flow, method="gather")),
        atol=1e-6)


def test_tiled_warp_differentiable():
    """SP training needs gradients through the halo-exchange warp."""
    from fvc.dist.mesh import make_mesh
    from fvc.dist.tiled_warp import flow_warp_tiled

    mesh = make_mesh(n_data=1, n_spatial=2, devices=jax.devices()[:2])
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 32, 16, 3).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 32, 16, 2).astype(np.float32) - 0.5) * 4)

    def loss(flow):
        out = flow_warp_tiled(img, flow, mesh=mesh, halo=4)
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(flow)
    assert g.shape == flow.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_lsvc_forward_tiled_warp_mode_matches_gather():
    """Model-level SP: the whole LSVC tree forward under warp_method('tiled')
    (every SpyNet/MC warp runs the halo-exchange shard_map path, H sharded
    over 'spatial') must match the unsharded gather forward. Fresh-init
    SpyNet emits (near-)zero flow, so the tiled path's flow clamp is
    inactive and agreement is tight."""
    from fvc.dist.mesh import make_mesh
    from fvc.models.registry import get_codec_model
    from fvc.ops.warp import warp_method

    mesh = make_mesh(n_data=1, n_spatial=2, devices=jax.devices()[:2])
    model, cfg = get_codec_model("LSVC")
    gop, H, W = 2, 64, 64
    x = jnp.asarray(np.random.RandomState(0).rand(
        gop + 1, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)

    with warp_method("gather"):
        com_ref, out_ref = model.apply(variables, x, training=False)

    sspec = NamedSharding(mesh, P(None, "spatial", None, None))
    with warp_method("tiled", mesh=mesh, halo=16):
        fwd = jax.jit(lambda v, xx: model.apply(v, xx, training=False),
                      in_shardings=(None, sspec))
        com_t, out_t = fwd(variables, jax.device_put(x, sspec))

    np.testing.assert_allclose(np.asarray(com_t), np.asarray(com_ref),
                               atol=2e-4)
    assert abs(float(out_t["bpp_est"]) - float(out_ref["bpp_est"])) < 1e-3
