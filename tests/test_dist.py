"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp


def test_mesh_construction():
    from fvc.dist.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["spatial"] == 1
    mesh2 = make_mesh(n_data=4, n_spatial=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["spatial"] == 2


def test_graft_entry_single():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    com, bpp, psnr = jax.jit(fn)(*args)
    assert com.shape == (6, 64, 64, 3)
    assert np.isfinite(float(bpp)) and np.isfinite(float(psnr))


def test_graft_entry_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_train_step_matches_single_device():
    """DP-sharded LSVC train step must produce the same loss as unsharded."""
    from fvc.dist.mesh import make_mesh, frames_spec, replicated
    from fvc.models.registry import get_codec_model
    from fvc.train.step import lsvc_loss_fn, make_optimizer, make_train_step

    model, cfg = get_codec_model("LSVC")
    B, gop, H, W = 2, 2, 64, 64
    frames = jnp.asarray(
        np.random.RandomState(0).rand(B, gop + 1, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames[0], training=True,
                           rng=jax.random.PRNGKey(1))
    optimizer = make_optimizer(1e-4)
    loss_fn = lsvc_loss_fn(model, cfg)

    # single device
    step1 = make_train_step(loss_fn, optimizer, donate=False)
    _, _, m1 = step1(variables, optimizer.init(variables), frames,
                     jax.random.PRNGKey(2))

    # 2-device data parallel
    mesh = make_mesh(n_data=2, n_spatial=1, devices=jax.devices()[:2])
    step2 = make_train_step(loss_fn, optimizer, mesh=mesh, donate=False)
    fr = jax.device_put(frames, frames_spec(mesh))
    va = jax.device_put(variables, replicated(mesh))
    op = jax.device_put(optimizer.init(variables), replicated(mesh))
    _, _, m2 = step2(va, op, fr, jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)


def test_wavefront_frame_sharding_matches_unsharded():
    """LSVC tree forward with the FRAME axis sharded over 'data' (wavefront
    parallelism, SURVEY §2.5) must reproduce the unsharded forward."""
    from fvc.dist.mesh import make_mesh, replicated, wavefront_spec
    from fvc.models.registry import get_codec_model

    model, _ = get_codec_model("LSVC")
    gop, H, W = 3, 64, 64  # gop+1 = 4 frames over the 2-device 'data' axis
    x = jnp.asarray(
        np.random.RandomState(3).rand(gop + 1, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    com_ref, out_ref = model.apply(variables, x, training=False)

    mesh = make_mesh(n_data=2, n_spatial=1, devices=jax.devices()[:2])
    fwd = jax.jit(lambda v, xx: model.apply(v, xx, training=False),
                  in_shardings=(replicated(mesh), wavefront_spec(mesh)))
    com_wf, out_wf = fwd(jax.device_put(variables, replicated(mesh)),
                         jax.device_put(x, wavefront_spec(mesh)))

    np.testing.assert_allclose(np.asarray(com_wf), np.asarray(com_ref),
                               atol=1e-5)
    np.testing.assert_allclose(float(out_wf["bpp_est"]),
                               float(out_ref["bpp_est"]), rtol=1e-5)


def test_multihost_helpers_single_process():
    from fvc.dist.multihost import (
        allgather_metrics, initialize, shard_gops_across_hosts,
    )

    initialize()  # no coordinator -> no-op
    assert shard_gops_across_hosts(10, process_index=0, process_count=1) == list(range(10))
    assert shard_gops_across_hosts(10, process_index=1, process_count=4) == [1, 5, 9]
    # all indexes covered exactly once across processes
    cover = sorted(sum((shard_gops_across_hosts(10, i, 3) for i in range(3)), []))
    assert cover == list(range(10))
    out = allgather_metrics([1.0, 2.0])
    np.testing.assert_allclose(out, [1.0, 2.0])


def test_scaling_efficiency_harness():
    """Weak-scaling measurement on the virtual CPU mesh: the harness runs and
    reports efficiency; virtual-device numbers measure SPMD orchestration (the
    identical program scales over real ICI in production)."""
    from fvc.bench.scaling import measure_scaling

    results = measure_scaling([1, 2, 4], gop=2, height=64, width=64, iters=2)
    assert set(results) == {1, 2, 4}
    for n, r in results.items():
        assert r["sec_per_step"] > 0
        assert np.isfinite(r["efficiency"])
    assert abs(results[1]["efficiency"] - 1.0) < 1e-6
