"""End-to-end slice tests: DVC/RLVC P-frame coding over a GOP via lax.scan."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fvc.core.config import CodecConfig


def _frames(T=4, B=1, H=64, W=64, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.rand(B, H, W, 3).astype(np.float32)
    frames = [base]
    for t in range(1, T):
        shifted = np.roll(frames[-1], shift=2, axis=2)
        frames.append(np.clip(shifted + 0.01 * rng.randn(B, H, W, 3), 0, 1).astype(np.float32))
    return jnp.asarray(np.stack(frames))


@pytest.mark.parametrize("name", ["DVC", "RLVC", "RLVC2"])
def test_single_pframe_forward(name):
    from fvc.models.dvc import IterPredCodec

    cfg = CodecConfig.from_name(name, channels=32)
    model = IterPredCodec(cfg)
    frames = _frames(T=2)
    state = model.init_state(1, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), frames[0], frames[1], state,
                           False, training=False)
    recon, new_state, out = model.apply(
        variables, frames[0], frames[1], state, False, training=False)
    assert recon.shape == (1, 64, 64, 3)
    assert np.isfinite(float(out["bpp_est"]))
    assert float(out["bpp_est"]) > 0
    assert np.isfinite(float(out["psnr"]))


def test_gop_scan_runs_and_chains_state():
    from fvc.gop.engine import code_gop_scan
    from fvc.models.dvc import IterPredCodec

    cfg = CodecConfig.from_name("RLVC", channels=16)
    model = IterPredCodec(cfg)
    frames = _frames(T=5, H=64, W=64)
    state = model.init_state(1, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), frames[0], frames[1], state,
                           False, training=False)

    def apply_fn(params, x_ref, x_cur, st, rpm_flag, *, training, rng):
        return model.apply(params, x_ref, x_cur, st, rpm_flag,
                           training=training, rng=rng)

    recons, outs = code_gop_scan(apply_fn, variables, frames, state, training=False)
    assert recons.shape == (4, 1, 64, 64, 3)
    assert outs["bpp_est"].shape == (4,)
    assert np.isfinite(np.asarray(outs["psnr"])).all()


def test_gop_scan_training_gradients_flow():
    from fvc.gop.engine import code_gop_scan
    from fvc.models.dvc import IterPredCodec

    cfg = CodecConfig.from_name("DVC", channels=16)
    model = IterPredCodec(cfg)
    frames = _frames(T=3, H=64, W=64)
    state = model.init_state(1, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), frames[0], frames[1], state,
                           False, training=True, rng=jax.random.PRNGKey(1))

    def loss_fn(params):
        def apply_fn(p, x_ref, x_cur, st, rpm_flag, *, training, rng):
            return model.apply(p, x_ref, x_cur, st, rpm_flag,
                               training=training, rng=rng)
        _, outs = code_gop_scan(apply_fn, params, frames, state,
                                training=True, rng=jax.random.PRNGKey(2))
        return jnp.mean(cfg.rate_lambda * outs["img_loss"] + outs["bpp_est"])

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert np.isfinite(gnorm) and gnorm > 0


def test_iframe_codec():
    from fvc.models.iframe import IFrameCodec

    # SSF-style stack downsamples 16x (transforms) + 8x (hyper): H,W % 128 == 0
    m = IFrameCodec(planes=32)
    x = _frames(T=1, H=128, W=128)[0]
    variables = m.init(jax.random.PRNGKey(0), x, training=False)
    x_hat, out = m.apply(variables, x, training=False)
    assert x_hat.shape == x.shape
    assert float(out["bpp_est"]) > 0


def test_bidirectional_gop_window():
    """RLVC GOP-13-style window: I-frame mid-GOP, forward + reversed-backward
    halves, display-order outputs."""
    from fvc.gop.engine import code_gop_bidirectional
    from fvc.models.dvc import IterPredCodec

    cfg = CodecConfig.from_name("RLVC", channels=16)
    model = IterPredCodec(cfg)
    T = 7  # fP = bP = 3
    frames = _frames(T=T, H=64, W=64)
    state = model.init_state(1, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), frames[0], frames[1], state,
                           False, training=False)

    def apply_fn(params, x_ref, x_cur, st, flag, *, training, rng):
        return model.apply(params, x_ref, x_cur, st, flag,
                           training=training, rng=rng)

    recons, outs = code_gop_bidirectional(
        apply_fn, variables, frames, state, training=False)
    assert recons.shape == (T - 1, 1, 64, 64, 3)
    assert outs["bpp_est"].shape == (T - 1,)
    assert np.isfinite(np.asarray(outs["psnr"])).all()
