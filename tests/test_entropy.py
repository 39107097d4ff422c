"""Entropy-layer tests: the reference's two invariants (entropy_models.py:380-459)
— (1) decode(encode(x)) reproduces the quantized latent exactly, and
(2) actual rANS bits track the estimated bits — plus unit checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def test_bitparm_cdf_monotone_and_bounded():
    from fvc.entropy import BitEstimator

    be = BitEstimator(4)
    xs = jnp.linspace(-30, 30, 61)[:, None, None, None] * jnp.ones((1, 1, 1, 4))
    params = be.init(jax.random.PRNGKey(0), xs)
    cdf = np.asarray(be.apply(params, xs))
    assert (cdf >= 0).all() and (cdf <= 1).all()
    assert (np.diff(cdf[:, 0, 0, 0]) >= -1e-6).all()  # monotone in x


def test_entropy_bottleneck_roundtrip_real_coding():
    from fvc.entropy import EntropyBottleneck, RansCoder
    from fvc.entropy.coder import encode_factorized, decode_factorized

    C = 8
    eb = EntropyBottleneck(C)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, C).astype(np.float32) * 2.0)
    variables = eb.init(jax.random.PRNGKey(0), x, training=False)

    cdf, cdf_len, offset = eb.cdf_tables(variables)
    coder = RansCoder(cdf, cdf_len, offset)
    medians = np.asarray(variables["params"]["quantiles"])[:, 0, 1]

    data = encode_factorized(np.asarray(x), medians, coder)
    decoded = decode_factorized(data, x.shape, medians, coder)

    x_hat, likelihood = eb.apply(variables, x, training=False)
    np.testing.assert_allclose(decoded, np.asarray(x_hat), atol=1e-5)

    # actual bits vs estimated bits: same order of magnitude even untrained
    est_bits = float(jnp.sum(-jnp.log2(likelihood)))
    act_bits = len(data) * 8
    assert act_bits < est_bits * 1.5 + 512
    assert est_bits < act_bits * 1.5 + 512


def test_gaussian_conditional_roundtrip_real_coding():
    from fvc.entropy import RansCoder, build_indexes, gaussian_cdf_tables
    from fvc.entropy.coder import encode_gaussian, decode_gaussian
    from fvc.ops.math import gaussian_interval_likelihood

    rng = np.random.RandomState(1)
    sigma = np.exp(rng.uniform(np.log(0.2), np.log(8.0), (2, 16, 16, 4))).astype(np.float32)
    mu = rng.randn(2, 16, 16, 4).astype(np.float32)
    y = (mu + sigma * rng.randn(2, 16, 16, 4)).astype(np.float32)

    cdf, cdf_len, offset = gaussian_cdf_tables()
    coder = RansCoder(cdf, cdf_len, offset)
    indexes = np.asarray(build_indexes(jnp.asarray(sigma)))

    data = encode_gaussian(y, indexes, mu, coder)
    decoded = decode_gaussian(data, indexes, mu, coder)
    np.testing.assert_allclose(decoded, np.round(y - mu) + mu, atol=1e-5)

    # bits_act within 10% + overhead of the (true-sigma) estimate
    p = np.asarray(gaussian_interval_likelihood(
        jnp.asarray(np.round(y - mu) + mu), jnp.asarray(sigma), jnp.asarray(mu)))
    est = float(np.sum(-np.log2(p)))
    act = len(data) * 8
    assert abs(act - est) < 0.1 * est + 256, (act, est)


def test_build_indexes_against_table():
    from fvc.entropy import build_indexes, scale_table

    table = scale_table()
    sigma = jnp.asarray([0.01, 0.11, 0.2, 1.0, 100.0, 256.0, 999.0])
    idx = np.asarray(build_indexes(sigma))
    # each sigma must be <= table[idx] and > table[idx-1]
    # (values above the table max clamp to the last index)
    s = np.clip(np.asarray(sigma), 0.11, table[-1])
    assert (s <= table[idx] + 1e-6).all()
    assert (idx == 0).all() or (s[idx > 0] > table[idx[idx > 0] - 1] - 1e-6).all()


def test_mean_scale_hyperprior_shapes():
    from fvc.entropy import MeanScaleHyperprior

    m = MeanScaleHyperprior(channels=32)
    y = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    variables = m.init(jax.random.PRNGKey(1), y, training=False)
    y_hat, lk = m.apply(variables, y, training=False)
    assert y_hat.shape == y.shape
    assert lk["y"].shape == y.shape and lk["z"].shape == y.shape
    # eval-mode y_hat is round(y - mu) + mu
    np.testing.assert_allclose(
        np.asarray(y_hat), np.round(np.asarray(y - lk["mu"])) + np.asarray(lk["mu"]),
        atol=1e-5)


def test_ssf_hyperprior_super_precision():
    from fvc.entropy import SSFHyperprior

    m = SSFHyperprior(planes=16, super_prec=True, sp_active=False)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16))
    variables = m.init(jax.random.PRNGKey(1), y, None, training=False)
    y_hat, lk, q_prior = m.apply(variables, y, None, training=False)
    assert y_hat.shape == y.shape
    assert lk["pred_err_y"] is not None and lk["Q_err_y"] is not None
    assert q_prior.shape == y.shape  # rounded latent chained to next frame


def test_rpm_scale_constants():
    from fvc.entropy import rpm_scale

    s = np.asarray(rpm_scale(jnp.asarray([-20.0, 0.0, 2.0])))
    np.testing.assert_allclose(s, [np.exp(-7.0) / 10, 0.1, np.exp(2.0) / 10], rtol=1e-6)


def test_entropy_bottleneck_trains_toward_true_entropy():
    """Mini version of the reference convergence harness
    (entropy_models.py:380-459): estimated bpp should drop toward the true
    entropy of an iid Gaussian source."""
    import optax
    from fvc.entropy import EntropyBottleneck

    C, sigma_true = 4, 3.0
    eb = EntropyBottleneck(C)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 16, 16, C)) * sigma_true
    variables = eb.init(key, x0, training=False)
    params = variables["params"]

    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            x = jax.random.normal(rng, (4, 16, 16, C)) * sigma_true
            _, lk = eb.apply({"params": p}, x, training=True, rng=rng)
            bits = jnp.mean(-jnp.log2(lk))
            aux = eb.apply({"params": p}, method=EntropyBottleneck.aux_loss)
            return bits + 1e-3 * aux, bits
        (loss, bits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, bits

    bits_first = None
    for i in range(300):
        params, opt_state, bits = step(params, opt_state, jax.random.PRNGKey(i))
        if bits_first is None:
            bits_first = float(bits)
    bits_last = float(bits)
    # true differential entropy of N(0,3) quantized at 1 ~ 3.6 bits
    assert bits_last < bits_first
    assert bits_last < 4.6, bits_last


def test_ssf_hyperprior_context_model():
    """'-CTX' ContextVP wiring: the causal context refines only the coding
    distribution — symbols / reconstruction identical to the base hyperprior,
    likelihoods valid, gradients flow into the context transformer."""
    import jax
    import jax.numpy as jnp

    from fvc.entropy.hyperprior import SSFHyperprior

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))

    base = SSFHyperprior(planes=32)
    ctx = SSFHyperprior(planes=32, use_context=True, context_views=2)
    pb = base.init(jax.random.PRNGKey(0), y, training=False)
    pc = ctx.init(jax.random.PRNGKey(0), y, training=False)
    # graft the shared (non-context) params so the two models agree
    pc2 = jax.tree_util.tree_map(lambda x: x, pc)
    for k in pb["params"]:
        pc2["params"][k] = pb["params"][k]

    yb, lkb, _ = base.apply(pb, y, training=False)
    yc, lkc, _ = ctx.apply(pc2, y, training=False)
    # reconstruction path unchanged (context touches only the likelihood)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yc), atol=1e-6)
    assert np.isfinite(np.asarray(lkc["y"])).all()
    assert float(jnp.min(lkc["y"])) > 0

    # gradient reaches the context transformer
    def loss(p):
        _, lk, _ = ctx.apply(p, y, training=True, rng=jax.random.PRNGKey(1))
        return -jnp.sum(jnp.log(lk["y"]))

    g = jax.grad(loss)(pc2)
    gnorm = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(g["params"]["context_model"]))
    assert np.isfinite(gnorm) and gnorm > 0
