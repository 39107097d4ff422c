"""LSVC tree codec tests: graphs, batched tree forward, variants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fvc.core.config import CodecConfig


def test_graphs_match_reference_structure():
    from fvc.gop.graphs import generate_graph, graph_from_batch, ref_index_from_graph

    g, layers, parents = generate_graph("4layers")
    # 14 P-frames over 3 layers, parents consistent with children lists
    assert sorted(sum(layers, [])) == list(range(1, 15))
    for p, kids in g.items():
        for k in kids:
            assert parents[k] == p

    # batch-size graph selection (models.py:923-940)
    for bs, expected_layers in [(2, 1), (6, 2), (14, 3), (30, 4), (15, 4)]:
        _, layers, _ = graph_from_batch(bs)
        assert len(layers) == expected_layers, bs

    g, _, _ = graph_from_batch(6)
    ref = ref_index_from_graph(g, 6)
    assert ref == [0, 1, 1, 0, 4, 4]  # 3layers tree

    # linear chain: each frame references the previous
    g, _, _ = graph_from_batch(6, linear=True)
    assert ref_index_from_graph(g, 6) == [0, 1, 2, 3, 4, 5]
    # one-hop: all reference the I-frame
    g, _, _ = graph_from_batch(6, onehop=True)
    assert ref_index_from_graph(g, 6) == [0] * 6


@pytest.mark.parametrize("name,gop", [("LSVC", 6), ("LSVC-L", 4), ("LSVC-O", 4)])
def test_lsvc_forward(name, gop):
    from fvc.models.lsvc import LSVC

    cfg = CodecConfig.from_name(name)
    model = LSVC(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(gop + 1, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    com, out = model.apply(variables, x, training=False)
    assert com.shape == (gop, 64, 64, 3)
    for k in ("rec_loss", "warp_loss", "mc_loss", "bpp_res", "bpp_mv", "psnr"):
        assert np.isfinite(float(out[k])), k
    assert float(out["bpp_est"]) > 0
    assert out["psnr_list"].shape == (gop,)


def test_lsvc_gradients():
    from fvc.models.lsvc import LSVC

    cfg = CodecConfig.from_name("LSVC")
    model = LSVC(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(5, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, training=True,
                           rng=jax.random.PRNGKey(1))

    def loss_fn(v):
        _, out = model.apply(v, x, training=True, rng=jax.random.PRNGKey(2))
        return cfg.rate_lambda * out["rec_loss"] + out["bpp_est"]

    loss, grads = jax.value_and_grad(loss_fn)(variables)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_space_time_attention_stack():
    from fvc.models.st_attention import SpaceTimeAttentionStack

    m = SpaceTimeAttentionStack(dim=32, depth=2, heads=2, dim_head=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 4, 4, 32))
    variables = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_context_vp_causality():
    """ContextVP's output at token t must not depend on tokens >= t
    (shift-token causal contract, super_precision.py:421-424)."""
    from fvc.models.context_vp import ContextVP

    m = ContextVP(in_channels=8, out_channels=8, num_views=2, width=4, height=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))  # (b v)=2, v=2
    variables = m.init(jax.random.PRNGKey(1), x)
    y0 = m.apply(variables, x)
    # perturb the LAST token; outputs for all earlier tokens must be unchanged
    x2 = x.at[-1, -1, -1].add(10.0)
    y1 = m.apply(variables, x2)
    d = np.abs(np.asarray(y0) - np.asarray(y1)).reshape(-1, 8)
    assert d[:-1].max() < 1e-5   # all tokens before the perturbed one
    assert y0.shape == (2, 4, 4, 8)
