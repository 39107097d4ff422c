"""Per-stage microbenchmarks — the reference's E-FL/E-MV/E-MC/E-RES/D-*
meter taxonomy (models.py:81-86) measured as separately-jitted device programs,
plus a jax.profiler trace hook.

On TPU, async dispatch makes naive per-call timing lie; each stage is timed by
running a data-dependent chain of `iters` applications and dividing (the same
methodology as bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


def _chain_time(fn, x, iters: int = 8) -> float:
    """Seconds per call, measured over a serialized chain ended by a tiny D2H
    fetch (through the device tunnel block_until_ready alone can return before
    the computation retires; a host fetch of a dependent scalar cannot)."""
    y = fn(x)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(y)[0])[0])  # 4-byte sync
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        out = fn(cur)
        # serialize: mix a scalar of the output back into the next input
        probe = jax.tree_util.tree_leaves(out)[0]
        cur = cur + 0.0 * jnp.mean(probe)
    _ = float(jnp.ravel(cur)[0])  # 4-byte sync fetch
    return (time.perf_counter() - t0) / iters


def lsvc_stage_times(model, variables, x, iters: int = 8) -> Dict[str, float]:
    """x: [GOP+1, H, W, 3]. Returns stage -> seconds (reference meter names)."""
    from fvc.gop.graphs import graph_from_batch, ref_index_from_graph

    bs = x.shape[0] - 1
    g, _, _ = graph_from_batch(bs)
    ref_index = ref_index_from_graph(g, bs)
    target = x[1:]
    refs = x[jnp.asarray(ref_index)]

    flow_fn = jax.jit(lambda t: model.apply(
        variables, t, refs, method=lambda m, a, b: m.optic_flow(a, b)))
    flow = flow_fn(target)

    mv_enc = jax.jit(lambda f: model.apply(
        variables, f, method=lambda m, y: m.mv_encoder(y)))
    mv_lat = jnp.round(mv_enc(flow))
    mv_dec = jax.jit(lambda l: model.apply(
        variables, l, method=lambda m, y: m.mv_decoder(y)))
    mv_hat = mv_dec(mv_lat)

    from fvc.ops.warp import flow_warp
    warped = flow_warp(refs, mv_hat)
    mc_in = jnp.concatenate([warped, refs], axis=-1)
    mc_fn = jax.jit(lambda z: model.apply(
        variables, z, method=lambda m, y: m.warpnet(y)))

    res = target - warped
    res_enc = jax.jit(lambda r: model.apply(
        variables, r, method=lambda m, y: m.res_encoder(y)))
    feat = jnp.round(res_enc(res))
    res_dec = jax.jit(lambda f: model.apply(
        variables, f, method=lambda m, y: m.res_decoder(y)))

    return {
        "E-FL": _chain_time(flow_fn, target, iters),
        "E-MV": _chain_time(mv_enc, flow, iters),
        "D-MV": _chain_time(mv_dec, mv_lat, iters),
        "E-MC": _chain_time(mc_fn, mc_in, iters),
        "D-MC": _chain_time(mc_fn, mc_in, iters),
        "E-RES": _chain_time(res_enc, res, iters),
        "D-RES": _chain_time(res_dec, feat, iters),
    }


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/fvc_profile"):
    """jax.profiler trace context — the TPU replacement for the reference's
    perf_counter meters (SURVEY §5 'Tracing/profiling')."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
