"""Spatially-sharded warping with halo exchange.

New design required by the north star (SURVEY §2.5: "SP/CP = spatial tile
sharding of 1080p frames with halo exchange for flow/warp — no reference
precedent"). Frames are sharded along H over the mesh's 'spatial' axis. Plain
convolutions shard for free (XLA inserts halos); the bilinear gather in
flow_warp is the op XLA cannot tile, because flow displacement is unbounded.

Strategy (SURVEY §7 "Tiled warping halo size"): clamp the vertical flow
component to a static halo radius R (horizontal stays unbounded — W is never
sharded), then run the warp inside `shard_map`: each device `ppermute`s its
top/bottom R rows to its neighbors, concatenates [halo_up | local | halo_down],
and gathers locally. Matches the unsharded `flow_warp` exactly whenever
|flow_y| <= R (codec flows at 1080p are rarely > a few dozen pixels; training
with clamped flow keeps encoder/decoder consistent since the clamp is part of
the model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fvc.ops.warp import _bilinear_gather


def flow_warp_tiled(img: jax.Array, flow: jax.Array, *, mesh: Mesh,
                    halo: int = 64, axis_name: str = "spatial") -> jax.Array:
    """img: [B, H, W, C], flow: [B, H, W, 2]; H sharded over `axis_name`.

    Returns the warped image, H-sharded the same way. Vertical flow is clamped
    to ±halo. Top/bottom halo rows ride one bidirectional ppermute each.
    """
    n_shards = mesh.shape[axis_name]
    if n_shards == 1:
        from fvc.ops.warp import flow_warp
        return flow_warp(img, jnp.concatenate(
            [flow[..., :1], jnp.clip(flow[..., 1:2], -halo, halo)], axis=-1),
            method="gather")

    H = img.shape[1]
    assert H % n_shards == 0, (H, n_shards)
    local_h = H // n_shards
    # at coarse pyramid levels (SpyNet warps at H/2..H/8) a shard may be
    # shorter than the requested halo; one neighbor shard is the maximum
    # reachable halo anyway, so clamp (flow clamp below tightens with it)
    halo = min(halo, local_h)

    def _local(img_l, flow_l):
        # img_l/flow_l: local shards [B, local_h, W, C/2]
        idx = jax.lax.axis_index(axis_name)
        up = [(i, (i + 1) % n_shards) for i in range(n_shards)]      # send down
        down = [(i, (i - 1) % n_shards) for i in range(n_shards)]    # send up

        # neighbor halos: my bottom rows go to the shard below (its top halo)
        bottom_rows = img_l[:, -halo:]
        top_rows = img_l[:, :halo]
        halo_from_above = jax.lax.ppermute(bottom_rows, axis_name, up)
        halo_from_below = jax.lax.ppermute(top_rows, axis_name, down)
        # boundary shards: border padding == clamp, so replicate edge rows
        first = jax.lax.axis_index(axis_name) == 0
        last = jax.lax.axis_index(axis_name) == n_shards - 1
        halo_from_above = jnp.where(
            first, jnp.repeat(img_l[:, :1], halo, axis=1), halo_from_above)
        halo_from_below = jnp.where(
            last, jnp.repeat(img_l[:, -1:], halo, axis=1), halo_from_below)

        ext = jnp.concatenate([halo_from_above, img_l, halo_from_below], axis=1)

        B, _, W, C = img_l.shape
        j = jnp.arange(W, dtype=flow_l.dtype)[None, None, :]
        i_local = jnp.arange(local_h, dtype=flow_l.dtype)[None, :, None]
        i_global = i_local + idx.astype(flow_l.dtype) * local_h
        u = flow_l[..., 0]
        v = jnp.clip(flow_l[..., 1], -float(halo), float(halo))
        # global grid_sample(align_corners=False) pixel positions
        px = (j + u) * (W / (W - 1.0)) - 0.5
        py = (i_global + v) * (H / (H - 1.0)) - 0.5
        # global border clamp, then into extended-local coordinates
        py = jnp.clip(py, 0.0, H - 1.0)
        py_ext = py - (idx.astype(flow_l.dtype) * local_h - halo)
        py_ext = jnp.clip(py_ext, 0.0, local_h + 2 * halo - 1.0)
        return _bilinear_gather(ext, py_ext, px)

    shard = jax.shard_map(
        _local, mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None))
    return shard(img, flow)
