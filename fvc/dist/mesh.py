"""Device mesh and sharding policy.

TPU-native parallelism map (SURVEY §2.5) replacing the reference's
DataParallel / .cuda(k) hops:

- 'data'    axis: GOPs / frame-batches / multiview batches (DP). Gradients
            all-reduce over ICI via jit's automatic psum.
- 'spatial' axis: H-dimension sharding of frames (SP/CP). XLA inserts halo
            exchanges for convolutions automatically; gathers (warping) may
            all-gather the reference frame — acceptable at 1080p tile counts.
- view/tree parallelism reuse 'data' (views and tree-layer batches are batch
  dims in this framework).

`make_mesh` builds a Mesh over the available devices; `shard_frames` returns
NamedSharding specs for the canonical [B, T, H, W, C] video batch layout.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    assert n_data * n_spatial <= len(devices), (n_data, n_spatial, len(devices))
    dev = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(dev, ("data", "spatial"))


def frames_spec(mesh: Mesh, *, batched: bool = True, spatial: bool = True):
    """PartitionSpec for [B, T, H, W, C] (batched) or [T, H, W, C]."""
    sp = "spatial" if (spatial and mesh.shape["spatial"] > 1) else None
    if batched:
        return NamedSharding(mesh, P("data", None, sp, None, None))
    return NamedSharding(mesh, P(None, sp, None, None))


def wavefront_spec(mesh: Mesh):
    """PartitionSpec for the un-batched LSVC tree forward input [T, H, W, C]
    with the FRAME axis sharded over 'data' — wavefront (tree-layer)
    parallelism (SURVEY §2.5): frames within a tree layer are the batch dim
    of that layer's convs/flow/warp, so sharding the frame axis spreads each
    layer's batched compute across chips; the parent-frame gathers between
    layers (models.py:1370 semantics) lower to XLA collectives over ICI."""
    return NamedSharding(mesh, P("data", None, None, None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arr, spec=None):
    return jax.device_put(arr, spec or frames_spec(mesh))
