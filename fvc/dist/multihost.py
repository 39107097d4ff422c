"""Multi-host orchestration: jax.distributed init + GOP sharding across hosts.

The reference is single-node (SURVEY §2.5: no NCCL/MPI anywhere); this module
is the TPU-native scale-out design:

- training: every host feeds its local shard of the GOP batch; the pjit train
  step (fvc.train.step) runs one SPMD program over the global mesh — gradient
  all-reduce rides ICI within a slice and DCN across hosts automatically.
- evaluation: GOPs are embarrassingly parallel; `shard_gops_across_hosts`
  partitions the work list per process and `allgather_metrics` merges scalars.

On a single process this degrades to identity, so the module is exercised by
the CPU test harness too.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks; no-op when single-host
    and no coordinator is configured."""
    coordinator_address = coordinator_address or os.environ.get("FVC_COORD")
    if coordinator_address is None:
        return
    # `is not None`, not `or`: an explicit process_id=0 must win over a
    # stray FVC_PROC_ID in the environment (0 is falsy).
    if num_processes is None:
        num_processes = int(os.environ.get("FVC_NPROC", "1"))
    if process_id is None:
        process_id = int(os.environ.get("FVC_PROC_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(n_spatial: int = 1):
    """Mesh over ALL devices of all hosts: ('data', 'spatial'). Within-host
    chips are contiguous on the data axis so DP gradient reduction stays on
    ICI where possible."""
    from fvc.dist.mesh import make_mesh
    return make_mesh(n_data=len(jax.devices()) // n_spatial,
                     n_spatial=n_spatial)


def shard_gops_across_hosts(num_gops: int,
                            process_index: Optional[int] = None,
                            process_count: Optional[int] = None) -> List[int]:
    """Static round-robin partition of GOP indexes for multi-host eval."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [i for i in range(num_gops) if i % pc == pi]


def allgather_metrics(local: Sequence[float]) -> np.ndarray:
    """Merge per-host scalar lists into the global array (single-host: copy).
    Uses jax.experimental.multihost_utils when multiple processes exist."""
    if jax.process_count() == 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(local))).reshape(-1)
