"""Worker process for the two-process jax.distributed CPU test
(test_multihost_spawn.py). Not a pytest module.

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
mesh. Verifies the multi-host design of fvc.dist.multihost end to end:
distributed init, global mesh, host-local -> global array assembly, a
cross-process collective reduction, GOP work partitioning, and metric
all-gather (SURVEY §4 implication: multi-host tests runnable on CPU).
"""

import os
import sys


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fvc.dist.multihost import (
        allgather_metrics, global_mesh, initialize, shard_gops_across_hosts,
    )

    initialize(f"127.0.0.1:{port}", num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    mesh = global_mesh()
    assert mesh.shape["data"] == 4

    # Each host contributes its LOCAL shard of a global ['data']-sharded
    # array; the jitted global sum needs a cross-process reduction.
    local = (np.arange(2, dtype=np.float32) + 10.0 * process_id)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))
    total = jax.jit(
        lambda a: a.sum(),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
    # the result is replicated over the global mesh; every process reads its
    # local replica (device_get on a non-fully-addressable Array raises)
    total = float(np.asarray(total.addressable_data(0)))
    assert total == 22.0, total  # (0+1) + (10+11)

    # Embarrassingly-parallel eval partition + metric merge.
    gops = shard_gops_across_hosts(6)
    assert gops == [process_id, process_id + 2, process_id + 4], gops
    merged = allgather_metrics([float(g) for g in gops])
    assert sorted(merged.tolist()) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0], merged

    print(f"MULTIHOST_OK {process_id} total={total}", flush=True)


if __name__ == "__main__":
    main()
