"""Scaling-efficiency harness: throughput of the pjit LSVC train step at 1
device vs an N-device data-parallel mesh (BASELINE.json config #5; north-star
>= 80% efficiency to 2 hosts).

Efficiency = (throughput_N / throughput_1) / N with the global batch scaled
with N (weak scaling — the production regime: more devices, more GOPs).

Runs on any device set: the real TPU slice in production, or the virtual
8-device CPU mesh in tests (which measures the orchestration overhead, not
ICI, but exercises the identical SPMD program).
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fvc.core.config import CodecConfig
from fvc.dist.mesh import frames_spec, make_mesh, replicated
from fvc.train.step import lsvc_loss_fn, make_optimizer, make_train_step


def measure_scaling(n_devices_list: Sequence[int], *, gop: int = 2,
                    height: int = 64, width: int = 64, iters: int = 3,
                    devices: Optional[Sequence] = None) -> dict:
    from fvc.models.registry import get_codec_model

    devices = list(devices if devices is not None else jax.devices())
    model, cfg = get_codec_model("LSVC")
    optimizer = make_optimizer(1e-4)
    loss_fn = lsvc_loss_fn(model, cfg)

    frames1 = jnp.asarray(
        np.random.RandomState(0).rand(1, gop + 1, height, width, 3)
        .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), frames1[0], training=True,
                           rng=jax.random.PRNGKey(1))
    opt_state = optimizer.init(variables)

    results = {}
    for n in n_devices_list:
        mesh = make_mesh(n_data=n, n_spatial=1, devices=devices[:n])
        step = make_train_step(loss_fn, optimizer, mesh=mesh, donate=False)
        frames = jnp.tile(frames1, (n, 1, 1, 1, 1))
        frames = jax.device_put(frames, frames_spec(mesh))
        v = jax.device_put(variables, replicated(mesh))
        o = jax.device_put(opt_state, replicated(mesh))
        # warmup/compile
        v2, o2, m = step(v, o, frames, jax.random.PRNGKey(2))
        _ = float(m["loss"])
        t0 = time.perf_counter()
        for i in range(iters):
            v2, o2, m = step(v2, o2, frames, jax.random.PRNGKey(3 + i))
        _ = float(m["loss"])  # dependent sync
        dt = (time.perf_counter() - t0) / iters
        results[n] = {"sec_per_step": dt, "gops_per_sec": n / dt}

    base = results[min(n_devices_list)]["gops_per_sec"] / min(n_devices_list)
    for n, r in results.items():
        r["efficiency"] = r["gops_per_sec"] / (base * n)
    return results
