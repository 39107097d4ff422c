"""Test harness: force JAX onto CPU with 8 virtual devices so multi-chip
sharding paths compile and run without TPU hardware (SURVEY §4 implication).

Note: the environment's axon site hook sets jax_platforms="axon,cpu" via
jax.config at interpreter start, which routes every op through the (slow,
single-chip) TPU tunnel; tests override it back to pure CPU here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, jax.devices()
