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


# ---------------------------------------------------------------------------
# fast/slow test tiers (VERDICT r02 weak #9): the full suite is ~75 min on
# this CPU backend; `pytest -m "not slow"` is the ~10-min gate. Assignment is
# from measured durations (>20 s in the round-3 full run).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

SLOW_MODULES = {
    "test_training", "test_eval_families", "test_end_to_end",
    "test_stream_demo", "test_multihost_spawn",
}
SLOW_TESTS = {
    "test_graft_entry_dryrun_multichip", "test_scaling_efficiency_harness",
    "test_sharded_train_step_matches_single_device", "test_lsvc_gradients",
    "test_gop_scan_training_gradients_flow", "test_dvc_real_bitstream_roundtrip",
    "test_wavefront_frame_sharding_matches_unsharded",
    "test_lsvc_real_bitstream_roundtrip", "test_graft_entry_single",
    "test_lsvc_decode_matches_eval_forward",
    "test_fused_mebasic_matches_xla_interior",
    "test_mcvc_real_bitstream_roundtrip", "test_gop_scan_runs_and_chains_state",
    "test_ssf_real_bitstream_roundtrip", "test_bidirectional_gop_window",
    "test_elfvc_sp_real_bitstream_roundtrip",
    "test_ssf_hyperprior_context_model", "test_rlvc_real_bitstream_roundtrip",
    "test_mcvc_ctx_context_entropy", "test_mcvc_ia_forward_with_failures",
    "test_tiled_warp_differentiable",
    "test_lsvc_forward_tiled_warp_mode_matches_gather",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::")[0].rsplit("/", 1)[-1]
        mod = mod[:-3] if mod.endswith(".py") else mod
        name = item.name.split("[")[0]
        if mod in SLOW_MODULES or name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
