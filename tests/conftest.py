"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
code paths are exercised without TPU hardware.

Note: the axon TPU plugin (sitecustomize) forces ``jax_platforms=axon,cpu``
via ``jax.config.update`` at interpreter start, so setting the env var is not
enough — we must override the config after importing jax and before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Quick tier: the full suite is ~35 min on this 1-core box; `-m "not slow"`
# keeps it under ~10 min for inner-loop runs (full suite before committing).
# Tests measured >=15 s (pytest --durations, virtual 8-device CPU mesh) are
# marked slow here at collection so the list lives in one place.
_SLOW_TESTS = {
    "test_segmented_cache_generate_matches_unsegmented",
    "test_fused_batch_generate_matches_unfused",
    "test_train_amt_cli_parallel_sp",
    "test_amt_pp_step_v2_flagship_matches_microbatched_oracle",
    "test_fused_batch_step_logits_match_unfused",
    "test_amt_pp_step_trains",
    "test_train_amt_cli_parallel_pp",
    "test_fused_monolith_step_logits_match_unfused",
    "test_fused_ends_step_logits_match_unfused",
    "test_amt_pp_step_matches_plain_step",
    "test_fused_step_logits_match_unfused",
    "test_variant_step_logits_match_unfused",
    "test_variant_generate_matches_unfused",
    "test_train_amt_loop",
    "test_generate_batch_sharded_over_data_mesh",
    "test_auto_resume_from_latest_snapshot",
    "test_fused_int8_step_matches_fake_quant_oracle",
    "test_chunked_extraction_matches_monolithic",
    "test_maxvit_tiny_forward",
    "test_sharded_train_step_matches_single_device",
    "test_wire_bf16_batch_matches_in_graph_cast",
    "test_fused_stack_step_logits_match_unfused",
    "test_tensor_parallel_train_step_matches_single_device",
    "test_dynamic_batcher_mixes_temperatures",
    "test_traced_temperature_matches_static",
    "test_sequence_parallel_train_step_matches_single_device",
    "test_params_only_resume_warns_about_lr_restart",
    "test_video_requests_batch_through_shared_extraction",
    "test_dynamic_batcher_coalesces",
    "test_moe_balance_bias_updates",
    "test_amt_train_mode_runs",
    "test_remat_attention_matches",
    "test_generate_batch_matches_seeded_shapes",
    "test_generate_respects_constraints",
    "test_int8_generate_runs_unfused_fake_quant",
    "test_cached_decode_matches_full_forward",
    "test_capacity_dispatch_drops_overflow",
    "test_train_amt_writes_tensorboard",
    "test_train_eval_roundtrip_improves",
    "test_train_eval_roundtrip_detects_flipped_loss",
    "test_variant_int8_step_matches_fake_quant_oracle",
    "test_variant_int8_generate_matches_unfused_fake_quant",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >=15 s on the CI box; excluded by -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            seen.add(base)
            item.add_marker(pytest.mark.slow)
    # Guard against silent rot from renames: on a full-suite collection
    # every listed name must still exist (partial runs — a single file or
    # -k filter — legitimately match only a subset, so skip the check).
    stale = _SLOW_TESTS - seen
    if stale and len(items) > 250:
        raise pytest.UsageError(
            "tests/conftest.py _SLOW_TESTS lists tests that no longer "
            f"exist (renamed?): {sorted(stale)}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
