"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding (mesh/pjit/shard_map) is validated on host-simulated
devices — set env vars before anything imports jax.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform: unit
# tests need hermetic fp32 math and 8 virtual devices for sharding tests.
# The environment's sitecustomize registers the TPU backend at interpreter
# start and overrides JAX_PLATFORMS, so we must go through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Disable the persistent XLA compilation cache: train-CLI tests honor
# JAX_CACHE_DIR (train.py); jax's zstd cache codec has segfaulted twice
# under the full suite (once in the writer, once in the reader — even
# with a per-pid cache dir), and CPU test compiles are small enough that
# the cache buys nothing here.
os.environ["JAX_CACHE_DIR"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# This image's XLA-CPU backend executes fp32 matmuls at reduced precision by
# default (~1e-2 error on O(1) dots); parity tests need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# Fast/slow suite split (docs/testing.md): the default invocation excludes
# tests marked `slow` (pyproject addopts `-m "not slow"`), keeping
# `pytest -q` under ~5 minutes on this image; `pytest -m ""` runs
# everything. The list below is maintained from `pytest --durations=0`
# (tests whose call time exceeded ~9.5s on the 2026-08-17 full run).
# ---------------------------------------------------------------------------

_SLOW_NODES = [
    "test_convert.py::TestConvert::test_converted_params_run",
    "test_convert.py::TestConvert::test_tree_structure_matches_init",
    "test_convert_t2v.py::TestT2VConvert::test_converted_runs_finite",
    "test_convert_t2v.py::TestT2VConvert::test_structure_matches_init",
    "test_e2e_integration.py",
    "test_entry_points.py::TestSampleEntry::test_sample_main_cfg_classcond",
    "test_entry_points.py::TestSampleEntry::test_sample_main_host_loop_matches_scan",
    "test_entry_points.py::TestSampleEntry::test_sample_main_latents",
    "test_entry_points.py::TestSampleEntry::test_sample_many",
    "test_eval.py::TestMetricsEndToEnd::test_sample_many_generator_to_fvd",
    "test_models.py::TestFlashAttention::test_gradients_match",
    "test_models.py::TestFlashAttention::test_pallas_backward_matches_xla_backward",
    "test_models.py::TestLatte::test_cfg_halves_equal_and_scale",
    "test_models.py::TestLatte::test_forward_shape_learned_sigma",
    "test_models.py::TestLatteIMG::test_eval_video_only",
    "test_models.py::TestLatteIMG::test_joint_forward_train",
    "test_models.py::TestLatteIMGText::test_joint_text_conditioning",
    "test_models.py::TestModelOptions::test_bf16_compute",
    "test_models.py::TestModelOptions::test_gradient_checkpointing_grads",
    "test_models.py::TestModelOptions::test_remat_policy_dots_grads",
    "test_models.py::TestModelOptions::test_unroll_blocks_matches_scan",
    "test_persistence_gradfix.py::TestFixedSpatial::test_only_temporal_attention_updates",
    "test_persistence_gradfix.py::TestGradfix::test_second_order_grid_sample",
    "test_pipeline.py::TestPipelinedLatte",
    "test_pipeline.py::TestPipelinedLatteText",
    "test_pipeline.py::TestPipelinedLatteIMG",
    "test_pipeline.py::TestPipelinedT2V",
    "test_pipeline.py::TestPipelinedTrainStep",
    "test_pipeline_t2v.py::TestLattePipeline::test_stochastic_scheduler_gets_rng",
    "test_pipeline_t2v.py::TestPipelinedServing",
    "test_sample_t2x.py::TestSampleT2X::test_t2v_smoke_pipeline_parallel",
    "test_quant.py::TestQuantizedModel::test_latte_img_parity",
    "test_quant.py::TestQuantizedModel::test_model_parity",
    "test_quant.py::TestQuantizedModel::test_t2v_parity",
    "test_reference_model_parity.py::TestReferenceLatteIMGParity::test_joint_forward_parity",
    "test_reference_model_parity.py::TestReferenceLatteT2VParity::test_t2v_forward_parity_with_caption_mask",
    "test_reference_model_parity.py::TestReferenceModelParity::test_forward_latte_s_width",
    "test_reference_model_parity.py::TestReferenceModelParity::test_forward_xl_block_pair",
    "test_ring_attention.py::TestRingAttention::test_model_ring_mode_matches_xla",
    "test_ring_attention.py::TestRingAttention::test_t2v_ring_mode_matches_xla",
    "test_sample_t2x.py::TestSampleT2X::test_t2v_smoke",
    "test_sample_t2x.py::TestSampleT2X::test_t2v_smoke_quantized",
    "test_t2v.py::TestChunkedFeedForward::test_chunked_ff_equivalence",
    "test_t2v.py::TestLatteT2V::test_joint_image_training",
    "test_t2v.py::TestLatteT2V::test_mask_changes_output",
    "test_t2v.py::TestLatteT2V::test_masked_tokens_ignored",
    "test_t2v.py::TestT2VOptions::test_gradient_checkpointing_matches_plain",
    "test_temporal_decoder.py::TestTemporalDecoder::test_decode_shapes",
    "test_tp_sharding.py::TestTPSharding::test_tp_matches_replicated_numerics",
    "test_tp_sharding.py::TestZero1::test_opt_state_sharded_training_step",
    "test_train_dist.py::TestFSDP",
    "test_train_dist.py::TestGraftEntry",
    "test_train_dist.py::TestSequenceParallel",
    "test_train_dist.py::TestTrainStep::test_ema_tracks_params",
    "test_train_dist.py::TestTrainStep::test_grad_clip_deferred",
    "test_train_dist.py::TestTrainStep::test_loss_decreases",
    "test_train_loop.py",
    "test_trainer_api.py",
    "test_temporal_decoder.py::TestTemporalDecoder::test_temporal_mixing_active",
    "test_t2v.py::TestLatteT2V::test_temporal_attentions_disabled",
    "test_t2v.py::TestLatteT2V::test_video_length_flexibility",
    "test_t2v.py::TestLatteT2V::test_forward_shapes",
    "test_models.py::TestLatte::test_frame_count_flexibility",
    "test_models.py::TestLatte::test_zero_init_output",
    "test_models.py::TestLatte::test_class_conditional",
    "test_models.py::TestLatte::test_text_embedding_path",
    "test_tp_sharding.py::TestTPSharding::test_rules_shard_block_weights_only",
    "test_pipeline_t2v.py::TestLattePipeline::test_single_frame_image_path",
]


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_NODES):
            item.add_marker(pytest.mark.slow)
