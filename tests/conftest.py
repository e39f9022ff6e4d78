"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices — the standard JAX trick for
exercising multi-chip ``Mesh`` code without a pod (SURVEY.md §4): the same
sharded programs compile and execute against the fake devices.  Must run before
anything imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Parity tests compare against float64-free torch references; keep matmuls exact.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" via
# jax.config.update, which overrides the JAX_PLATFORMS env var — override it
# back before any backend initializes so tests run on the 8 virtual CPU devices.
# VITS_TPU_TESTS=1 keeps the real chip for tests/test_tpu_compiled.py.
if not os.environ.get("VITS_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables_per_module():
    """Unload XLA executables between test modules (vm.max_map_count guard).

    jax caches every jitted executable for the life of the process, and each
    LLVM-JIT'd XLA CPU executable holds several anonymous mappings (code +
    rodata + data).  A full single-process suite run accumulates >65k maps —
    the default ``vm.max_map_count`` — after which LLVM's next code-page
    mmap fails mid-compile and the process SIGSEGVs (observed
    deterministically at the first /stream compile of test_server, ~73%
    through the suite, with ~10k executable-map triples live at 44%;
    neither half of the suite alone reproduces it).  Clearing jax's caches
    at module teardown unmaps dead executables; live objects (session
    fixtures holding Synthesizers etc.) simply re-trace on next use.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()  # promptly drop executables that just lost their last ref


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_hf_model():
    """A small random HF VitsModel used as the numerical oracle.

    Mirrors the reference's test strategy of diffing against HF activations
    (/root/reference/scripts/verify_layers.py) but with a self-contained random
    model (the repo's .ggml artifacts are LFS pointers; no network in CI).
    """
    import torch
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel

    torch.manual_seed(0)
    cfg = HFVitsConfig(
        vocab_size=38,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        window_size=4,
        ffn_dim=64,
        ffn_kernel_size=3,
        flow_size=16,
        spectrogram_bins=65,
        upsample_initial_channel=32,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        prior_encoder_num_flows=2,
        prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=2,
        duration_predictor_num_flows=2,
        duration_predictor_flow_bins=6,
        depth_separable_num_layers=2,
        duration_predictor_filter_channels=32,
    )
    model = VitsModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="session")
def tiny_bundle(tiny_hf_model):
    """(config, params) converted from the tiny HF model."""
    from vits_tpu.io.loader import load_hf_module

    config, _, params = load_hf_module(tiny_hf_model, keep_training=True)
    return config, params
