"""Posterior encoder q(z | spectrogram) — training-only module.

The reference never runs this (inference-only engine); it exists in the HF
state_dict (``posterior_encoder.*``) and is required for the VITS training
objective, so the TPU framework implements it: 1x1 conv in, 16-layer WaveNet,
1x1 conv to (mean, log_stddev), reparameterized sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.models.flow import wavenet
from vits_tpu.ops.conv import conv1d


def posterior_encoder(
    params: ParamView,
    config: VitsConfig,
    spectrogram: jax.Array,  # (B, T, spectrogram_bins) linear spectrogram
    padding_mask: jax.Array,  # (B, T, 1)
    noise: jax.Array,  # (B, T, flow_size) standard normal
    global_conditioning: jax.Array | None = None,
):
    """Returns (sampled_latents, mean, log_stddev), each (B, T, flow_size)."""
    p = params.sub("posterior_encoder")
    h = conv1d(spectrogram, p["conv_pre.weight"], p["conv_pre.bias"]) * padding_mask
    h = wavenet(
        p.sub("wavenet"),
        config,
        h,
        padding_mask,
        config.posterior_encoder_num_wavenet_layers,
        global_conditioning,
    )
    stats = conv1d(h, p["conv_proj.weight"], p["conv_proj.bias"]) * padding_mask
    mean = stats[..., : config.flow_size]
    log_stddev = stats[..., config.flow_size :]
    sampled = (mean + noise * jnp.exp(log_stddev)) * padding_mask
    return sampled, mean, log_stddev
