"""Duration predictors: stochastic (normalizing-flow) and deterministic.

Rebuild of the reference's stochastic duration predictor graph
(/root/reference/src/vits.cpp:646-972): conv_pre -> dilated depth-separable
conv stack -> conv_proj conditioning, then a reverse pass through
[ConvFlow x N, ElementwiseAffine] with channel flips between flows — plus the
forward (training) direction and the deterministic ``VitsDurationPredictor``
variant, neither of which the reference implements.

Layout: (batch, time, channels); channel flips are along the last axis.  Noise
is injected explicitly (a jax.random key or a recorded array) instead of the
reference's graph-build-time RNG (/root/reference/src/include/ggml-util.h:189-199).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.ops.conv import conv1d, depthwise_conv1d, layer_norm
from vits_tpu.ops.spline import unconstrained_rational_quadratic_spline


def dilated_depth_separable_conv(
    p: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, C)
    padding_mask: jax.Array,  # (B, T, 1)
    global_conditioning: jax.Array | None = None,
) -> jax.Array:
    """Depthwise-dilated + pointwise conv stack with LayerNorm/GELU
    (vits.cpp:646-692 / HF VitsDilatedDepthSeparableConv)."""
    kernel_size = config.duration_predictor_kernel_size
    if global_conditioning is not None:
        inputs = inputs + global_conditioning
    for i in range(config.depth_separable_num_layers):
        dilation = kernel_size**i
        padding = (kernel_size * dilation - dilation) // 2
        h = depthwise_conv1d(
            inputs * padding_mask,
            p[f"convs_dilated.{i}.weight"],
            p[f"convs_dilated.{i}.bias"],
            padding=padding,
            dilation=dilation,
        )
        h = layer_norm(h, p[f"norms_1.{i}.weight"], p[f"norms_1.{i}.bias"])
        h = jax.nn.gelu(h, approximate=False)
        h = conv1d(h, p[f"convs_pointwise.{i}.weight"], p[f"convs_pointwise.{i}.bias"])
        h = layer_norm(h, p[f"norms_2.{i}.weight"], p[f"norms_2.{i}.bias"])
        h = jax.nn.gelu(h, approximate=False)
        inputs = inputs + h
    return inputs * padding_mask


def conv_flow(
    p: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, depth_separable_channels)
    padding_mask: jax.Array,
    global_conditioning: jax.Array | None,
    reverse: bool,
):
    """Spline coupling flow (vits.cpp:855-899 / HF VitsConvFlow).

    Returns (outputs, log_determinant or None).
    """
    half = config.depth_separable_channels // 2
    num_bins = config.duration_predictor_flow_bins
    first_half = inputs[..., :half]
    second_half = inputs[..., half:]

    h = conv1d(first_half, p["conv_pre.weight"], p["conv_pre.bias"])
    h = dilated_depth_separable_conv(
        p.sub("conv_dds"), config, h, padding_mask, global_conditioning
    )
    h = conv1d(h, p["conv_proj.weight"], p["conv_proj.bias"]) * padding_mask

    batch, length = first_half.shape[0], first_half.shape[1]
    # (B, T, half*(3nb-1)) -> (B, T, half, 3nb-1); channel split order matches
    # HF's reshape(B, half, 3nb-1, T) on channels-first data.
    h = h.reshape(batch, length, half, num_bins * 3 - 1)
    scale = 1.0 / math.sqrt(config.hidden_size)
    unnormalized_widths = h[..., :num_bins] * scale
    unnormalized_heights = h[..., num_bins : 2 * num_bins] * scale
    unnormalized_derivatives = h[..., 2 * num_bins :]

    second_half, log_abs_det = unconstrained_rational_quadratic_spline(
        second_half,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        reverse=reverse,
        tail_bound=config.duration_predictor_tail_bound,
    )
    outputs = jnp.concatenate([first_half, second_half], axis=-1) * padding_mask
    if not reverse:
        return outputs, jnp.sum(log_abs_det * padding_mask, axis=(1, 2))
    return outputs, None


def elementwise_affine(
    p: ParamView,
    inputs: jax.Array,  # (B, T, C)
    padding_mask: jax.Array,
    reverse: bool,
):
    """(vits.cpp:901-925 / HF VitsElementwiseAffine); params stored (C, 1)."""
    translate = p["translate"][:, 0]
    log_scale = p["log_scale"][:, 0]
    if not reverse:
        outputs = (translate + jnp.exp(log_scale) * inputs) * padding_mask
        log_det = jnp.sum(log_scale[None, None, :] * padding_mask, axis=(1, 2))
        return outputs, log_det
    return (inputs - translate) * jnp.exp(-log_scale) * padding_mask, None


def stochastic_duration_predictor_reverse(
    params: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, hidden) — encoder output (stop-grad'ed by caller)
    padding_mask: jax.Array,  # (B, T, 1)
    noise: jax.Array,  # (B, T, 2) standard normal
    noise_scale: float | jax.Array,
    global_conditioning: jax.Array | None = None,
) -> jax.Array:
    """Sampling direction: noise -> log durations (B, T, 1).

    Mirrors vits.cpp:927-972 / HF SDP reverse branch, including the
    skip of flow index 1 ("remove a useless vflow").
    """
    p = params.sub("duration_predictor")
    h = conv1d(inputs, p["conv_pre.weight"], p["conv_pre.bias"])
    if global_conditioning is not None:
        h = h + conv1d(global_conditioning, p["cond.weight"], p["cond.bias"])
    h = dilated_depth_separable_conv(p.sub("conv_dds"), config, h, padding_mask)
    h = conv1d(h, p["conv_proj.weight"], p["conv_proj.bias"]) * padding_mask

    # Cast the (traced fp32) control scalar to the compute dtype: bf16 * f32
    # would promote the latents to f32 and break bf16-weight convs downstream.
    latents = noise * jnp.asarray(noise_scale, noise.dtype)
    # flows list is [EA (index 0), CF_1..CF_N]; reverse order, skipping index 1.
    flow_indices = [i for i in range(config.duration_predictor_num_flows, -1, -1) if i != 1]
    for i in flow_indices:
        latents = jnp.flip(latents, axis=-1)
        fp = p.sub(f"flows.{i}")
        if i == 0:
            latents, _ = elementwise_affine(fp, latents, padding_mask, reverse=True)
        else:
            latents, _ = conv_flow(
                fp, config, latents, padding_mask, h, reverse=True
            )
    log_duration = latents[..., :1]
    return log_duration


def stochastic_duration_predictor_nll(
    params: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, hidden)
    padding_mask: jax.Array,  # (B, T, 1)
    durations: jax.Array,  # (B, T, 1) target durations
    posterior_noise: jax.Array,  # (B, T, 2) standard normal
    global_conditioning: jax.Array | None = None,
) -> jax.Array:
    """Training direction: negative log-likelihood of target durations (B,).

    Direct JAX rebuild of the HF SDP forward branch (the reference has no
    training path at all).
    """
    p = params.sub("duration_predictor")
    h = conv1d(inputs, p["conv_pre.weight"], p["conv_pre.bias"])
    if global_conditioning is not None:
        h = h + conv1d(global_conditioning, p["cond.weight"], p["cond.bias"])
    h = dilated_depth_separable_conv(p.sub("conv_dds"), config, h, padding_mask)
    h = conv1d(h, p["conv_proj.weight"], p["conv_proj.bias"]) * padding_mask

    hd = conv1d(durations, p["post_conv_pre.weight"], p["post_conv_pre.bias"])
    hd = dilated_depth_separable_conv(p.sub("post_conv_dds"), config, hd, padding_mask)
    hd = conv1d(hd, p["post_conv_proj.weight"], p["post_conv_proj.bias"]) * padding_mask

    random_posterior = posterior_noise * padding_mask
    log_det_posterior = 0.0
    latents_posterior = random_posterior
    for i in range(config.duration_predictor_num_flows + 1):
        fp = p.sub(f"post_flows.{i}")
        if i == 0:
            latents_posterior, ld = elementwise_affine(
                fp, latents_posterior, padding_mask, reverse=False
            )
        else:
            latents_posterior, ld = conv_flow(
                fp, config, latents_posterior, padding_mask, h + hd, reverse=False
            )
        latents_posterior = jnp.flip(latents_posterior, axis=-1)
        log_det_posterior = log_det_posterior + ld

    first_half = latents_posterior[..., :1]
    second_half = latents_posterior[..., 1:]

    log_det_posterior = log_det_posterior + jnp.sum(
        (jax.nn.log_sigmoid(first_half) + jax.nn.log_sigmoid(-first_half)) * padding_mask,
        axis=(1, 2),
    )
    logq = (
        jnp.sum(
            -0.5 * (math.log(2 * math.pi) + random_posterior**2) * padding_mask,
            axis=(1, 2),
        )
        - log_det_posterior
    )

    first_half = (durations - jax.nn.sigmoid(first_half)) * padding_mask
    first_half = jnp.log(jnp.clip(first_half, min=1e-5)) * padding_mask
    log_det_sum = jnp.sum(-first_half, axis=(1, 2))

    latents = jnp.concatenate([first_half, second_half], axis=-1)
    for i in range(config.duration_predictor_num_flows + 1):
        fp = p.sub(f"flows.{i}")
        if i == 0:
            latents, ld = elementwise_affine(fp, latents, padding_mask, reverse=False)
        else:
            latents, ld = conv_flow(fp, config, latents, padding_mask, h, reverse=False)
        latents = jnp.flip(latents, axis=-1)
        log_det_sum = log_det_sum + ld

    nll = (
        jnp.sum(0.5 * (math.log(2 * math.pi) + latents**2) * padding_mask, axis=(1, 2))
        - log_det_sum
    )
    return nll + logq


def duration_predictor(
    params: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, hidden)
    padding_mask: jax.Array,
    global_conditioning: jax.Array | None = None,
) -> jax.Array:
    """Deterministic VitsDurationPredictor (use_stochastic_duration_prediction=False)."""
    p = params.sub("duration_predictor")
    k = config.duration_predictor_kernel_size
    if global_conditioning is not None:
        inputs = inputs + conv1d(global_conditioning, p["cond.weight"], p["cond.bias"])
    h = conv1d(inputs * padding_mask, p["conv_1.weight"], p["conv_1.bias"], padding=k // 2)
    h = jax.nn.relu(h)
    h = layer_norm(h, p["norm_1.weight"], p["norm_1.bias"], config.layer_norm_eps)
    h = conv1d(h * padding_mask, p["conv_2.weight"], p["conv_2.bias"], padding=k // 2)
    h = jax.nn.relu(h)
    h = layer_norm(h, p["norm_2.weight"], p["norm_2.bias"], config.layer_norm_eps)
    h = conv1d(h * padding_mask, p["proj.weight"], p["proj.bias"])
    return h * padding_mask
