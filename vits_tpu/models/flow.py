"""WaveNet stack and residual-coupling flow.

Rebuild of wavenet_graph (/root/reference/src/vits.cpp:452-498) and
flow_graph (/root/reference/src/vits.cpp:500-538) — batched, masked, both
directions (the reference asserts reverse-only), and with the speaker
global-conditioning path implemented (the reference leaves it as
``ASSERT(false, "Not implemented")`` at vits.cpp:461,472).

The gated dilated-conv stack is left as one fused XLA region: the dilated
conv + tanh·sigmoid gate + res/skip 1x1 all fuse into a few MXU convolutions
per layer, which is the TPU equivalent of the reference's custom
``add_tanh_sigmoid_multiply_inplace`` fusion (vits.cpp:442-450).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.ops.conv import conv1d


def wavenet(
    p: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, hidden)
    padding_mask: jax.Array,  # (B, T, 1)
    num_layers: int,
    global_conditioning: jax.Array | None = None,  # (B, 1, speaker_emb)
) -> jax.Array:
    hidden = config.hidden_size
    outputs = jnp.zeros_like(inputs)

    cond = None
    if global_conditioning is not None:
        cond = conv1d(global_conditioning, p["cond_layer.weight"], p["cond_layer.bias"])

    for i in range(num_layers):
        dilation = config.wavenet_dilation_rate**i
        padding = (config.wavenet_kernel_size * dilation - dilation) // 2
        hidden_states = conv1d(
            inputs,
            p[f"in_layers.{i}.weight"],
            p[f"in_layers.{i}.bias"],
            padding=padding,
            dilation=dilation,
        )
        if cond is not None:
            offset = i * 2 * hidden
            global_states = cond[..., offset : offset + 2 * hidden]
        else:
            global_states = 0.0
        in_act = hidden_states + global_states
        # fused gate (vits.cpp:442-450): tanh(first half) * sigmoid(second half)
        acts = jnp.tanh(in_act[..., :hidden]) * jax.nn.sigmoid(in_act[..., hidden:])

        res_skip = conv1d(
            acts, p[f"res_skip_layers.{i}.weight"], p[f"res_skip_layers.{i}.bias"]
        )
        if i < num_layers - 1:
            inputs = (inputs + res_skip[..., :hidden]) * padding_mask
            outputs = outputs + res_skip[..., hidden:]
        else:
            outputs = outputs + res_skip
    return outputs * padding_mask


def residual_coupling_layer(
    p: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, flow_size)
    padding_mask: jax.Array,
    global_conditioning: jax.Array | None,
    reverse: bool,
):
    half = config.flow_size // 2
    first_half = inputs[..., :half]
    second_half = inputs[..., half:]

    h = conv1d(first_half, p["conv_pre.weight"], p["conv_pre.bias"]) * padding_mask
    h = wavenet(
        p.sub("wavenet"),
        config,
        h,
        padding_mask,
        config.prior_encoder_num_wavenet_layers,
        global_conditioning,
    )
    mean = conv1d(h, p["conv_post.weight"], p["conv_post.bias"]) * padding_mask

    if not reverse:
        # log_stddev is fixed at zero in VITS inference flows (HF does the same).
        second_half = (mean + second_half) * padding_mask
        outputs = jnp.concatenate([first_half, second_half], axis=-1)
        log_det = jnp.zeros(inputs.shape[0], dtype=inputs.dtype)
        return outputs, log_det
    second_half = (second_half - mean) * padding_mask
    return jnp.concatenate([first_half, second_half], axis=-1), None


def residual_coupling_block(
    params: ParamView,
    config: VitsConfig,
    inputs: jax.Array,  # (B, T, flow_size)
    padding_mask: jax.Array,
    global_conditioning: jax.Array | None = None,
    reverse: bool = True,
):
    """The full flow: num_flows coupling layers with channel flips between.

    reverse=True maps prior latents -> vocoder latents (inference,
    vits.cpp:519-538); reverse=False is the training direction with summed
    log-determinants.
    """
    p = params.sub("flow")
    cur = inputs
    if not reverse:
        log_det_total = jnp.zeros(inputs.shape[0], dtype=inputs.dtype)
        for i in range(config.prior_encoder_num_flows):
            cur, log_det = residual_coupling_layer(
                p.sub(f"flows.{i}"), config, cur, padding_mask,
                global_conditioning, reverse=False,
            )
            cur = jnp.flip(cur, axis=-1)
            log_det_total = log_det_total + log_det
        return cur, log_det_total
    for i in range(config.prior_encoder_num_flows - 1, -1, -1):
        cur = jnp.flip(cur, axis=-1)
        cur, _ = residual_coupling_layer(
            p.sub(f"flows.{i}"), config, cur, padding_mask,
            global_conditioning, reverse=True,
        )
    return cur, None
