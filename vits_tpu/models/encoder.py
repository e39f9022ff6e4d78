"""VITS text encoder: transformer with windowed relative-position attention.

Rebuild of the reference's ``text_encoder_graph``
(/root/reference/src/vits.cpp:244-440) in batched, mask-aware JAX.  Differences
by design: a leading batch dimension everywhere (the reference hard-asserts
bsz==1, vits.cpp:303), padding masks at the exact points HF applies them (so
padded batches are bit-identical to unpadded single runs), and layouts chosen
for the MXU — attention projections are (in, out) matmuls, conv-FFN runs in NTC.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView
from vits_tpu.ops.attention import (
    absolute_position_to_relative_position,
    get_relative_embeddings,
    relative_position_to_absolute_position,
)
from vits_tpu.ops.conv import conv1d, layer_norm


class EncoderOutput(NamedTuple):
    last_hidden_state: jax.Array  # (B, T, H)
    prior_means: jax.Array  # (B, T, flow)
    prior_log_variances: jax.Array  # (B, T, flow)


def _attention(p: ParamView, x: jax.Array, attn_bias: jax.Array | None, config: VitsConfig,
               use_pallas: bool = False, lengths: jax.Array | None = None,
               pallas_precision: str | None = None, trainable: bool = False):
    """Multi-head self-attention with relative position bias (window_size).

    x: (B, T, H); attn_bias: additive (B, 1, T, T) mask or None.
    Mirrors vits.cpp:271-359 / HF VitsAttention.

    ``use_pallas`` routes through the flash-style fused kernel
    (ops/pallas/attention.py) — same math, no quadratic HBM traffic; requires
    the prefix-length mask (``lengths``) the engine always uses, rather than
    an arbitrary ``attn_bias``.
    """
    bsz, tgt_len, embed_dim = x.shape
    num_heads = config.num_attention_heads
    head_dim = config.head_dim
    scaling = head_dim**-0.5

    query = (x @ p["q_proj.weight"] + p["q_proj.bias"]) * scaling
    key = x @ p["k_proj.weight"] + p["k_proj.bias"]
    value = x @ p["v_proj.weight"] + p["v_proj.bias"]

    if use_pallas and config.window_size:
        from vits_tpu.ops.pallas.attention import flash_rel_attention

        def shape4(t):  # (B, T, H) -> (B, heads, T, head_dim)
            return t.reshape(bsz, tgt_len, num_heads, head_dim).transpose(0, 2, 1, 3)

        if trainable:
            # gradient path: flash forward + flash backward (custom VJP,
            # ops/pallas/attention_grad.py) — used by the training step
            from vits_tpu.ops.pallas.attention_grad import make_trainable_attention

            attn4 = make_trainable_attention(
                window=config.window_size, precision=pallas_precision,
            )(shape4(query), shape4(key), shape4(value),
              p["emb_rel_k"][0], p["emb_rel_v"][0], lengths)
        else:
            attn4 = flash_rel_attention(
                shape4(query), shape4(key), shape4(value),
                p["emb_rel_k"][0], p["emb_rel_v"][0],
                window=config.window_size, lengths=lengths,
                precision=pallas_precision,
            )
        attn_output = attn4.transpose(0, 2, 1, 3).reshape(bsz, tgt_len, embed_dim)
        return attn_output @ p["out_proj.weight"] + p["out_proj.bias"]

    def shape(t):  # (B, T, H) -> (B*heads, T, head_dim)
        return (
            t.reshape(bsz, tgt_len, num_heads, head_dim)
            .transpose(0, 2, 1, 3)
            .reshape(bsz * num_heads, tgt_len, head_dim)
        )

    q, k, v = shape(query), shape(key), shape(value)
    attn_weights = jnp.einsum("bqd,bkd->bqk", q, k)

    if config.window_size:
        key_rel = get_relative_embeddings(p["emb_rel_k"], tgt_len, config.window_size)
        rel_logits = jnp.einsum("bqd,rd->bqr", q, key_rel[0])
        attn_weights = attn_weights + relative_position_to_absolute_position(rel_logits)

    if attn_bias is not None:
        attn_weights = (
            attn_weights.reshape(bsz, num_heads, tgt_len, tgt_len) + attn_bias
        ).reshape(bsz * num_heads, tgt_len, tgt_len)

    attn_weights = jax.nn.softmax(attn_weights, axis=-1)
    attn_output = jnp.einsum("bqk,bkd->bqd", attn_weights, v)

    if config.window_size:
        value_rel = get_relative_embeddings(p["emb_rel_v"], tgt_len, config.window_size)
        rel_weights = absolute_position_to_relative_position(attn_weights)
        attn_output = attn_output + jnp.einsum("bqr,rd->bqd", rel_weights, value_rel[0])

    attn_output = (
        attn_output.reshape(bsz, num_heads, tgt_len, head_dim)
        .transpose(0, 2, 1, 3)
        .reshape(bsz, tgt_len, embed_dim)
    )
    return attn_output @ p["out_proj.weight"] + p["out_proj.bias"]


def _feed_forward(p: ParamView, x: jax.Array, padding_mask: jax.Array, config: VitsConfig):
    """Conv-FFN (vits.cpp:377-407 / HF VitsFeedForward); x: (B, T, H)."""
    k = config.ffn_kernel_size
    pad_left, pad_right = (k - 1) // 2, k // 2
    act = jax.nn.relu if config.hidden_act == "relu" else jax.nn.gelu

    h = x * padding_mask
    if k > 1:
        h = jnp.pad(h, ((0, 0), (pad_left, pad_right), (0, 0)))
    h = conv1d(h, p["conv_1.weight"], p["conv_1.bias"])
    h = act(h)
    h = h * padding_mask
    if k > 1:
        h = jnp.pad(h, ((0, 0), (pad_left, pad_right), (0, 0)))
    h = conv1d(h, p["conv_2.weight"], p["conv_2.bias"])
    return h * padding_mask


def encoder_layer(
    layer: ParamView,
    hidden: jax.Array,  # (B, T, H)
    attn_bias: jax.Array | None,
    padding_mask: jax.Array,  # (B, T, 1)
    config: VitsConfig,
    use_pallas: bool = False,
    lengths: jax.Array | None = None,
    pallas_precision: str | None = None,
    trainable: bool = False,
) -> jax.Array:
    """One transformer layer: rel-pos attention + conv-FFN, post-layernorms.

    Factored out of the :func:`text_encoder` loop so the pipeline-parallel
    path (parallel/pipeline.py) applies byte-identical per-layer math from
    stage-stacked parameters.
    """
    residual = hidden
    attn_out = _attention(layer.sub("attention"), hidden, attn_bias, config,
                          use_pallas=use_pallas, lengths=lengths,
                          pallas_precision=pallas_precision,
                          trainable=trainable)
    hidden = layer_norm(
        residual + attn_out,
        layer["layer_norm.weight"],
        layer["layer_norm.bias"],
        config.layer_norm_eps,
    )
    residual = hidden
    ffn_out = _feed_forward(layer.sub("feed_forward"), hidden, padding_mask, config)
    return layer_norm(
        residual + ffn_out,
        layer["final_layer_norm.weight"],
        layer["final_layer_norm.bias"],
        config.layer_norm_eps,
    )


def text_encoder(
    params: ParamView,
    config: VitsConfig,
    input_ids: jax.Array,  # (B, T) int32
    padding_mask: jax.Array,  # (B, T, 1) float
    attention_mask: jax.Array | None = None,  # (B, T) float, 1 = keep
    use_pallas: bool = False,
    pallas_precision: str | None = None,
    trainable: bool = False,
) -> EncoderOutput:
    p = params.sub("text_encoder")
    hidden = jnp.take(p["embed_tokens.weight"], input_ids, axis=0)
    hidden = hidden * math.sqrt(config.hidden_size)
    hidden = hidden * padding_mask

    attn_bias = None
    lengths = None
    if attention_mask is not None:
        # (B, T) -> additive (B, 1, Tq, Tk): 0 where keep, large-negative where pad.
        neg = jnp.finfo(hidden.dtype).min
        attn_bias = (1.0 - attention_mask[:, None, None, :]) * neg
        # prefix-length form of the same mask, for the fused kernel
        lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)

    enc = p.sub("encoder")
    for i in range(config.num_hidden_layers):
        hidden = encoder_layer(
            enc.sub(f"layers.{i}"), hidden, attn_bias, padding_mask, config,
            use_pallas=use_pallas, lengths=lengths,
            pallas_precision=pallas_precision, trainable=trainable,
        )

    hidden = hidden * padding_mask
    stats = conv1d(hidden, p["project.weight"], p["project.bias"]) * padding_mask
    prior_means = stats[..., : config.flow_size]
    prior_log_variances = stats[..., config.flow_size :]
    return EncoderOutput(hidden, prior_means, prior_log_variances)
