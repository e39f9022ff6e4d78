"""VITS generator-side training losses.

The reference is inference-only (SURVEY.md §5: "no training"); these implement
the VITS objective so the TPU framework can train the checkpoints it serves:
KL(posterior ‖ aligned prior), stochastic-duration NLL, and mel reconstruction
on randomly sliced decoder segments.  Adversarial (discriminator) terms live in
:mod:`vits_tpu.train.discriminator`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kl_divergence(
    z_p: jax.Array,  # (B, S, C) flow-forward posterior sample
    logs_q: jax.Array,  # (B, S, C) posterior log-stddev
    m_p: jax.Array,  # (B, S, C) aligned prior means
    logs_p: jax.Array,  # (B, S, C) aligned prior log-stddev
    frame_mask: jax.Array,  # (B, S)
) -> jax.Array:
    """Masked mean KL (the VITS formulation on flow-mapped samples).

    Inputs are upcast to fp32 so the loss (a masked sum over all frames) stays
    precise when the forward pass runs in bfloat16 (mixed-precision training);
    a no-op under fp32.
    """
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    frame_mask = frame_mask.astype(jnp.float32)
    mask = frame_mask[..., None]
    kl = logs_p - logs_q - 0.5
    kl = kl + 0.5 * (jnp.exp(2.0 * logs_q) + (z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    return jnp.sum(kl * mask) / jnp.maximum(jnp.sum(mask) * z_p.shape[-1], 1.0) * z_p.shape[-1]


def feature_matching_loss(real_feats, fake_feats) -> jax.Array:
    """L1 distance between discriminator feature maps (GAN stabilizer).

    Feature maps are upcast to fp32 before the reductions (exact under fp32,
    keeps the scalar precise under bfloat16 mixed-precision training).
    """
    total = 0.0
    count = 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            r32 = jax.lax.stop_gradient(r).astype(jnp.float32)
            total = total + jnp.mean(jnp.abs(r32 - f.astype(jnp.float32)))
            count += 1
    return total / max(count, 1)


def generator_adversarial_loss(fake_logits) -> jax.Array:
    """LSGAN generator loss: mean (1 - D(fake))^2 over all discriminators."""
    total = 0.0
    for logits in fake_logits:
        total = total + jnp.mean((1.0 - logits.astype(jnp.float32)) ** 2)
    return total / max(len(fake_logits), 1)


def discriminator_loss(real_logits, fake_logits) -> jax.Array:
    """LSGAN discriminator loss."""
    total = 0.0
    for r, f in zip(real_logits, fake_logits):
        r = r.astype(jnp.float32)
        f = f.astype(jnp.float32)
        total = total + jnp.mean((1.0 - r) ** 2) + jnp.mean(f**2)
    return total / max(len(real_logits), 1)


def slice_segments(
    x: jax.Array,  # (B, S, ...) frame-major tensor
    starts: jax.Array,  # (B,) int32 start frames
    segment_size: int,
) -> jax.Array:
    """Per-row dynamic slice of ``segment_size`` frames (VITS rand_slice)."""

    def one(row, start):
        return jax.lax.dynamic_slice_in_dim(row, start, segment_size, axis=0)

    return jax.vmap(one)(x, starts)


def random_segment_starts(
    rng: jax.Array, frame_lengths: jax.Array, segment_size: int
) -> jax.Array:
    """Uniform start frames such that the segment stays inside the valid region."""
    max_start = jnp.maximum(frame_lengths - segment_size, 0)
    u = jax.random.uniform(rng, frame_lengths.shape)
    return (u * (max_start + 1)).astype(jnp.int32)
