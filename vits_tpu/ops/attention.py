"""Relative-position attention helpers (windowed, VITS-style).

The rel<->abs index shuffles are pure pad/reshape/slice — the reference builds
them from its pad_3d/slice_3d custom ops (/root/reference/src/vits.cpp:195-235);
under XLA they compile to cheap layout ops.  Shapes are static under jit, so the
Python-level ``max``/branching is resolved at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_relative_embeddings(emb: jax.Array, length: int, window_size: int) -> jax.Array:
    """Slice/pad the (1, 2*window+1, head_dim) table to (1, 2*length-1, head_dim).

    Mirrors vits.cpp:195-205 / HF ``_get_relative_embeddings``.
    """
    pad_length = max(length - (window_size + 1), 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    start = max((window_size + 1) - length, 0)
    return emb[:, start : start + 2 * length - 1]


def relative_position_to_absolute_position(x: jax.Array) -> jax.Array:
    """(BH, L, 2L-1) relative logits -> (BH, L, L) absolute logits.

    The pad/flatten/pad/reshape/slice trick of vits.cpp:207-220.
    """
    batch_heads, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(batch_heads, length * 2 * length)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, length - 1)))
    x_final = x_flat.reshape(batch_heads, length + 1, 2 * length - 1)
    return x_final[:, :length, length - 1 :]


def absolute_position_to_relative_position(x: jax.Array) -> jax.Array:
    """(BH, L, L) attention weights -> (BH, L, 2L-1) relative weights.

    Inverse shuffle of vits.cpp:222-235.
    """
    batch_heads, length, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
    x_flat = x.reshape(batch_heads, length * (2 * length - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (length, 0)))
    x_final = x_flat.reshape(batch_heads, length, 2 * length)
    return x_final[:, :, 1:]
