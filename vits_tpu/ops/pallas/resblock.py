"""Fused HiFiGAN residual block as a Pallas TPU kernel.

One resblock = 3 (dilated-conv, unit-conv) pairs with leaky-relu activations
and residual adds (vits.cpp:545-581 / HF HifiGanResidualBlock).  XLA executes
that as ~8 HBM-round-tripping ops per pair; this kernel keeps the whole block
in VMEM: per time-tile it DMAs one input window (with the receptive-field
halo), runs all 3 pairs as shift-matmul MXU contractions, and writes one
output tile.  HBM traffic drops from ~14 tensor passes to 2.

Contract (matches ``xla_resblock`` reference impl in this module):
  * input pre-padded by the caller with ``total_halo`` zeros on both time ends
  * time length a multiple of the tile; channels a multiple of 128 preferred
  * weights in canonical (k, C, C) layout, biases (C,)

Equivalence is pinned by tests (interpret mode on CPU, compiled on TPU);
the engine only routes through this kernel where it profiles faster.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.ops.conv import conv1d, leaky_relu


def halo_per_pair(kernel_size: int, dilation: int) -> int:
    return dilation * (kernel_size - 1) // 2 + (kernel_size - 1) // 2


def total_halo(kernel_size: int, dilations: Sequence[int]) -> int:
    return sum(halo_per_pair(kernel_size, d) for d in dilations)


def xla_resblock(x, weights, kernel_size, dilations, slope):
    """Reference implementation (same math as models/hifigan._resblock)."""
    w1s, b1s, w2s, b2s = weights
    for i, dilation in enumerate(dilations):
        residual = x
        h = leaky_relu(x, slope)
        h = conv1d(h, w1s[i], b1s[i],
                   padding=(kernel_size * dilation - dilation) // 2,
                   dilation=dilation)
        h = leaky_relu(h, slope)
        h = conv1d(h, w2s[i], b2s[i], padding=(kernel_size - 1) // 2)
        x = h + residual
    return x


def _kernel(x_hbm, len_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, xwin, sem,
            *, tile_t, kernel_size, dilations, slope, window, halo):
    i = pl.program_id(0)  # time tile
    b = pl.program_id(1)  # batch row

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_t, window), :], xwin, sem
    )
    dma.start()
    dma.wait()

    k = kernel_size
    valid_len = len_ref[b, 0]
    x = xwin[:]  # (window, C) — includes halo for ALL pairs
    cur_len = window
    offset = 0  # rows consumed off the window's left edge so far
    for pair, dilation in enumerate(dilations):
        h1 = dilation * (k - 1) // 2
        h2 = (k - 1) // 2
        mid_len = cur_len - 2 * h1
        out_len = mid_len - 2 * h2

        h = jnp.where(x >= 0, x, x * slope)
        acc1 = None
        for tap in range(k):
            piece = jax.lax.slice_in_dim(h, tap * dilation, tap * dilation + mid_len, axis=0)
            term = jnp.dot(piece, w1_ref[pair, tap], preferred_element_type=jnp.float32)
            acc1 = term if acc1 is None else acc1 + term
        y1 = acc1 + b1_ref[pair][None, :].astype(jnp.float32)

        # conv1 output positions: g = i*tile_t + offset + h1 + t; re-zero
        # out-of-sequence rows before conv2 reads them (matches the XLA
        # reference's zero padding / the module's post-conv masking).
        g1 = (
            jax.lax.broadcasted_iota(jnp.int32, (mid_len, 1), 0)
            + (i * tile_t + offset + h1)
        )
        in_seq1 = (g1 >= halo) & (g1 < halo + valid_len)
        y1 = jnp.where(in_seq1, y1, 0.0)

        h2v = jnp.where(y1 >= 0, y1, y1 * slope)
        acc2 = None
        for tap in range(k):
            piece = jax.lax.slice_in_dim(h2v, tap, tap + out_len, axis=0)
            term = jnp.dot(piece, w2_ref[pair, tap], preferred_element_type=jnp.float32)
            acc2 = term if acc2 is None else acc2 + term
        y2 = acc2 + b2_ref[pair][None, :]

        # residual: center slice of the CURRENT x matching out_len (local
        # offset h1+h2); `offset` tracks the cumulative window position for
        # the global-coordinate masks.
        local = h1 + h2
        offset += local
        x = jax.lax.slice_in_dim(x, local, local + out_len, axis=0) + y2
        cur_len = out_len

        # Re-zero out-of-sequence rows: every conv (XLA reference and the
        # module's mask propagation) sees zeros beyond the row's valid
        # length, but the pair above writes bias-propagated values there.
        # Global position of row t: g = i*tile_t + offset + t, in-sequence
        # iff halo <= g < halo + valid_len.
        g = (
            jax.lax.broadcasted_iota(jnp.int32, (cur_len, 1), 0)
            + (i * tile_t + offset)
        )
        in_seq = (g >= halo) & (g < halo + valid_len)
        x = jnp.where(in_seq, x, 0.0)

    out_ref[0] = x.astype(out_ref.dtype)


def fused_resblock(
    x: jax.Array,  # (B, T, C) — UNpadded
    w1: jax.Array,  # (pairs, k, C, C)
    b1: jax.Array,  # (pairs, C)
    w2: jax.Array,  # (pairs, k, C, C)
    b2: jax.Array,  # (pairs, C)
    *,
    kernel_size: int,
    dilations: Sequence[int],
    slope: float,
    tile_t: int = 2048,
    lengths: jax.Array | None = None,  # (B,) valid rows per batch entry
    interpret: bool = False,
) -> jax.Array:
    B, T, C = x.shape
    halo = total_halo(kernel_size, tuple(dilations))
    tile_t = min(tile_t, max(8, T))
    n_tiles = math.ceil(T / tile_t)
    t_padded = n_tiles * tile_t
    window = tile_t + 2 * halo

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)

    # zero-pad: halo on both ends + tail-round-up (masked region, trimmed below)
    xp = jnp.pad(x, ((0, 0), (halo, halo + (t_padded - T)), (0, 0)))

    kernel = functools.partial(
        _kernel,
        tile_t=tile_t,
        kernel_size=kernel_size,
        dilations=tuple(dilations),
        slope=slope,
        window=window,
        halo=halo,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM; manual DMA
            # whole (B, 1) lengths array in SMEM; indexed by program_id(1) —
            # a per-row (1,1) block trips Mosaic's block-divisibility rules
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, C), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_padded, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window, C), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, lengths2, w1, b1, w2, b2)
    return out[:, :T]
