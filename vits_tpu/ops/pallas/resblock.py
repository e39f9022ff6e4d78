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

from vits_tpu.ops.pallas import kernel_dot, resolve_interpret, resolve_precision

from vits_tpu.ops.conv import conv1d, leaky_relu


def _leaky(x, slope):
    """leaky_relu with the sign predicate in fp32: v5e Mosaic rejects bf16
    vector comparisons (`arith.cmpf` on bf16 -> "Target does not support
    this comparison"), so bf16 value buffers compare through an fp32 cast —
    the multiply/select still runs at the value dtype."""
    pred = x >= 0 if x.dtype == jnp.float32 else x.astype(jnp.float32) >= 0
    return jnp.where(pred, x, x * slope)


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
            *, tile_t, kernel_size, dilations, slope, window, halo, precision=None,
            value_dtype=jnp.float32):
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

        h = _leaky(x, slope)
        acc1 = None
        for tap in range(k):
            piece = jax.lax.slice_in_dim(h, tap * dilation, tap * dilation + mid_len, axis=0)
            term = kernel_dot(piece, w1_ref[pair, tap], precision)
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

        h2v = jnp.where(y1 >= 0, y1, y1 * slope).astype(value_dtype)
        acc2 = None
        for tap in range(k):
            piece = jax.lax.slice_in_dim(h2v, tap, tap + out_len, axis=0)
            term = kernel_dot(piece, w2_ref[pair, tap], precision)
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
        x = jnp.where(in_seq, x, 0.0).astype(value_dtype)

    out_ref[0] = x.astype(out_ref.dtype)


# --------------------------------------------------------------------------- #
# Whole-trio variant for wide stages (C % 128 == 0): the HiFiGAN stage runs
# THREE resblocks on the same input and averages them.  Running them as three
# pallas_calls costs 3 window DMAs + 3 output writes + an XLA mean (2 more
# passes); this kernel runs all three chains on ONE VMEM-resident window and
# writes the mean — 1 read + 1 write of the activation per stage.
# --------------------------------------------------------------------------- #


def _trio_kernel(x_hbm, len_ref, *rest, tile_t, blocks_meta, slope, window,
                 HO, inv_blocks, precision=None, value_dtype=jnp.float32):
    # per block: (w1, b1, w2, b2) + (s1, s2) per-channel scales when int8
    n_refs = sum(6 if m["quant"] else 4 for m in blocks_meta)
    w_refs = rest[:n_refs]
    out_ref, xwin, sem = rest[n_refs:]
    i = pl.program_id(0)
    b = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_t, window), :], xwin, sem
    )
    dma.start()
    dma.wait()

    valid_len = len_ref[b, 0]
    acc = None
    ref_pos = 0
    for meta in blocks_meta:
        w1_ref, b1_ref, w2_ref, b2_ref = w_refs[ref_pos : ref_pos + 4]
        s1_ref = s2_ref = None
        if meta["quant"]:
            s1_ref, s2_ref = w_refs[ref_pos + 4 : ref_pos + 6]
            ref_pos += 6
        else:
            ref_pos += 4
        k = meta["kernel_size"]
        x = xwin[:]
        cur_len = window
        offset = 0
        for pair, dilation in enumerate(meta["dilations"]):
            h1 = dilation * (k - 1) // 2
            h2 = (k - 1) // 2
            mid_len = cur_len - 2 * h1
            out_len = mid_len - 2 * h2

            h = _leaky(x, slope)
            acc1 = None
            for tap in range(k):
                piece = jax.lax.slice_in_dim(
                    h, tap * dilation, tap * dilation + mid_len, axis=0)
                term = kernel_dot(piece, w1_ref[pair, tap].astype(value_dtype),
                                  precision)
                acc1 = term if acc1 is None else acc1 + term
            if s1_ref is not None:
                # int8 weights: every tap of a pair shares the per-OUT-channel
                # scale, so ONE fp32 multiply on the accumulated sum
                # dequantizes the whole conv.
                acc1 = acc1 * s1_ref[pair][None, :]
            y1 = acc1 + b1_ref[pair][None, :].astype(jnp.float32)
            g1 = (
                jax.lax.broadcasted_iota(jnp.int32, (mid_len, 1), 0)
                + (i * tile_t + offset + h1)
            )
            in_seq1 = (g1 >= HO) & (g1 < HO + valid_len)
            y1 = jnp.where(in_seq1, y1, 0.0)

            h2v = jnp.where(y1 >= 0, y1, y1 * slope).astype(value_dtype)
            acc2 = None
            for tap in range(k):
                piece = jax.lax.slice_in_dim(h2v, tap, tap + out_len, axis=0)
                term = kernel_dot(piece, w2_ref[pair, tap].astype(value_dtype),
                                  precision)
                acc2 = term if acc2 is None else acc2 + term
            if s2_ref is not None:
                acc2 = acc2 * s2_ref[pair][None, :]
            y2 = acc2 + b2_ref[pair][None, :]

            local = h1 + h2
            offset += local
            x = jax.lax.slice_in_dim(x, local, local + out_len, axis=0) + y2
            cur_len = out_len
            g = (
                jax.lax.broadcasted_iota(jnp.int32, (cur_len, 1), 0)
                + (i * tile_t + offset)
            )
            in_seq = (g >= HO) & (g < HO + valid_len)
            # carry the working value in value_dtype: halves the VMEM
            # bandwidth + sublane-relayout bytes of every later shifted read
            x = jnp.where(in_seq, x, 0.0).astype(value_dtype)

        # window covers [i*tile - HO, ...); this block consumed meta["halo"]
        # per side — slice its centered tile.  Sum across blocks in fp32.
        xb = jax.lax.slice_in_dim(
            x, HO - meta["halo"], HO - meta["halo"] + tile_t, axis=0
        ).astype(jnp.float32)
        acc = xb if acc is None else acc + xb
    out_ref[0] = (acc * inv_blocks).astype(out_ref.dtype)


def fused_resblock_trio(
    x: jax.Array,  # (B, T, C) UNpadded, C % 128 == 0
    blocks: Sequence[dict],  # per block: {w1, b1, w2, b2, kernel_size, dilations}
    #   int8 serving: add {s1, s2} per-out-channel fp32 scales (pairs, C) and
    #   pass w1/w2 as int8 — dequantization happens on the fp32 accumulator
    #   in-kernel, so the weights ride HBM->VMEM at 1 byte/entry.
    *,
    slope: float,
    tile_t: int = 2048,
    lengths: jax.Array | None = None,
    interpret: bool | None = None,
    precision: str | None = None,
    value_dtype=None,  # VMEM value dtype: None = fp32 (exact parity mode);
    #   jnp.bfloat16 halves window/weight VMEM traffic, fp32 accumulation
) -> jax.Array:
    """mean_j resblock_j(x) in ONE kernel (wide stages).  Bit-matches the
    mean of ``xla_resblock`` outputs at value_dtype fp32; pinned by
    tests/test_pallas_resblock."""
    interpret = resolve_interpret(interpret)
    B, T, C = x.shape
    assert C % 128 == 0, C
    vd = jnp.float32 if value_dtype is None else jnp.dtype(value_dtype)
    metas = []
    for blk in blocks:
        halo = total_halo(blk["kernel_size"], tuple(blk["dilations"]))
        metas.append({
            "kernel_size": blk["kernel_size"],
            "dilations": tuple(blk["dilations"]),
            "halo": halo,
            "quant": "s1" in blk,
        })
    HO = max(m["halo"] for m in metas)

    tile_t = min(tile_t, max(8, T))
    n_tiles = math.ceil(T / tile_t)
    t_padded = n_tiles * tile_t
    window = tile_t + 2 * HO

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)
    xp = jnp.pad(x, ((0, 0), (HO, HO + (t_padded - T)), (0, 0)))
    if vd != xp.dtype:
        xp = xp.astype(vd)  # XLA-side cast: the HBM window rides at vd bytes

    kernel = functools.partial(
        _trio_kernel,
        tile_t=tile_t, blocks_meta=tuple(metas), slope=slope,
        window=window, HO=HO, inv_blocks=1.0 / len(blocks),
        precision=resolve_precision(precision),
        value_dtype=vd,
    )
    w_inputs = []
    for blk, meta in zip(blocks, metas):
        w1, w2 = blk["w1"], blk["w2"]
        if not meta["quant"] and vd != jnp.float32:
            # pre-cast fp32 weights once in XLA (int8 weights cast in-kernel)
            w1, w2 = w1.astype(vd), w2.astype(vd)
        w_inputs += [w1, blk["b1"], w2, blk["b2"]]
        if meta["quant"]:
            w_inputs += [jnp.asarray(blk["s1"], jnp.float32),
                         jnp.asarray(blk["s2"], jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(w_inputs),
        out_specs=pl.BlockSpec(
            (1, tile_t, C), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, t_padded, C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window, C), vd),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, lengths2, *w_inputs)
    return out[:, :T]


# --------------------------------------------------------------------------- #
# Time-packed variant: channels C < 128 waste MXU lanes (C=64 runs at 8% MFU,
# C=32 at 2.6% — BENCH_DETAIL.json), and Mosaic rejects HBM slices whose lane
# dim isn't 128-aligned.  Packing g = 128/C consecutive timesteps into one
# 128-lane row fixes both: a dilated conv over the packed layout is still a
# sum of shift-matmuls, just with block-structured 128x128 weights — packed
# output row r, slot j draws from input index m = j + tap*d, i.e. packed row
# r + m//g, slot m%g, so W[tap] lands in block (m%g, j) of the shift-(m//g)
# matrix.  The residual add crosses slots the same way (offset h1+h2) and is
# a plain row slice when (h1+h2) % g == 0, two block-permutation matmuls
# otherwise.
# --------------------------------------------------------------------------- #


def _shift_plan(k: int, dilation: int, g: int):
    """Static placement plan for packed shift matrices.

    Returns (shift_set, entries) with entries = (mat_idx, src_slot p,
    dst_slot j, tap) — everything needed to materialize later.
    """
    shift_set = sorted({(j + tap * dilation) // g for j in range(g) for tap in range(k)})
    index = {q: i for i, q in enumerate(shift_set)}
    entries = []
    for tap in range(k):
        for j in range(g):
            q, p = divmod(j + tap * dilation, g)
            entries.append((index[q], p, j, tap))
    return tuple(shift_set), tuple(entries)


def _materialize_shift(w: jax.Array, entries, n_mats: int, g: int):
    """Build the (n, gC, gC) packed matrices from a plan.

    Traceable (w may be a jit tracer) — but callers should materialize ONCE
    at load time where possible (pack_stage_arrays): in-trace the scatter
    unrolls into per-dispatch update ops.
    """
    C = w.shape[1]
    out = jnp.zeros((n_mats, g * C, g * C), jnp.float32)
    for m, p, j, tap in entries:
        out = out.at[m, p * C : (p + 1) * C, j * C : (j + 1) * C].add(
            w[tap].astype(jnp.float32)
        )
    return out


def _pack_shift_weights(w: jax.Array, dilation: int, g: int):
    """(k, C, C) conv weights -> (shifts, (n, gC, gC)) packed shift matrices."""
    shifts, entries = _shift_plan(w.shape[0], dilation, g)
    return shifts, _materialize_shift(w, entries, len(shifts), g)


def _pack_residual_weights(offset: int, g: int, C: int):
    """Identity slot-shift by ``offset`` as packed block-permutation matrices."""
    import numpy as np

    shift_set = sorted({(j + offset) // g for j in range(g)})
    index = {q: i for i, q in enumerate(shift_set)}
    eye = np.eye(C, dtype=np.float32)
    out = np.zeros((len(shift_set), g * C, g * C), np.float32)
    for j in range(g):
        q, p = divmod(j + offset, g)
        out[index[q], p * C : (p + 1) * C, j * C : (j + 1) * C] = eye
    return tuple(shift_set), out


def _shift_matmul(src, shifts, w_ref, w_start, rows, precision=None):
    acc = None
    for idx, q in enumerate(shifts):
        piece = jax.lax.slice_in_dim(src, q, q + rows, axis=0)
        w = w_ref[w_start + idx]
        if w.dtype != src.dtype:
            # int8 packed weights (cast is exact: |q| <= 127 in bf16) or
            # fp32 side arrays meeting a bf16 value buffer
            w = w.astype(src.dtype)
        term = kernel_dot(piece, w, precision)
        acc = term if acc is None else acc + term
    return acc


def _run_pairs(x, cur, loc, pairs, w1_ref, b1_ref, w2_ref, b2_ref, wr_ref,
               slot_mask, slope, precision=None, value_dtype=jnp.float32,
               s1_ref=None, s2_ref=None):
    """Run a packed resblock's (conv1, conv2, residual) pair sequence in VMEM.

    ``x`` is a packed (rows, g*C) value carried in ``value_dtype``;
    ``slot_mask(rows, base)`` yields the in-sequence mask for a buffer whose
    row0/slot0 sits ``base`` unpacked steps past the tile origin.  When
    ``s1_ref``/``s2_ref`` per-pair scale rows are given the weight arrays are
    int8 and the fp32 accumulator is dequantized by one row-broadcast
    multiply per conv (all shift matrices of a pair share their per-column
    scales).  Returns the narrowed (x, cur, loc).
    """
    for pr in pairs:
        rows1 = cur - pr["q1max"]
        h = _leaky(x, slope)
        y1 = _shift_matmul(h, pr["s1"], w1_ref, pr["w1_start"], rows1, precision)
        if s1_ref is not None:
            y1 = y1 * s1_ref[pr["idx"]][None, :]
        y1 = y1 + b1_ref[pr["idx"]][None, :].astype(jnp.float32)
        # conv1 output row r slot j sits at loc + g*r + j + h1; re-zero
        # out-of-sequence slots before conv2 reads them
        y1 = jnp.where(slot_mask(rows1, loc + pr["h1"]), y1, 0.0)

        rows_new = cur - pr["consumed"]
        h2v = jnp.where(y1 >= 0, y1, y1 * slope).astype(value_dtype)
        y2 = _shift_matmul(h2v, pr["s2"], w2_ref, pr["w2_start"], rows_new, precision)
        if s2_ref is not None:
            y2 = y2 * s2_ref[pr["idx"]][None, :]
        y2 = y2 + b2_ref[pr["idx"]][None, :]

        if pr["res_slice"] is not None:
            res = jax.lax.slice_in_dim(
                x, pr["res_slice"], pr["res_slice"] + rows_new, axis=0
            )
        else:
            res = _shift_matmul(x, pr["sr"], wr_ref, pr["wr_start"], rows_new, precision)
        x = res + y2
        cur = rows_new
        loc += pr["h1"] + pr["h2"]
        x = jnp.where(slot_mask(cur, loc), x, 0.0).astype(value_dtype)
    return x, cur, loc


def _packed_kernel(x_hbm, len_ref, w1_ref, b1_ref, w2_ref, b2_ref, wr_ref,
                   out_ref, xwin, sem, *, tile_p, window, g, C, halo, slope, pairs,
                   precision=None, value_dtype=jnp.float32):
    i = pl.program_id(0)
    b = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_p, window), :], xwin, sem
    )
    dma.start()
    dma.wait()

    valid_len = len_ref[b, 0]

    def slot_mask(rows, base):
        # padded-unpacked position of row r, lane l: g*(i*tile_p + r) + l//C + base
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, g * C), 0) * g
            + jax.lax.broadcasted_iota(jnp.int32, (rows, g * C), 1) // C
            + (g * i * tile_p + base)
        )
        return (pos >= halo) & (pos < halo + valid_len)

    x, _, _ = _run_pairs(
        xwin[:], window, 0, pairs, w1_ref, b1_ref, w2_ref, b2_ref, wr_ref,
        slot_mask, slope, precision, value_dtype,
    )
    # window was rounded up for DMA alignment; keep the first tile_p rows
    out_ref[0] = jax.lax.slice_in_dim(x, 0, tile_p, axis=0).astype(out_ref.dtype)


def _pairs_plan(kernel_size, dilations, g, C,
                idx_base=0, w1_base=0, w2_base=0, wr_base=0):
    """Static metadata + materialization plan for one resblock's pairs.

    ``*_base`` offsets let a caller concatenate several resblocks' weights
    into shared arrays (the fused whole-stage kernel does this)."""
    k = kernel_size
    pairs, plan = [], []
    n1 = n2 = nr = 0
    for idx, d in enumerate(dilations):
        h1 = d * (k - 1) // 2
        h2 = (k - 1) // 2
        s1, e1 = _shift_plan(k, d, g)
        s2, e2 = _shift_plan(k, 1, g)
        off = h1 + h2
        q1max, q2max = max(s1), max(s2)
        entry = {
            "idx": idx_base + idx, "h1": h1, "h2": h2,
            "s1": s1, "w1_start": w1_base + n1,
            "s2": s2, "w2_start": w2_base + n2,
            "q1max": q1max,
        }
        step = {"pair": idx, "e1": e1, "n1": len(s1), "e2": e2, "n2": len(s2),
                "res": None}
        n1 += len(s1)
        n2 += len(s2)
        if off % g == 0:
            entry["res_slice"] = off // g
            entry["sr"] = ()
            entry["wr_start"] = 0
            qr = off // g
        else:
            sr, _ = _pack_residual_weights(off, g, C)
            entry["res_slice"] = None
            entry["sr"] = sr
            entry["wr_start"] = wr_base + nr
            step["res"] = off
            nr += len(sr)
            qr = max(sr)
        entry["consumed"] = max(q1max + q2max, qr)
        pairs.append(entry)
        plan.append(step)
    return pairs, plan


def _materialize_pairs(plan, w1, b1, w2, b2, g, C):
    """Build the packed weight matrices a _pairs_plan describes.

    Traceable, but callers should run this ONCE at load time where possible
    (see ops/pallas/stage.py::pack_stage_arrays)."""
    b1_packed = jnp.tile(b1.astype(jnp.float32), (1, g))
    b2_packed = jnp.tile(b2.astype(jnp.float32), (1, g))
    w1_mats, w2_mats, wr_mats = [], [], []
    for step in plan:
        i = step["pair"]
        w1_mats.append(_materialize_shift(w1[i], step["e1"], step["n1"], g))
        w2_mats.append(_materialize_shift(w2[i], step["e2"], step["n2"], g))
        if step["res"] is not None:
            _, mr = _pack_residual_weights(step["res"], g, C)
            wr_mats.append(jnp.asarray(mr))
    return w1_mats, w2_mats, wr_mats, b1_packed, b2_packed


def _build_pairs(w1, b1, w2, b2, kernel_size, dilations, g, C,
                 idx_base=0, w1_base=0, w2_base=0, wr_base=0):
    """Plan + materialize in one go (in-trace fallback path)."""
    pairs, plan = _pairs_plan(kernel_size, dilations, g, C,
                              idx_base, w1_base, w2_base, wr_base)
    w1_mats, w2_mats, wr_mats, b1p, b2p = _materialize_pairs(
        plan, w1, b1, w2, b2, g, C)
    return pairs, w1_mats, w2_mats, wr_mats, b1p, b2p


def _fused_resblock_packed(x, w1, b1, w2, b2, *, kernel_size, dilations, slope,
                           tile_t, lengths, interpret, g, precision=None,
                           value_dtype=jnp.float32):
    B, T, C = x.shape
    k = kernel_size
    halo = total_halo(k, tuple(dilations))

    pairs, w1_mats, w2_mats, wr_mats, b1_packed, b2_packed = _build_pairs(
        w1, b1, w2, b2, k, tuple(dilations), g, C
    )
    consumed_total = sum(p["consumed"] for p in pairs)
    w1_all = jnp.concatenate(w1_mats, axis=0)
    w2_all = jnp.concatenate(w2_mats, axis=0)
    wr_all = (
        jnp.concatenate(wr_mats, axis=0)
        if wr_mats
        else jnp.zeros((1, g * C, g * C), jnp.float32)
    )

    # --- pack the input: pad front by halo, round up to g*tile grid -------- #
    rows_needed = -(-T // g)  # ceil
    tile_p = min(tile_t, max(8, rows_needed))
    tile_p = -(-tile_p // 8) * 8  # sublane-aligned tile
    n_tiles = -(-rows_needed // tile_p)
    # round the halo allowance so the DMA window is sublane (8-row) aligned;
    # the slack rows are padding, read but unused
    consumed_round = -(-consumed_total // 8) * 8
    window = tile_p + consumed_round
    len_padded = g * (n_tiles * tile_p + consumed_round)
    pad_back = len_padded - T - halo
    assert pad_back >= 0, (len_padded, T, halo)
    xp = jnp.pad(x, ((0, 0), (halo, pad_back), (0, 0)))
    xp = xp.reshape(B, len_padded // g, g * C)
    if value_dtype != xp.dtype:
        xp = xp.astype(value_dtype)

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    lengths2 = lengths.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _packed_kernel,
        tile_p=tile_p, window=window, g=g, C=C, halo=halo, slope=slope,
        pairs=tuple(pairs),  # static metadata only (ints + tuples)
        precision=precision, value_dtype=value_dtype,
    )
    if value_dtype != jnp.float32:
        w1_all = w1_all.astype(value_dtype)
        w2_all = w2_all.astype(value_dtype)
        wr_all = wr_all.astype(value_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # packed x in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_p, g * C), lambda i, b: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tile_p, g * C), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((window, g * C), value_dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, lengths2, w1_all, b1_packed, w2_all, b2_packed, wr_all)
    return out.reshape(B, n_tiles * tile_p * g, C)[:, :T]


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
    interpret: bool | None = None,
    packing: int | None = None,  # None = auto: 1 if C%128==0 else 128//C
    precision: str | None = None,  # None=fast bf16 multiplies; "highest"=fp32
    value_dtype=None,  # VMEM value dtype: None = fp32 exact; bf16 halves traffic
) -> jax.Array:
    interpret = resolve_interpret(interpret)
    B, T, C = x.shape
    vd = jnp.float32 if value_dtype is None else jnp.dtype(value_dtype)
    if packing is None:
        if C % 128 == 0:
            packing = 1
        elif 128 % C == 0:
            packing = 128 // C
        else:
            raise ValueError(f"channels {C} neither multiple nor divisor of 128")
    if packing > 1:
        return _fused_resblock_packed(
            x, w1, b1, w2, b2, kernel_size=kernel_size,
            dilations=tuple(dilations), slope=slope, tile_t=tile_t,
            lengths=lengths, interpret=interpret, g=packing,
            precision=resolve_precision(precision),
            value_dtype=vd,
        )
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
    # Cast values and weights to vd INDEPENDENTLY: a bf16 input with
    # value_dtype=bf16 must still cast the fp32 weights (coupling the two
    # left fp32 weights against bf16 values in the kernel's dot).
    if xp.dtype != vd:
        xp = xp.astype(vd)
    if w1.dtype != vd:
        w1 = w1.astype(vd)
    if w2.dtype != vd:
        w2 = w2.astype(vd)

    kernel = functools.partial(
        _kernel,
        tile_t=tile_t,
        kernel_size=kernel_size,
        dilations=tuple(dilations),
        slope=slope,
        window=window,
        halo=halo,
        precision=resolve_precision(precision),
        value_dtype=vd,
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
            pltpu.VMEM((window, C), vd),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, lengths2, w1, b1, w2, b2)
    return out[:, :T]
