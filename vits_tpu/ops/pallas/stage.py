"""Fused HiFiGAN *stage* kernel: leaky -> conv-transpose upsample -> 3 resblocks.

One vocoder stage (vits.cpp:583-644 loop body / HF VitsHifiGan) is
    h = leaky_relu(h); h = conv_transpose(h); h = mean_j resblock_j(h)
XLA executes that as dozens of HBM-round-tripping convs; at the narrow tail
stages it also wastes most MXU lanes (C=64: 8% MFU, C=32: 2.6% —
BENCH_DETAIL.json).  This kernel keeps the whole stage in VMEM per time tile:
one input DMA, the transpose-conv as packed shift-matmuls, all three resblock
pair-chains on the VMEM-resident upsampled window, one output write — ~2 HBM
passes per stage, full 128-lane occupancy via time-packing.

Applicability (asserted): 128 % C_in == 0, 128 % C_out == 0 and
g_out == stride * g_in  (g = 128/C) — true for the MMS tail stages
(128->64 and 64->32, stride 2).  Wide stages keep XLA's conv_transpose +
the per-resblock fused kernel.

Packing algebra for the transpose conv (kernel layout (k, C_in, C_out),
already spatially reversed; torch output semantics via input dilation with
pad' = k-1-padding, see ops/conv.py::conv_transpose1d): output position
v = g_out*R + sigma draws tap j from input step (v - HO - pad' + tap)/s when
divisible — with g_out = s*g_in the input packed row advances 1:1 with the
output packed row, so each (sigma, tap) lands in block (step % g_in, sigma)
of packed shift matrix (step // g_in).  HO (the resblock phase's left halo,
in output steps) must be divisible by s; it is (all resblock halos are even).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.ops.pallas import kernel_dot, resolve_interpret, resolve_precision

from vits_tpu.ops.pallas.resblock import (
    _leaky,
    _materialize_pairs,
    _pairs_plan,
    _run_pairs,
    _shift_matmul,
    total_halo,
)


def _transpose_plan(k, g_in, g_out, stride, pad_eff, ho, hi):
    """Static plan for packed transpose-conv shift matrices.

    Entry for output slot sigma, tap j: m = sigma + j - ho - pad_eff;
    contributes iff m % s == 0, from relative input step m//s + hi ->
    packed row shift q, slot p.
    """
    entries = []
    for sigma in range(g_out):
        for j in range(k):
            m = sigma + j - ho - pad_eff
            if m % stride != 0:
                continue
            step = m // stride + hi
            assert step >= 0, (sigma, j, step)
            q, p = divmod(step, g_in)
            entries.append((q, p, sigma, j))
    shift_set = sorted({q for q, _, _, _ in entries})
    index = {q: i for i, q in enumerate(shift_set)}
    return tuple(shift_set), tuple(
        (index[q], p, sigma, j) for q, p, sigma, j in entries)


def _materialize_transpose(w, entries, n_mats, g_in, g_out, c_in, c_out):
    out = jnp.zeros((n_mats, g_in * c_in, g_out * c_out), jnp.float32)
    for m, p, sigma, j in entries:
        out = out.at[
            m, p * c_in : (p + 1) * c_in, sigma * c_out : (sigma + 1) * c_out
        ].add(w[j].astype(jnp.float32))
    return out


def _wave_plan(k, g_out, padding):
    """Static plan for the fused conv_post row-shift matrices.

    Wave sample (row r, slot sigma) draws stage-output step g_out*r + sigma +
    j - padding = row r + q, slot p where (q, p) = divmod(sigma + j - padding,
    g_out).
    """
    entries = []
    for sigma in range(g_out):
        for j in range(k):
            q, p = divmod(sigma + j - padding, g_out)
            entries.append((q, p, sigma, j))
    shift_set = sorted({q for q, _, _, _ in entries})
    index = {q: i for i, q in enumerate(shift_set)}
    return tuple(shift_set), tuple(
        (index[q], p, sigma, j) for q, p, sigma, j in entries)


def _materialize_wave(w, entries, n_mats, g_out, c_out):
    out = jnp.zeros((n_mats, g_out * c_out, g_out), jnp.float32)
    for m, p, sigma, j in entries:
        out = out.at[m, p * c_out : (p + 1) * c_out, sigma].add(
            w[j, :, 0].astype(jnp.float32)
        )
    return out


def _stage_kernel(x_hbm, len_ref, wu_ref, bu_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  wr_ref, *rest, tile_p, window_in, rows_u,
                  g_out, c_out, ho, slope, u_shifts, blocks, inv_blocks,
                  wave=None, precision=None, value_dtype=jnp.float32,
                  quantized=False):
    rest = list(rest)
    wq_ref = rest.pop(0) if wave is not None else None
    su_ref = s1_ref = s2_ref = sq_ref = None
    if quantized:
        su_ref = rest.pop(0)
        s1_ref = rest.pop(0)
        s2_ref = rest.pop(0)
        if wave is not None:
            sq_ref = rest.pop(0)
    if wave is None:
        out_ref, xwin, sem = rest
    else:
        wf_ref, xwin, sem = rest
    i = pl.program_id(0)
    b = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_p, window_in), :], xwin, sem
    )
    dma.start()
    dma.wait()

    valid_out = len_ref[b, 0]  # in OUTPUT (upsampled) steps

    def slot_mask(rows, base):
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, g_out * c_out), 0) * g_out
            + jax.lax.broadcasted_iota(jnp.int32, (rows, g_out * c_out), 1) // c_out
            + (g_out * i * tile_p + base)
        )
        return (pos >= ho) & (pos < ho + valid_out)

    # --- leaky + transpose-conv upsample (packed shift-matmuls) ----------- #
    xin = xwin[:]
    h = _leaky(xin, slope)
    xu = _shift_matmul(h, u_shifts, wu_ref, 0, rows_u, precision)
    if su_ref is not None:
        xu = xu * su_ref[0][None, :]
    xu = xu + bu_ref[0][None, :]
    xu = jnp.where(slot_mask(rows_u, 0), xu, 0.0).astype(value_dtype)

    # --- three resblock pair-chains on the SAME VMEM window --------------- #
    # With a fused final conv, keep `halo_rows` extra rows on each side of the
    # tile: the conv's +-padding steps live in the neighbor rows.
    hw = 0 if wave is None else wave["halo_rows"]
    keep = tile_p + 2 * hw
    acc = None
    for blk in blocks:
        xb, _, _ = _run_pairs(
            xu, rows_u, 0, blk["pairs"], w1_ref, b1_ref, w2_ref, b2_ref,
            wr_ref, slot_mask, slope, precision, value_dtype,
            s1_ref=s1_ref, s2_ref=s2_ref,
        )
        off = blk["align_off"] - hw
        xb = jax.lax.slice_in_dim(xb, off, off + keep, axis=0).astype(jnp.float32)
        acc = xb if acc is None else acc + xb
    acc = acc * inv_blocks

    if wave is None:
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    # --- fused conv_post: leaky(0.01) -> k-tap conv -> tanh -> mask ------- #
    # acc rows cover tile steps [-hw .. tile_p+hw); wave sample (row r,
    # slot s) = tanh(sum_q shift_q(leaky(acc)) @ Wq), masked to valid_out.
    hl = jnp.where(acc >= 0, acc, acc * 0.01).astype(value_dtype)
    yw = None
    for qi, q in enumerate(wave["shifts"]):
        piece = jax.lax.slice_in_dim(hl, q + hw, q + hw + tile_p, axis=0)
        w = wq_ref[qi]
        if w.dtype != piece.dtype:
            w = w.astype(piece.dtype)
        term = kernel_dot(piece, w, precision)
        yw = term if yw is None else yw + term
    if sq_ref is not None:
        yw = yw * sq_ref[0][None, :]
    yw = jnp.tanh(yw)  # (tile_p, g_out)
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_p, g_out), 0) * g_out
        + jax.lax.broadcasted_iota(jnp.int32, (tile_p, g_out), 1)
        + g_out * i * tile_p
    )
    yw = jnp.where(pos < valid_out, yw, 0.0)
    wf_ref[0] = yw.astype(wf_ref.dtype)


def _stage_plan(rb_meta, k_up, stride, up_padding, C_in, C_out, final=None):
    """All static structure for one fused stage.

    ``rb_meta``: tuple of (kernel_size, dilations) per resblock; ``final``:
    (k_w, padding) when conv_post is fused.  Deterministic in these inputs,
    so load-time packing (pack_stage_arrays) and trace-time use agree.
    """
    g_in, g_out = 128 // C_in, 128 // C_out
    pad_eff = k_up - 1 - up_padding
    halos = [total_halo(k, tuple(ds)) for k, ds in rb_meta]
    ho = max(halos)
    wave = None
    if final is not None:
        k_w, wf_pad = final
        # conv halo in packed rows; every block must keep that many spare
        # rows on BOTH sides of its tile slice -> bump the global halo.
        hw = max(-(-wf_pad // g_out), -(-(k_w - 1 - wf_pad) // g_out))
        ho += hw * g_out
        wq_shifts, wq_entries = _wave_plan(k_w, g_out, wf_pad)
        wave = {"halo_rows": hw, "shifts": wq_shifts, "entries": wq_entries}
    assert ho % stride == 0 and all((ho - h) % g_out == 0 for h in halos)

    blocks, plans = [], []
    n1 = n2 = nr = npairs = 0
    for (k, ds), h_k in zip(rb_meta, halos):
        pairs, plan = _pairs_plan(
            k, tuple(ds), g_out, C_out,
            idx_base=npairs, w1_base=n1, w2_base=n2, wr_base=nr,
        )
        for p_, st in zip(pairs, plan):
            n1 += st["n1"]
            n2 += st["n2"]
            if st["res"] is not None:
                nr += len(p_["sr"])
        npairs += len(pairs)
        plans.append(plan)
        blocks.append({
            "pairs": pairs,
            "consumed": sum(p["consumed"] for p in pairs),
            "align_off": (ho - h_k) // g_out,
        })

    hi = -(-(ho + pad_eff) // stride)  # input-step left margin for the convT
    hi = -(-hi // g_in) * g_in  # row-aligned so packed input can be row-padded
    u_shifts, u_entries = _transpose_plan(
        k_up, g_in, g_out, stride, pad_eff, ho, hi)
    return {
        "g_in": g_in, "g_out": g_out, "ho": ho, "hi": hi,
        "blocks": blocks, "plans": plans, "wave": wave,
        "u_shifts": u_shifts, "u_entries": u_entries,
        "C_in": C_in, "C_out": C_out,
    }


def _materialize_stage(meta, up_weight, up_bias, resblocks, final_w=None):
    """Build every packed weight array a _stage_plan describes.

    Traceable, but run it ONCE at load time where possible — in-trace the
    scatters re-execute on every dispatch (pack_stage_arrays is the
    load-time entry; models/hifigan.py precomputes via it).
    """
    g_out, C_in, C_out = meta["g_out"], meta["C_in"], meta["C_out"]
    w1_mats, w2_mats, wr_mats, b1_rows, b2_rows = [], [], [], [], []
    for rb, plan in zip(resblocks, meta["plans"]):
        m1, m2, mr, b1p, b2p = _materialize_pairs(
            plan, rb["w1"], rb["b1"], rb["w2"], rb["b2"], g_out, C_out)
        w1_mats += m1
        w2_mats += m2
        wr_mats += mr
        b1_rows.extend(b1p)
        b2_rows.extend(b2p)
    out = {
        "w1_all": jnp.concatenate(w1_mats, axis=0),
        "w2_all": jnp.concatenate(w2_mats, axis=0),
        "wr_all": (jnp.concatenate(wr_mats, axis=0) if wr_mats
                   else jnp.zeros((1, 128, 128), jnp.float32)),
        "b1_all": jnp.stack(b1_rows),
        "b2_all": jnp.stack(b2_rows),
        "wu": _materialize_transpose(
            up_weight, meta["u_entries"], len(meta["u_shifts"]),
            meta["g_in"], g_out, C_in, C_out),
        "bu": jnp.tile(up_bias.astype(jnp.float32), g_out)[None, :],
    }
    if meta["wave"] is not None:
        out["wq"] = _materialize_wave(
            final_w, meta["wave"]["entries"],
            len(meta["wave"]["shifts"]), g_out, C_out)
    return out


def _quantize_group(mats, slots: int = 1):
    """(n, R, cols) fp32 -> int8 + one fp32 scale per column.

    ``slots``: packed-layout column structure cols == slots * C (slot-major).
    The scale is computed per OUT-CHANNEL (max over all slots that carry it)
    and broadcast back per column, so the scheme is numerically identical to
    the classic raw-weight per-out-channel symmetric quantization
    (io/quantize.py) — pinned by the tests against an XLA reference running
    channel-dequantized raw weights."""
    absmax = jnp.max(jnp.abs(mats), axis=(0, 1))
    if slots > 1:
        c = absmax.shape[0] // slots
        absmax = jnp.tile(jnp.max(absmax.reshape(slots, c), axis=0), slots)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(mats / scale[None, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_stage_arrays(arrays: dict, meta: dict) -> dict:
    """int8-quantize the packed MXU weights; dequant rides the accumulator.

    Sum-groups (the matrices whose partial products land in ONE fp32
    accumulator) must share scales: each resblock pair's conv is one group,
    the transpose-conv is one group, the fused conv_post is one group.  The
    residual block-permutation matrices (wr_all: exact 0/1 entries) stay in
    bf16 — quantizing identities buys nothing.
    """
    out = dict(arrays)
    pairs = [pr for blk in meta["blocks"] for pr in blk["pairs"]]
    npairs = len(pairs)
    gc = arrays["w1_all"].shape[1]
    g_out = gc // meta["C_out"]
    for w_key, start_key, shifts_key, s_key in (
        ("w1_all", "w1_start", "s1", "s1"),
        ("w2_all", "w2_start", "s2", "s2"),
    ):
        mats = arrays[w_key]
        q_parts, scales = [], [None] * npairs
        for pr in sorted(pairs, key=lambda p: p[start_key]):
            seg = mats[pr[start_key] : pr[start_key] + len(pr[shifts_key])]
            q, s = _quantize_group(seg, slots=g_out)
            q_parts.append(q)
            scales[pr["idx"]] = s
        out[w_key] = jnp.concatenate(q_parts, axis=0)
        out[s_key] = jnp.stack(scales)  # (npairs, gC), indexed by pr["idx"]
        assert out[w_key].shape == mats.shape and out[s_key].shape == (npairs, gc)
    qu, su = _quantize_group(arrays["wu"], slots=g_out)
    out["wu"], out["su"] = qu, su[None, :]
    if "wq" in arrays:
        qq, sq = _quantize_group(arrays["wq"], slots=g_out)
        out["wq"], out["sq"] = qq, sq[None, :]
    out["wr_all"] = arrays["wr_all"].astype(jnp.bfloat16)
    return out


def pack_stage_arrays(
    up_weight, up_bias, resblocks, *, stride, up_padding, final_conv=None,
    weight_format: str = "float32",  # "float32" | "bfloat16" | "int8"
) -> dict:
    """Load-time packing: the arrays fused_stage(arrays=...) consumes.

    Call OUTSIDE jit (eagerly, on concrete weights) so the shift-matrix
    scatters run once instead of on every dispatch.  ``weight_format``
    controls the HBM/VMEM bytes per packed entry: "bfloat16" halves weight
    traffic (fp32 accumulation on the MXU is unchanged); "int8" quarters it
    and adds per-column ``su``/``s1``/``s2``(/``sq``) scale rows that the
    kernel applies to the fp32 accumulators (the packed layout makes
    per-column == per-out-channel, matching io/quantize.py's scheme).
    """
    k_up, C_in, C_out = up_weight.shape
    meta = _stage_plan(
        tuple((rb["kernel_size"], tuple(rb["dilations"])) for rb in resblocks),
        k_up, stride, up_padding, C_in, C_out,
        final=(None if final_conv is None
               else (final_conv[0].shape[0], final_conv[1])),
    )
    arrays = _materialize_stage(
        meta, up_weight, up_bias, resblocks,
        None if final_conv is None else final_conv[0])
    if weight_format == "bfloat16":
        for key in ("wu", "w1_all", "w2_all", "wr_all", "wq"):
            if key in arrays:
                arrays[key] = arrays[key].astype(jnp.bfloat16)
    elif weight_format == "int8":
        arrays = _quantize_stage_arrays(arrays, meta)
    elif weight_format != "float32":
        raise ValueError(f"unknown weight_format {weight_format!r}")
    return arrays


def fused_stage(
    x: jax.Array,  # (B, T_in, C_in) stage input (pre-leaky)
    up_weight: jax.Array,  # (k_up, C_in, C_out) spatially-reversed (loader layout)
    up_bias: jax.Array,  # (C_out,)
    *,
    stride: int,
    up_padding: int,
    resblocks: Sequence[dict],  # per block: {w1, b1, w2, b2, kernel_size, dilations}
    slope: float,
    tile_t: int = 2048,
    lengths: jax.Array | None = None,  # (B,) valid INPUT steps
    interpret: bool | None = None,
    precision: str | None = None,  # None=fast bf16 multiplies; "highest"=fp32
    packed_in: int | None = None,  # logical T_in when x is ALREADY packed (B, R, 128)
    packed_out: bool = False,  # skip the unpack reshape; return (B, rows, 128)
    arrays: dict | None = None,  # pre-packed weights from pack_stage_arrays
    #   (int8-format arrays carry su/s1/s2/sq scale rows; detected here)
    final_conv: tuple | None = None,  # (weight (k, C_out, 1), padding): fuse
    #   leaky(0.01) -> conv_post -> tanh -> mask and return the WAVEFORM
    #   (B, T_out) instead of the stage output (terminal stage only).
    value_dtype=None,  # VMEM value dtype: None = fp32 (exact parity mode);
    #   jnp.bfloat16 halves window traffic + sublane-relayout bytes
) -> jax.Array:
    """One fused vocoder stage.

    Returns (B, T_in*stride, C_out) by default; the packed (B, rows, 128)
    layout with ``packed_out`` (chainable directly into the next fused
    stage's ``packed_in`` — the layouts coincide because
    g_in(next) = 128/C_out = g_out(this)); or the final waveform (B, T_out)
    with ``final_conv``.
    """
    interpret = resolve_interpret(interpret)
    if packed_in is not None:
        B, R_in, lanes = x.shape
        assert lanes == 128, x.shape
        T_in = packed_in
        C_in = up_weight.shape[1]
    else:
        B, T_in, C_in = x.shape
    k_up, _, C_out = up_weight.shape
    assert 128 % C_in == 0 and 128 % C_out == 0, (C_in, C_out)
    g_in, g_out = 128 // C_in, 128 // C_out
    assert g_out == stride * g_in, (g_in, g_out, stride)
    T_out = T_in * stride
    pad_eff = k_up - 1 - up_padding  # input-dilated-conv padding (ops/conv.py)

    meta = _stage_plan(
        tuple((rb["kernel_size"], tuple(rb["dilations"])) for rb in resblocks),
        k_up, stride, up_padding, C_in, C_out,
        final=(None if final_conv is None
               else (final_conv[0].shape[0], final_conv[1])),
    )
    ho, hi = meta["ho"], meta["hi"]
    blocks, wave, u_shifts = meta["blocks"], meta["wave"], meta["u_shifts"]
    vd = jnp.float32 if value_dtype is None else jnp.dtype(value_dtype)
    if arrays is None:
        arrays = _materialize_stage(
            meta, up_weight, up_bias, resblocks,
            None if final_conv is None else final_conv[0])
        if vd != jnp.float32:
            arrays = {
                k: (v.astype(vd) if k in ("wu", "w1_all", "w2_all", "wr_all", "wq")
                    else v)
                for k, v in arrays.items()
            }
    quantized = "su" in arrays
    wu, bu = arrays["wu"], arrays["bu"]
    w1_all, b1_all = arrays["w1_all"], arrays["b1_all"]
    w2_all, b2_all = arrays["w2_all"], arrays["b2_all"]
    wr_all = arrays["wr_all"]
    wq = arrays.get("wq")

    # --- tiling ------------------------------------------------------------- #
    rows_out_needed = -(-T_out // g_out)
    tile_p = min(tile_t, max(8, rows_out_needed))
    tile_p = -(-tile_p // 8) * 8
    n_tiles = -(-rows_out_needed // tile_p)
    u_extra = max(b["consumed"] + b["align_off"] for b in blocks)
    if wave is not None:
        u_extra += wave["halo_rows"]  # tail rows for the conv_post halo
    rows_u = tile_p + u_extra
    window_in = rows_u + max(u_shifts)
    window_in = -(-window_in // 8) * 8  # sublane-aligned DMA

    # input padding: hi steps front; back so every tile's DMA window exists
    in_rows_total = (n_tiles - 1) * tile_p + window_in
    if packed_in is not None:
        front_rows = hi // g_in
        pad_rows = in_rows_total - front_rows - R_in
        xp = jnp.pad(x, ((0, 0), (front_rows, max(0, pad_rows)), (0, 0)))
        xp = xp[:, :in_rows_total]
    else:
        len_in_padded = g_in * in_rows_total
        pad_back = len_in_padded - T_in - hi
        assert pad_back >= 0, (len_in_padded, T_in, hi)
        xp = jnp.pad(x, ((0, 0), (hi, pad_back), (0, 0)))
        xp = xp.reshape(B, in_rows_total, g_in * C_in)
    if vd != xp.dtype:
        xp = xp.astype(vd)  # XLA-side cast: window DMA rides at vd bytes

    if lengths is None:
        lengths = jnp.full((B,), T_in, jnp.int32)
    len_out = (lengths.astype(jnp.int32) * stride).reshape(B, 1)

    kernel = functools.partial(
        _stage_kernel,
        tile_p=tile_p, window_in=window_in, rows_u=rows_u,
        g_out=g_out, c_out=C_out, ho=ho, slope=slope,
        u_shifts=u_shifts, blocks=tuple(blocks),
        inv_blocks=1.0 / len(blocks), wave=wave,
        precision=resolve_precision(precision),
        value_dtype=vd, quantized=quantized,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
    inputs = [xp, len_out, wu, bu, w1_all, b1_all, w2_all, b2_all, wr_all]
    if wave is not None:
        inputs.append(wq)
    if quantized:
        inputs += [arrays["su"], arrays["s1"], arrays["s2"]]
        if wave is not None:
            inputs.append(arrays["sq"])
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(inputs) - 9)
    # Non-chained stage outputs stay fp32 for the XLA consumers; the packed
    # carry between chained fused stages rides the value dtype.
    out_dtype = vd if packed_out else jnp.float32
    if wave is None:
        out_specs = pl.BlockSpec(
            (1, tile_p, g_out * C_out), lambda i, b: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (B, n_tiles * tile_p, g_out * C_out), out_dtype)
    else:
        # (rows, g_out) lanes: Mosaic cannot re-mix sublanes into lanes
        # in-kernel, so the sample-major flatten happens host-side.
        out_specs = pl.BlockSpec(
            (1, tile_p, g_out), lambda i, b: (b, i, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (B, n_tiles * tile_p, g_out), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles, B),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((window_in, g_in * C_in), vd),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)
    if wave is not None:
        return out.reshape(B, -1)[:, :T_out]
    if packed_out:
        return out
    return out.reshape(B, n_tiles * tile_p * g_out, C_out)[:, :T_out]
