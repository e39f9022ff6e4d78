"""Trainable flash-style relative-position attention: forward + backward kernels.

Round 2 shipped the flash forward (ops/pallas/attention.py) for inference
only; training ran the XLA attention (round-2 verdict #4 asked for the
backward).  A recompute-based ``custom_vjp`` (Pallas forward + XLA
recompute pullback, the trio_grad.py recipe) would be strictly SLOWER than
plain XLA here — it adds a full extra XLA forward — so this module
implements the real thing, a FlashAttention-2-style backward with the VITS
relative-position terms:

  * the forward saves the per-row logsumexp ``lse`` (one extra (B,H,L)
    output of the same kernel), so the backward reconstructs exact
    probabilities blockwise as ``p = exp(s - lse)`` — no online softmax,
    no renormalization, and still nothing quadratic in HBM;
  * with ``D_i = dout_i . out_i`` (the standard row dot), the score
    gradient is ``ds = p * (dp - D)`` where
    ``dp_ij = dout_i . (v_j + 1(|j-i|<=w) rv[j-i+w])``;
  * the relative embeddings get their own gradients as tiny ``(2w+1, d)``
    accumulators:  ``drv[r] = sum_i p_{i,i+r-w} dout_i`` and
    ``drk[r] = sum_i ds_{i,i+r-w} q_i`` — the same side-accumulator trick
    the forward uses for the bias/value terms (delta-masked row sums, then
    one (nr, TQ) x (TQ, d) matmul per tile).

One backward kernel instance per (batch, head): K and V stay VMEM-resident
across the query tiles exactly like the forward, dK/dV accumulate in VMEM
scratch, dQ streams out per tile.  The kernel's gradients match
``jax.grad`` of the XLA module math at fp32 tolerance
(tests/test_trainable_attention.py).

Reference math being differentiated: /root/reference/src/vits.cpp:195-359
(relative-position attention); the training consumer is the text encoder
inside the VITS objective (train/step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.ops.pallas import (kernel_dot_general, resolve_interpret,
                                 resolve_precision)

from vits_tpu.ops.attention import (
    absolute_position_to_relative_position,
    get_relative_embeddings,
    relative_position_to_absolute_position,
)
from vits_tpu.ops.pallas.attention import flash_rel_attention


def xla_rel_attention(q, k, v, rel_k, rel_v, window, lengths=None):
    """The module path's math (encoder.py::_attention after projections).

    (B, H, L, d) in/out — the autodiff oracle the kernel gradients are
    pinned against, and the recompute fallback for odd shapes.
    """
    B, H, L, d = q.shape
    qf = q.reshape(B * H, L, d)
    kf = k.reshape(B * H, L, d)
    vf = v.reshape(B * H, L, d)
    w = jnp.einsum("bqd,bkd->bqk", qf, kf)
    key_rel = get_relative_embeddings(rel_k[None], L, window)
    rel_logits = jnp.einsum("bqd,rd->bqr", qf, key_rel[0])
    w = w + relative_position_to_absolute_position(rel_logits)
    if lengths is not None:
        neg = jnp.finfo(q.dtype).min
        keep = (jnp.arange(L)[None, :] < lengths[:, None]).astype(q.dtype)
        bias = (1.0 - keep[:, None, None, :]) * neg  # (B, 1, L, L)
        w = (w.reshape(B, H, L, L) + bias).reshape(B * H, L, L)
    w = jax.nn.softmax(w, axis=-1)
    out = jnp.einsum("bqk,bkd->bqd", w, vf)
    value_rel = get_relative_embeddings(rel_v[None], L, window)
    rel_w = absolute_position_to_relative_position(w)
    out = out + jnp.einsum("bqr,rd->bqd", rel_w, value_rel[0])
    return out.reshape(B, H, L, d)


def _attn_bwd_kernel(len_ref, q_ref, k_ref, v_ref, rk_ref, rv_ref,
                     dout_ref, rows_ref,
                     dq_ref, dk_ref, dv_ref, drk_ref, drv_ref,
                     dks, dvs, drks, drvs,
                     *, TQ, TK, L, d, w, precision):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qt = pl.program_id(2)
    n_q = pl.num_programs(2)
    qt0 = qt * TQ
    nr = 2 * w + 1

    def dot(a, bm, transpose_a=False, transpose_b=False):
        ca = ((0,) if transpose_a else (1,),)
        cb = ((1,) if transpose_b else (0,),)
        return kernel_dot_general(a, bm, ((ca[0], cb[0]), ((), ())), precision)

    @pl.when(qt == 0)
    def _init():
        dks[...] = jnp.zeros_like(dks)
        dvs[...] = jnp.zeros_like(dvs)
        drks[...] = jnp.zeros_like(drks)
        drvs[...] = jnp.zeros_like(drvs)

    q = q_ref[0, 0].astype(jnp.float32)       # (TQ, d)
    dout = dout_ref[0, 0].astype(jnp.float32)  # (TQ, d)
    rows = rows_ref[0, 0].astype(jnp.float32)  # (TQ, 128): col0 = D, col1 = lse
    D = jax.lax.slice_in_dim(rows, 0, 1, axis=1)    # (TQ, 1)
    lse = jax.lax.slice_in_dim(rows, 1, 2, axis=1)  # (TQ, 1)

    rk = rk_ref[:].astype(jnp.float32)       # (nr, d)
    rv = rv_ref[:].astype(jnp.float32)       # (nr, d)
    rl = dot(q, rk, transpose_b=True)        # (TQ, nr) rel logits
    dorv = dot(dout, rv, transpose_b=True)   # (TQ, nr) dout . rv[r]

    valid_keys = len_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 0) + qt0

    dq = jnp.zeros((TQ, d), jnp.float32)
    ds_rel = jnp.zeros((TQ, nr), jnp.float32)
    p_rel = jnp.zeros((TQ, nr), jnp.float32)

    for c in range(L // TK):
        kc0 = c * TK
        kk = jax.lax.slice_in_dim(k_ref[0, 0], kc0, kc0 + TK, axis=0).astype(jnp.float32)
        vv = jax.lax.slice_in_dim(v_ref[0, 0], kc0, kc0 + TK, axis=0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 1) + kc0
        delta = col - row

        # recompute scores exactly as the forward did
        s = dot(q, kk, transpose_b=True)
        for r in range(nr):
            s = s + jnp.where(delta == r - w,
                              jax.lax.slice_in_dim(rl, r, r + 1, axis=1), 0.0)
        p = jnp.where(col < valid_keys, jnp.exp(s - lse), 0.0)  # exact probs

        # dp_ij = dout_i . (v_j + rv[j-i+w])
        dp = dot(dout, vv, transpose_b=True)
        for r in range(nr):
            dp = dp + jnp.where(delta == r - w,
                                jax.lax.slice_in_dim(dorv, r, r + 1, axis=1), 0.0)
        ds = p * (dp - D)

        dq = dq + dot(ds, kk)
        dks[pl.ds(kc0, TK), :] += dot(ds, q, transpose_a=True)
        dvs[pl.ds(kc0, TK), :] += dot(p, dout, transpose_a=True)

        # delta-masked row sums feeding the rel-embedding gradients
        # (concatenated columns — Mosaic has no scatter-add)
        ds_rel = ds_rel + jnp.concatenate(
            [jnp.sum(jnp.where(delta == r - w, ds, 0.0), axis=1, keepdims=True)
             for r in range(nr)], axis=1)
        p_rel = p_rel + jnp.concatenate(
            [jnp.sum(jnp.where(delta == r - w, p, 0.0), axis=1, keepdims=True)
             for r in range(nr)], axis=1)

    dq = dq + dot(ds_rel, rk)          # bias-term contribution to dq
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    drks[...] += dot(ds_rel, q, transpose_a=True)   # (nr, d)
    drvs[...] += dot(p_rel, dout, transpose_a=True)

    @pl.when(qt == n_q - 1)
    def _flush():
        dk_ref[0, 0] = dks[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dvs[...].astype(dv_ref.dtype)
        drk_ref[0, 0] = drks[...].astype(drk_ref.dtype)
        drv_ref[0, 0] = drvs[...].astype(drv_ref.dtype)


def _flash_bwd(q, k, v, rel_k, rel_v, out, lse, dout, *, window, lengths,
               tile_q, tile_k, interpret, precision):
    B, H, L, d = q.shape
    nr = 2 * window + 1
    in_dtype = q.dtype

    TQ = min(tile_q, max(8, L))
    Lp = -(-L // TQ) * TQ
    TK = min(tile_k, Lp)
    while Lp % TK:
        TK //= 2
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v, out = (jnp.pad(t, pad) for t in (q, k, v, out))
        dout = jnp.pad(dout, pad)  # zero dout rows kill padded-query terms
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, Lp - L)))

    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    len2 = lengths.astype(jnp.int32).reshape(B, 1)

    # per-row residuals packed into one (…, 128) block: col0 = D_i =
    # dout_i . out_i (the softmax-grad row dot), col1 = lse_i
    Drow = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1, keepdims=True)
    rows = jnp.concatenate([Drow, lse.astype(jnp.float32)[..., None]], axis=-1)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, 126)))

    kernel = functools.partial(
        _attn_bwd_kernel, TQ=TQ, TK=TK, L=Lp, d=d, w=window,
        precision=resolve_precision(precision),
    )
    dq, dk, dv, drk, drv = pl.pallas_call(
        kernel,
        grid=(B, H, Lp // TQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # lengths
            pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),       # q tile
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),       # k resident
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),       # v resident
            pl.BlockSpec(memory_space=pltpu.VMEM),       # rel_k
            pl.BlockSpec(memory_space=pltpu.VMEM),       # rel_v
            pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),       # dout tile
            pl.BlockSpec((1, 1, TQ, 128), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),       # (D, lse) rows
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nr, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nr, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lp, d), in_dtype),
            jax.ShapeDtypeStruct((B, H, Lp, d), in_dtype),
            jax.ShapeDtypeStruct((B, H, Lp, d), in_dtype),
            jax.ShapeDtypeStruct((B, H, nr, d), jnp.float32),
            jax.ShapeDtypeStruct((B, H, nr, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Lp, d), jnp.float32),       # dk accum
            pltpu.VMEM((Lp, d), jnp.float32),       # dv accum
            pltpu.VMEM((nr, d), jnp.float32),       # drk accum
            pltpu.VMEM((nr, d), jnp.float32),       # drv accum
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(len2, q, k, v, rel_k, rel_v, dout, rows)

    dq = dq[:, :, :L].astype(in_dtype)
    dk = dk[:, :, :L].astype(in_dtype)
    dv = dv[:, :, :L].astype(in_dtype)
    drk = jnp.sum(drk, axis=(0, 1)).astype(rel_k.dtype)   # (nr, d)
    drv = jnp.sum(drv, axis=(0, 1)).astype(rel_v.dtype)
    return dq, dk, dv, drk, drv


@functools.lru_cache(maxsize=None)
def make_trainable_attention(
    *,
    window: int,
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: bool | None = None,
    precision: str | None = None,
):
    """Differentiable flash rel-attention: f(q, k, v, rel_k, rel_v, lengths).

    Shapes as :func:`flash_rel_attention`; ``lengths`` may be ``None`` (full
    keys) or an int (B,) array.  ``jax.grad`` through the result matches XLA
    autodiff of :func:`xla_rel_attention` to fp32 tolerance.
    """
    interpret = resolve_interpret(interpret)

    @jax.custom_vjp
    def attn(q, k, v, rel_k, rel_v, lengths):
        return flash_rel_attention(
            q, k, v, rel_k, rel_v, window=window, lengths=lengths,
            tile_q=tile_q, tile_k=tile_k, interpret=interpret,
            precision=precision)

    def fwd(q, k, v, rel_k, rel_v, lengths):
        out, lse = flash_rel_attention(
            q, k, v, rel_k, rel_v, window=window, lengths=lengths,
            tile_q=tile_q, tile_k=tile_k, interpret=interpret,
            precision=precision, return_lse=True)
        return out, (q, k, v, rel_k, rel_v, lengths, out, lse)

    def bwd(res, g):
        q, k, v, rel_k, rel_v, lengths, out, lse = res
        dq, dk, dv, drk, drv = _flash_bwd(
            q, k, v, rel_k, rel_v, out, lse, g, window=window,
            lengths=lengths, tile_q=tile_q, tile_k=tile_k,
            interpret=interpret, precision=precision)
        dlen = (None if lengths is None
                else np.zeros(lengths.shape, jax.dtypes.float0))
        return dq, dk, dv, drk, drv, dlen

    attn.defvjp(fwd, bwd)
    return attn
