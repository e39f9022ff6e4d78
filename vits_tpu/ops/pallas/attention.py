"""Flash-style fused VITS relative-position attention.

The XLA path (models/encoder.py::_attention + ops/attention.py shuffles,
mirroring /root/reference/src/vits.cpp:195-359) materializes (BH, L, L)
scores, (BH, L, 2L-1) relative logits and their pad/reshape shuffles in HBM —
at L=2048 that is ~30 MB x ~10 tensors per layer and profiles at ~27 ms for
the 6-layer encoder (1% MFU; BENCH_DETAIL stage_breakdown).  This kernel
computes attention block-wise with an online softmax so NOTHING quadratic
ever touches HBM, and folds both relative-position terms in:

  * bias term: scores[i,j] += q[i]·rk[j-i+w] for |j-i| <= w (zero outside —
    exactly what the zero-padded ``get_relative_embeddings`` produces).  Per
    query tile this is one (TQ, d) @ (d, 2w+1) matmul plus 2w+1 masked adds.
  * value term: out[i] += sum_d probs[i, i+d] · rv[d+w].  Tracked as a tiny
    (TQ, 2w+1) accumulator rescaled alongside the flash softmax state.

K and V for one (batch, head) stay VMEM-resident across the query tiles
(d=96: ~1.5 MB at L=4096), so HBM traffic is O(L·d) instead of O(L²).

Equivalence vs the XLA module math is pinned by tests/test_pallas_attention.py
(interpret mode on CPU, compiled on TPU), including key masking and edge
queries where the relative window clips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.ops.pallas import (kernel_dot_general, resolve_interpret,
                                 resolve_precision)


def _attn_kernel(len_ref, q_ref, k_ref, v_ref, rk_ref, rv_ref, out_ref,
                 *maybe_lse, TQ, TK, L, d, w, neg, precision):
    b = pl.program_id(0)
    qt = pl.program_id(2)
    qt0 = qt * TQ

    def dot(a, bm, transpose_b=False):
        dn = (((1,), (1,)), ((), ())) if transpose_b else (((1,), (0,)), ((), ()))
        return kernel_dot_general(a, bm, dn, precision)

    q = q_ref[0, 0].astype(jnp.float32)  # (TQ, d)
    rk = rk_ref[:].astype(jnp.float32)   # (2w+1, d)
    rl = dot(q, rk, transpose_b=True)    # (TQ, 2w+1) rel logits

    valid_keys = len_ref[b, 0]
    n_chunks = L // TK
    nr = 2 * w + 1

    row = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 0) + qt0  # query idx i
    m = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((TQ, 1), jnp.float32)
    acc = jnp.zeros((TQ, d), jnp.float32)
    racc = jnp.zeros((TQ, nr), jnp.float32)

    for c in range(n_chunks):
        kc0 = c * TK
        kk = jax.lax.slice_in_dim(k_ref[0, 0], kc0, kc0 + TK, axis=0).astype(jnp.float32)
        vv = jax.lax.slice_in_dim(v_ref[0, 0], kc0, kc0 + TK, axis=0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 1) + kc0  # key idx j
        delta = col - row

        s = dot(q, kk, transpose_b=True)  # (TQ, TK)
        for r in range(nr):
            s = s + jnp.where(delta == r - w,
                              jax.lax.slice_in_dim(rl, r, r + 1, axis=1), 0.0)
        # additive key mask, exactly like the module's attn_bias
        s = s + jnp.where(col < valid_keys, 0.0, neg)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + dot(p, vv)
        rsums = [
            jnp.sum(jnp.where(delta == r - w, p, 0.0), axis=1, keepdims=True)
            for r in range(nr)
        ]
        racc = racc * alpha + jnp.concatenate(rsums, axis=1)
        m = m_new

    inv_l = 1.0 / l
    out = acc * inv_l + dot(racc * inv_l, rv_ref[:].astype(jnp.float32))
    out_ref[0, 0] = out.astype(out_ref.dtype)
    if maybe_lse:
        # row logsumexp — the flash-backward residual (attention_grad.py):
        # exp(s - lse) reconstructs the exact probabilities blockwise.
        maybe_lse[0][0, 0] = (m + jnp.log(l)).astype(jnp.float32)


def flash_rel_attention(
    q: jax.Array,  # (B, H, L, d) — ALREADY scaled by 1/sqrt(d)
    k: jax.Array,  # (B, H, L, d)
    v: jax.Array,  # (B, H, L, d)
    rel_k: jax.Array,  # (2w+1, d)
    rel_v: jax.Array,  # (2w+1, d)
    *,
    window: int,
    lengths: jax.Array | None = None,  # (B,) valid key counts
    tile_q: int = 256,
    tile_k: int = 512,
    interpret: bool | None = None,
    precision: str | None = None,
    return_lse: bool = False,
) -> jax.Array:
    """Returns (B, H, L, d) attention output (before out-projection).

    With ``return_lse`` also returns the per-row logsumexp (B, H, L) —
    the residual the flash backward needs (ops/pallas/attention_grad.py).
    """
    interpret = resolve_interpret(interpret)
    B, H, L, d = q.shape
    in_dtype = q.dtype
    neg = float(jnp.finfo(in_dtype).min)

    TQ = min(tile_q, max(8, L))
    Lp = -(-L // TQ) * TQ
    TK = min(tile_k, Lp)
    while Lp % TK:
        TK //= 2
    if Lp != L:
        pad = ((0, 0), (0, 0), (0, Lp - L), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    if lengths is None:
        lengths = jnp.full((B,), L, jnp.int32)
    len2 = lengths.astype(jnp.int32).reshape(B, 1)

    kernel = functools.partial(
        _attn_kernel, TQ=TQ, TK=TK, L=Lp, d=d, w=window, neg=neg,
        precision=resolve_precision(precision),
    )
    out_specs = [pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, H, Lp, d), in_dtype)]
    if return_lse:
        # trailing singleton keeps the block shape Mosaic-tileable (TQ, 1)
        out_specs.append(pl.BlockSpec((1, 1, TQ, 1), lambda b, h, t: (b, h, t, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, H, Lp, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, H, Lp // TQ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TQ, d), lambda b, h, t: (b, h, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lp, d), lambda b, h, t: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if return_lse else out_specs[0],
        out_shape=out_shape if return_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(len2, q, k, v, rel_k, rel_v)
    if return_lse:
        return outs[0][:, :, :L], outs[1][:, :, :L, 0]
    return outs[:, :, :L]
