"""TPU-friendly 1-D conv primitives in (batch, time, channels) layout.

The reference routes every conv through an im2col + mul_mat custom CPU op
(/root/reference/src/include/custom-ops.h:680-694) and loops channels for
depthwise convs (/root/reference/src/vits.cpp:144-169).  On TPU none of that is
hand-written: ``lax.conv_general_dilated`` lowers to MXU convolutions, the NTC
layout keeps channels on the 128-wide lane axis, 1x1 convs become plain matmuls,
depthwise convs use ``feature_group_count``, and transposed convs
(/root/reference/src/vits.cpp:178-193) are expressed as input-dilated regular
convs so XLA picks its best implementation.

Kernels arrive in HIO layout ``(k, in/groups, out)`` (see
:mod:`vits_tpu.io.params`); conv-transpose kernels are pre-flipped at load so
they are literally regular-conv kernels here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHC", "HIO", "NHC")  # (batch, time, chan) x (k, in, out)


def conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """SAME-as-torch Conv1d. x: (B, T, C_in), kernel: (k, C_in/groups, C_out)."""
    k = kernel.shape[0]
    if isinstance(padding, int):
        padding = (padding, padding)
    if k == 1 and stride == 1 and dilation == 1 and groups == 1:
        out = jnp.einsum("btc,cd->btd", x, kernel[0])
    else:
        out = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(stride,),
            padding=(padding,),
            rhs_dilation=(dilation,),
            dimension_numbers=_DN,
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias
    return out


def depthwise_conv1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """Depthwise conv (groups == channels). kernel: (k, 1, C)."""
    return conv1d(
        x, kernel, bias, padding=padding, dilation=dilation, groups=x.shape[-1]
    )


def conv_transpose1d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int,
    padding: int = 0,
    method: str = "dilated",
) -> jax.Array:
    """torch ConvTranspose1d(stride, padding) — two XLA formulations.

    kernel: (k, C_in, C_out) *already spatially reversed* at load time
    (io/params.py: kernel[t, i, o] = W_torch[i, o, k-1-t]).  Output length is
    (T-1)*stride + k - 2*padding, matching torch.

    An alternative dense-matmul + overlap-add formulation exists
    (:func:`_conv_transpose_matmul`, requires k % stride == 0).  It wins its
    *isolated* microbenchmark on wide inputs (~1.3x, scripts/
    bench_conv_variants.py --transpose) but measurably LOSES inside the full
    fused vocoder program (e2e bench dropped 115x -> 69x when auto-enabled —
    the scatter-add materializes large buffers that XLA fuses poorly next to
    the surrounding ops), so it is opt-in only via ``method="matmul"``.
    """
    k = kernel.shape[0]
    if method == "matmul":
        if k % stride != 0:
            raise ValueError("matmul conv-transpose needs k % stride == 0")
        return _conv_transpose_matmul(x, kernel, bias, stride, padding)
    if method == "phases":
        if k % stride != 0 or 2 * padding != k - stride:
            raise ValueError(
                "phases conv-transpose needs k % stride == 0 and "
                "2*padding == k - stride")
        return _conv_transpose_phases(x, kernel, bias, stride, padding)
    pad = k - 1 - padding
    out = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=((pad, pad),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
    )
    if bias is not None:
        out = out + bias
    return out


def _conv_transpose_matmul(x, kernel, bias, stride, padding):
    """Dense-matmul + overlap-add transposed conv (k % stride == 0).

    y[i*s + j] = sum_g pieces[i - g, g*s + j] with pieces = x @ W per tap,
    where W is the un-reversed torch tap order.
    """
    k, _cin, cout = kernel.shape
    taps = jnp.flip(kernel, axis=0)  # taps[t, i, o] = W_torch[i, o, t]
    B, T, _ = x.shape
    s = stride
    r = k // s
    pieces = jnp.einsum("btc,kcd->btkd", x, taps)  # (B, T, k, C_out) — one MXU matmul
    pieces = pieces.reshape(B, T, r, s, cout)
    y = jnp.zeros((B, T + r - 1, s, cout), x.dtype)
    for g in range(r):
        y = y.at[:, g : g + T].add(pieces[:, :, g])
    n_out_full = (T - 1) * s + k
    y = y.reshape(B, (T + r - 1) * s, cout)[:, :n_out_full]
    y = y[:, padding : n_out_full - padding]
    if bias is not None:
        y = y + bias
    return y


def _conv_transpose_phases(x, kernel, bias, stride, padding):
    """Per-phase matmul transposed conv (k % stride == 0, 2*padding == k-stride).

    Output sample v = t*stride + sigma is a sum of r = k/stride shifted
    matmuls: y[v] = sum_g x[t-g] @ W_torch[:, :, g*stride + sigma].  Unlike
    ``_conv_transpose_matmul`` there is NO scatter/overlap-add — phases stack
    into (T, stride, C_out) and flatten with a free contiguous reshape, so
    XLA keeps clean layouts (the lhs-dilated conv lowering picks a
    T(1,128)-tiled output that costs ~0.4 ms/stage at the bench shape).
    """
    k, _cin, cout = kernel.shape
    s = stride
    r = k // s
    B, T, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (r - 1, r), (0, 0)))
    T2 = T + r
    phases = []
    for sigma in range(s):
        acc = None
        for g in range(r):
            # loader layout is spatially reversed: torch tap tau = kernel[k-1-tau]
            w = kernel[k - 1 - (g * s + sigma)]
            piece = jax.lax.slice_in_dim(xp, r - 1 - g, r - 1 - g + T2, axis=1)
            term = piece @ w
            acc = term if acc is None else acc + term
        phases.append(acc)
    y = jnp.stack(phases, axis=2).reshape(B, T2 * s, cout)
    y = y[:, padding : padding + T * s]
    if bias is not None:
        y = y + bias
    return y


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """LayerNorm over the trailing (channel) axis, torch semantics."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * weight + bias


def leaky_relu(x: jax.Array, slope: float) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)
