"""Fused residual-coupling flow (4 couplings x 4-layer WaveNet) as ONE kernel.

The inference flow (models/flow.py::residual_coupling_block, reverse=True;
reference flow_graph + wavenet_graph at /root/reference/src/vits.cpp:452-538)
is ~170 small ops per call under XLA: per coupling layer a 1x1 conv_pre, four
(dilated-conv k=5 d=1 -> tanh*sigmoid gate -> 1x1 res/skip) WaveNet layers and
a 1x1 conv_post, with channel flips between couplings.  Each op round-trips
(T, 192) activations through HBM and launches its own kernel; at T<=4096 the
whole working set is < 3 MB, so the entire stack belongs in VMEM.

This kernel runs the FULL flow in one ``pallas_call``:

  * grid = (batch, num_flows); TPU grids are sequential with the last axis
    fastest, so the two half-state buffers persist in VMEM scratch across the
    coupling steps of one batch row (one input read at step 0, one output
    write at the last step — 2 HBM passes for activations total).
  * per-step weights are stacked on a leading execution-order axis and block-
    indexed with ``lambda b, f: (f, ...)`` so Pallas double-buffers the weight
    DMA behind compute.
  * the inter-coupling channel flip is FOLDED INTO THE WEIGHTS: the state is
    kept as two (T, half) buffers in original channel order, and each step is
    pre-lowered (at pack time, on the host) to either
      type B:  mean = net(x1);  x2 = (x2 - mean) * mask
      type A:  mean = rev(net(rev(x2)));  x1 = (x1 - mean) * mask
    where both ``rev`` are absorbed by reversing rows of conv_pre / columns of
    conv_post.  No in-kernel permutations, no lane slicing at 96.
  * the WaveNet gate's 2*hidden conv is pre-split into separate tanh / sigmoid
    weight stacks, and res/skip 1x1s into separate matrices, so every matmul
    output is a clean (T, hidden) tile.

Equivalence vs the XLA module is pinned by tests/test_pallas_flow.py
(interpret mode on CPU, compiled on TPU).  Inference-only: training uses the
XLA path (reverse=False needs log-dets and gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vits_tpu.ops.pallas import kernel_dot, resolve_interpret, resolve_precision

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView


def pack_flow_weights(params: ParamView, config: VitsConfig):
    """Stack per-coupling weights in EXECUTION order with flips folded in.

    Execution order for reverse inference is flow (n-1) .. 0, a flip BEFORE
    each coupling (models/flow.py:129-134).  Tracking the cumulative flip
    parity in original channel coordinates: step s executes coupling
    i = n-1-s; odd cumulative flips (s even) read the reversed second half
    and update the first half (type A), even (s odd) read the first half
    plainly and update the second (type B).  n is even for every VITS config
    so the final state is already in original coordinates.

    Returns a dict of stacked jnp arrays (leading dim = num_flows) plus the
    static type-A mask tuple.
    """
    n = config.prior_encoder_num_flows
    nl = config.prior_encoder_num_wavenet_layers
    hidden = config.hidden_size
    half = config.flow_size // 2
    assert n % 2 == 0, "odd flow counts would leave the output flipped"

    p = params.sub("flow")
    wpre, bpre, wpost, bpost = [], [], [], []
    wt, bt, ws, bs = [], [], [], []
    wres, bres, wskip, bskip = [], [], [], []
    type_a = []
    for s in range(n):
        i = n - 1 - s
        a = s % 2 == 0  # type A: read rev(x2), update x1 with rev(mean)
        type_a.append(a)
        f = p.sub(f"flows.{i}")
        w_pre = f["conv_pre.weight"][0]  # (half, hidden)
        b_pre = f["conv_pre.bias"]
        w_post = f["conv_post.weight"][0]  # (hidden, half)
        b_post = f["conv_post.bias"]
        if a:
            w_pre = w_pre[::-1]          # h = rev(x2) @ W  ==  x2 @ rev_rows(W)
            w_post = w_post[:, ::-1]     # rev(h @ W) == h @ rev_cols(W)
            b_post = b_post[::-1]
        wpre.append(w_pre)
        bpre.append(b_pre)
        wpost.append(w_post)
        bpost.append(b_post)

        wn = f.sub("wavenet")
        wt_l, bt_l, ws_l, bs_l = [], [], [], []
        wres_l, bres_l, wskip_l, bskip_l = [], [], [], []
        for l in range(nl):
            w_in = wn[f"in_layers.{l}.weight"]  # (k, hidden, 2*hidden)
            b_in = wn[f"in_layers.{l}.bias"]
            wt_l.append(w_in[:, :, :hidden])
            bt_l.append(b_in[:hidden])
            ws_l.append(w_in[:, :, hidden:])
            bs_l.append(b_in[hidden:])
            w_rs = wn[f"res_skip_layers.{l}.weight"][0]  # (hidden, out)
            b_rs = wn[f"res_skip_layers.{l}.bias"]
            if l < nl - 1:  # out = 2*hidden: res first half, skip second
                wres_l.append(w_rs[:, :hidden])
                bres_l.append(b_rs[:hidden])
                wskip_l.append(w_rs[:, hidden:])
                bskip_l.append(b_rs[hidden:])
            else:  # last layer: out = hidden, all skip
                wres_l.append(jnp.zeros((hidden, hidden), w_rs.dtype))
                bres_l.append(jnp.zeros((hidden,), b_rs.dtype))
                wskip_l.append(w_rs)
                bskip_l.append(b_rs)
        wt.append(jnp.stack(wt_l))
        bt.append(jnp.stack(bt_l))
        ws.append(jnp.stack(ws_l))
        bs.append(jnp.stack(bs_l))
        wres.append(jnp.stack(wres_l))
        bres.append(jnp.stack(bres_l))
        wskip.append(jnp.stack(wskip_l))
        bskip.append(jnp.stack(bskip_l))

    f32 = lambda seq: jnp.stack(seq).astype(jnp.float32)  # noqa: E731
    return {
        "wpre": f32(wpre),
        # biases get a singleton row dim: Mosaic requires a block's last two
        # dims to be (8,128)-divisible or equal to the array's — (1, dim) rows
        # of an (n, 1, dim) stack satisfy the latter.
        "bpre": f32(bpre)[:, None, :],
        "wpost": f32(wpost), "bpost": f32(bpost)[:, None, :],
        "wt": f32(wt), "bt": f32(bt), "ws": f32(ws), "bs": f32(bs),
        "wres": f32(wres), "bres": f32(bres),
        "wskip": f32(wskip), "bskip": f32(bskip),
    }, tuple(type_a)


def pack_flow_cond(params: ParamView, config: VitsConfig,
                   speaker_embeddings: jax.Array) -> jax.Array:
    """Per-coupling WaveNet conditioning, stacked in EXECUTION order.

    Mirrors models/flow.py::wavenet's cond path: each coupling layer's
    ``cond_layer`` 1x1-convs the (B, 1, speaker_emb) embedding to
    (B, 1, 2*hidden*num_layers); layer l adds slice [l*2h : (l+1)*2h].
    Returns (B, n_flows, num_layers, 2*hidden) with flow n-1 first.
    """
    from vits_tpu.ops.conv import conv1d

    n = config.prior_encoder_num_flows
    nl = config.prior_encoder_num_wavenet_layers
    hidden = config.hidden_size
    p = params.sub("flow")
    per_flow = []
    for s in range(n):
        wn = p.sub(f"flows.{n - 1 - s}.wavenet")
        c = conv1d(speaker_embeddings, wn["cond_layer.weight"], wn["cond_layer.bias"])
        per_flow.append(c.reshape(c.shape[0], nl, 2 * hidden))
    return jnp.stack(per_flow, axis=1)


def _flow_kernel(
    len_ref, x1_in, x2_in, cond_t_ref, cond_s_ref,
    wpre_ref, bpre_ref, wpost_ref, bpost_ref,
    wt_ref, bt_ref, ws_ref, bs_ref,
    wres_ref, bres_ref, wskip_ref, bskip_ref,
    o1_ref, o2_ref, s1, s2,
    *, T, half, hidden, nl, k, type_a, n_flows, has_cond, precision,
):
    b = pl.program_id(0)
    f = pl.program_id(1)

    @pl.when(f == 0)
    def _():
        s1[:] = x1_in[0].astype(jnp.float32)
        s2[:] = x2_in[0].astype(jnp.float32)

    valid = len_ref[b, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    rmask = row < valid

    def dot(x, w):
        return kernel_dot(x, w, precision)

    def coupling(read_ref, upd_ref):
        # conv_pre (1x1) + mask
        h = dot(read_ref[:], wpre_ref[0]) + bpre_ref[0, 0][None, :]
        h = jnp.where(rmask, h, 0.0)
        zpad = jnp.zeros((k // 2, hidden), jnp.float32)
        outputs = jnp.zeros((T, hidden), jnp.float32)
        inputs = h
        for l in range(nl):
            xp = jnp.concatenate([zpad, inputs, zpad], axis=0)
            ta = bt_ref[0, l][None, :].astype(jnp.float32)
            sa = bs_ref[0, l][None, :].astype(jnp.float32)
            for tap in range(k):
                piece = jax.lax.slice_in_dim(xp, tap, tap + T, axis=0)
                ta = ta + dot(piece, wt_ref[0, l, tap])
                sa = sa + dot(piece, ws_ref[0, l, tap])
            if has_cond:
                ta = ta + cond_t_ref[0, 0, l][None, :]
                sa = sa + cond_s_ref[0, 0, l][None, :]
            acts = jnp.tanh(ta) * jax.nn.sigmoid(sa)
            acts = jnp.where(rmask, acts, 0.0)
            if l < nl - 1:
                res = dot(acts, wres_ref[0, l]) + bres_ref[0, l][None, :]
                inputs = jnp.where(rmask, inputs + res, 0.0)
            outputs = outputs + dot(acts, wskip_ref[0, l]) + bskip_ref[0, l][None, :]
        outputs = jnp.where(rmask, outputs, 0.0)
        mean = dot(outputs, wpost_ref[0]) + bpost_ref[0, 0][None, :]
        upd_ref[:] = jnp.where(rmask, upd_ref[:] - mean, 0.0)

    # type A steps read x2 (reversal folded into weights) and update x1;
    # type B steps read x1 and update x2.  The pattern is static per grid
    # position, selected with pl.when on the flow index.
    for s, a in enumerate(type_a):
        @pl.when(f == s)
        def _(a=a):
            if a:
                coupling(s2, s1)
            else:
                coupling(s1, s2)

    @pl.when(f == n_flows - 1)
    def _():
        o1_ref[0] = jnp.where(rmask, s1[:], 0.0).astype(o1_ref.dtype)
        o2_ref[0] = jnp.where(rmask, s2[:], 0.0).astype(o2_ref.dtype)


def fused_flow(
    x: jax.Array,  # (B, T, flow_size) prior latents
    packed: dict,  # from pack_flow_weights
    type_a: tuple,
    config: VitsConfig,
    *,
    lengths: jax.Array | None = None,  # (B,) valid frames
    cond: jax.Array | None = None,  # (B, n_flows, nl, 2*hidden) per-flow wavenet cond
    interpret: bool | None = None,
    precision: str | None = None,  # None = fast bf16 multiplies; "highest" = fp32
) -> jax.Array:
    """Reverse residual-coupling flow, whole stack in one kernel."""
    interpret = resolve_interpret(interpret)
    B, T, C = x.shape
    half = config.flow_size // 2
    hidden = config.hidden_size
    nl = config.prior_encoder_num_wavenet_layers
    k = config.wavenet_kernel_size
    n = config.prior_encoder_num_flows
    assert C == config.flow_size and len(type_a) == n

    t_pad = -(-T // 8) * 8 - T  # sublane-align the resident buffers
    xp = jnp.pad(x, ((0, 0), (0, t_pad), (0, 0)))
    Tp = T + t_pad
    x1 = xp[..., :half]
    x2 = xp[..., half:]

    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    len2 = lengths.astype(jnp.int32).reshape(B, 1)

    has_cond = cond is not None
    if cond is None:
        cond_t = jnp.zeros((B, n, nl, 1), jnp.float32)
        cond_s = cond_t
    else:
        cond = cond.astype(jnp.float32)
        cond_t = cond[..., :hidden]
        cond_s = cond[..., hidden:]

    kernel = functools.partial(
        _flow_kernel,
        T=Tp, half=half, hidden=hidden, nl=nl, k=k,
        type_a=tuple(type_a), n_flows=n, has_cond=has_cond,
        precision=resolve_precision(precision),
    )

    def step_spec(arr):
        """Block = one execution step's slice of a stacked weight array."""
        return pl.BlockSpec(
            (1,) + arr.shape[1:], lambda b, f: (f,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    w = packed
    o1, o2 = pl.pallas_call(
        kernel,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B,1)
            pl.BlockSpec((1, Tp, half), lambda b, f: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, half), lambda b, f: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nl, cond_t.shape[-1]), lambda b, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nl, cond_s.shape[-1]), lambda b, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            step_spec(w["wpre"]), step_spec(w["bpre"]),
            step_spec(w["wpost"]), step_spec(w["bpost"]),
            step_spec(w["wt"]), step_spec(w["bt"]),
            step_spec(w["ws"]), step_spec(w["bs"]),
            step_spec(w["wres"]), step_spec(w["bres"]),
            step_spec(w["wskip"]), step_spec(w["bskip"]),
        ],
        out_specs=(
            pl.BlockSpec((1, Tp, half), lambda b, f: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, half), lambda b, f: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, half), x.dtype),
            jax.ShapeDtypeStruct((B, Tp, half), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((Tp, half), jnp.float32),
            pltpu.VMEM((Tp, half), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        len2, x1, x2, cond_t, cond_s,
        w["wpre"], w["bpre"], w["wpost"], w["bpost"],
        w["wt"], w["bt"], w["ws"], w["bs"],
        w["wres"], w["bres"], w["wskip"], w["bskip"],
    )
    out = jnp.concatenate([o1, o2], axis=-1)
    return out[:, :T]
