"""GPipe-style pipeline parallelism over the text-encoder transformer stack.

The fifth parallelism axis (after data / tensor / slice / time-sequence,
parallel/mesh.py + engine/sp.py): consecutive transformer layers live on
different chips, microbatches flow through the stages, and activations hop
stage-to-stage over ICI with ``lax.ppermute``.  The reference has nothing to
map here (single process, batch==1 asserted — SURVEY.md §2b,
/root/reference/src/vits.cpp:303); this is the standard TPU pipeline recipe
(rotating shard_map schedule, XLA inserts nothing but the explicit ppermutes)
expressed over this repo's encoder.

MMS-TTS's 6-layer/192-wide encoder does not *need* pp — the whole model fits
on any chip — so this module is written generically against the layer stack:
``stack_pipeline_params`` converts the flat param dict's per-layer entries
into stage-stacked arrays sharded over a ``pipe`` mesh axis, and
``pipeline_text_encoder`` matches :func:`vits_tpu.models.encoder.text_encoder`
numerically (pinned in tests/test_pipeline.py).  Training composes: the
pipelined encoder is differentiable (ppermute transposes to the reverse hop,
giving the GPipe backward schedule), so ``make_pp_train_step`` trains with
each stage's parameters and optimizer state resident only on that stage's
chip.

Schedule and cost model: with P stages and M microbatches, the rotating
schedule runs M + P - 1 steps, so the bubble fraction is (P-1)/(M+P-1) —
pick M >= 4P for >= 80% utilization.  Activation memory per chip is one
microbatch per in-flight step (use ``remat=True`` to rematerialize stage
interiors in backward and keep only stage boundaries).
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vits_tpu.config import VitsConfig
from vits_tpu.io.params import ParamView

PIPE_AXIS = "pipe"
_LAYER_PREFIX = "text_encoder.encoder.layers."
_STACK_PREFIX = "text_encoder.encoder.pipeline."


def make_pipe_mesh(pipe: int, data: int = 1, devices: Optional[list] = None) -> Mesh:
    """A ('pipe',) mesh — or ('pipe', 'data') when ``data > 1`` — over the
    first ``pipe * data`` devices.

    Neighboring stages should be ICI neighbors; ``jax.devices()`` order is
    torus-contiguous on real TPU slices, so a contiguous reshape is the right
    default placement for a ring schedule.  With a 'data' axis, each stage is
    itself ``data`` chips wide and microbatch ROWS shard across them — pp x dp
    composition inside one shard_map (the pipeline hops stay within a
    stage-pair's chips; the only cross-'data' traffic is gradient psums).
    """
    devices = devices if devices is not None else jax.devices()
    need = pipe * data
    if len(devices) < need:
        raise ValueError(f"need {need} devices for pipe={pipe} x data={data}, "
                         f"have {len(devices)}")
    if data > 1:
        arr = np.asarray(devices[:need]).reshape(pipe, data)
        return Mesh(arr, (PIPE_AXIS, "data"))
    return Mesh(np.asarray(devices[:pipe]), (PIPE_AXIS,))


def layer_suffixes(params: Mapping[str, jax.Array]) -> list[str]:
    """Per-layer parameter suffixes (e.g. 'attention.q_proj.weight'), sorted."""
    suffixes = sorted(
        k[len(_LAYER_PREFIX) :].split(".", 1)[1]
        for k in params
        if k.startswith(_LAYER_PREFIX) and k.startswith(_LAYER_PREFIX + "0.")
    )
    if not suffixes:
        raise ValueError("no text_encoder layer parameters found")
    return suffixes


def stack_pipeline_params(
    params: Mapping[str, jax.Array],
    config: VitsConfig,
    num_stages: int,
    mesh: Optional[Mesh] = None,
) -> dict:
    """Flat param dict -> pp layout: per-layer entries become stage-stacked.

    Every ``text_encoder.encoder.layers.{i}.{suffix}`` entry is replaced by
    one ``text_encoder.encoder.pipeline.{suffix}`` array of shape
    ``(num_stages, layers_per_stage, *leaf_shape)``; all other entries pass
    through unchanged.  When ``mesh`` is given, stacked arrays are placed
    sharded over its 'pipe' axis (one stage block per chip) and the rest
    replicated — the layout ``pipeline_text_encoder``'s shard_map consumes
    with no resharding.
    """
    n = config.num_hidden_layers
    if n % num_stages:
        raise ValueError(f"{n} layers not divisible into {num_stages} stages")
    per = n // num_stages
    suffixes = layer_suffixes(params)
    out = {k: v for k, v in params.items() if not k.startswith(_LAYER_PREFIX)}
    for s in suffixes:
        leaves = [params[f"{_LAYER_PREFIX}{i}.{s}"] for i in range(n)]
        stacked = jnp.stack([jnp.asarray(x) for x in leaves]).reshape(
            (num_stages, per) + np.shape(leaves[0])
        )
        out[_STACK_PREFIX + s] = stacked
    if mesh is not None:
        pipe_sh = NamedSharding(mesh, P(PIPE_AXIS))
        repl = NamedSharding(mesh, P())
        out = {
            k: jax.device_put(v, pipe_sh if k.startswith(_STACK_PREFIX) else repl)
            for k, v in out.items()
        }
    return out


def unstack_pipeline_params(params: Mapping[str, jax.Array], config: VitsConfig) -> dict:
    """Exact inverse of :func:`stack_pipeline_params` (for checkpoint export)."""
    out = {k: v for k, v in params.items() if not k.startswith(_STACK_PREFIX)}
    n = config.num_hidden_layers
    for k, v in params.items():
        if not k.startswith(_STACK_PREFIX):
            continue
        suffix = k[len(_STACK_PREFIX) :]
        flat = jnp.asarray(v).reshape((n,) + v.shape[2:])
        for i in range(n):
            out[f"{_LAYER_PREFIX}{i}.{suffix}"] = flat[i]
    return out


def pipeline_text_encoder(
    params: Mapping[str, jax.Array],
    config: VitsConfig,
    input_ids: jax.Array,  # (B, T) int32
    padding_mask: jax.Array,  # (B, T, 1)
    attention_mask: Optional[jax.Array],  # (B, T) float, 1 = keep
    mesh: Mesh,
    microbatches: int = 4,
    remat: bool = False,
):
    """text_encoder with the layer stack pipelined over the mesh's 'pipe' axis.

    Same outputs as :func:`vits_tpu.models.encoder.text_encoder` (the layer
    math is the shared :func:`encoder_layer`); ``params`` must be in the
    stacked layout from :func:`stack_pipeline_params`.  Embedding and the
    final stats projection are element-cheap and run replicated outside the
    pipeline; only the transformer stack (where the FLOPs are) is staged.
    """
    import math as _math

    from vits_tpu.models.encoder import EncoderOutput, encoder_layer

    num_stages = mesh.shape[PIPE_AXIS]
    B = input_ids.shape[0]
    if B % microbatches:
        raise ValueError(f"batch {B} not divisible by microbatches={microbatches}")
    suffixes = layer_suffixes_stacked(params)

    p = ParamView(params).sub("text_encoder")
    hidden = jnp.take(p["embed_tokens.weight"], input_ids, axis=0)
    hidden = hidden * _math.sqrt(config.hidden_size)
    hidden = hidden * padding_mask

    # Additive attention bias (mirrors text_encoder; zeros when no mask so the
    # pipeline body has one static signature).
    if attention_mask is not None:
        neg = jnp.finfo(hidden.dtype).min
        attn_bias = (1.0 - attention_mask[:, None, None, :]) * neg
    else:
        attn_bias = jnp.zeros((B, 1, 1, input_ids.shape[1]), hidden.dtype)

    M, mb = microbatches, B // microbatches

    def to_mb(x):
        return x.reshape((M, mb) + x.shape[1:])

    stacked = {s: params[_STACK_PREFIX + s] for s in suffixes}

    def stage_apply(stage_params, h, bias, pad):
        per = next(iter(stage_params.values())).shape[0]
        for l in range(per):
            view = ParamView({s: stage_params[s][l] for s in stage_params})
            h = encoder_layer(view, h, bias, pad, config)
        return h

    if remat:
        stage_apply = jax.checkpoint(stage_apply)

    shift_perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    from jax.experimental.shard_map import shard_map

    # pp x dp composition: when the mesh carries extra axes beyond 'pipe'
    # (make_pipe_mesh(pipe, data=N)), microbatch ROWS shard across them —
    # each stage is N chips wide, the ppermute hops stay row-local, and the
    # only cross-'data' traffic is the gradient psum shard_map's transpose
    # inserts for the stage params (replicated over 'data').
    extra = tuple(a for a in mesh.axis_names if a != PIPE_AXIS)
    row_axes = tuple(a for a in extra if mesh.shape[a] > 1)
    if row_axes:
        rows = int(np.prod([mesh.shape[a] for a in row_axes]))
        if mb % rows:
            raise ValueError(
                f"microbatch rows {mb} not divisible over {row_axes} ({rows})")
        act_spec = P(None, row_axes)
    else:
        act_spec = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=({s: P(PIPE_AXIS) for s in stacked},
                  act_spec, act_spec, act_spec),
        out_specs=act_spec,
    )
    def run(stacked, hidden_mb, bias_mb, pad_mb):
        # Rotating GPipe schedule: at step t, stage s computes microbatch
        # t - s (bubbles at the edges compute throwaway rows that are never
        # accumulated).  One ppermute hop per step carries the activation to
        # the next stage over ICI.
        idx = jax.lax.axis_index(PIPE_AXIS)
        local = {s: v[0] for s, v in stacked.items()}  # (1, per, ...) block
        state = jnp.zeros_like(hidden_mb[0])
        out = jnp.zeros_like(hidden_mb)
        for t in range(M + num_stages - 1):
            inp = jnp.where(idx == 0, hidden_mb[min(t, M - 1)], state)
            mb_idx = jnp.clip(t - idx, 0, M - 1)
            bias = jnp.take(bias_mb, mb_idx, axis=0)
            pad = jnp.take(pad_mb, mb_idx, axis=0)
            h = stage_apply(local, inp, bias, pad)
            if t >= num_stages - 1:
                out = out.at[t - (num_stages - 1)].add(
                    jnp.where(idx == num_stages - 1, h, jnp.zeros_like(h))
                )
            state = jax.lax.ppermute(h, PIPE_AXIS, shift_perm)
        # Only the last stage wrote non-zero rows: psum replicates the result.
        return jax.lax.psum(out, PIPE_AXIS)

    hidden = run(stacked, to_mb(hidden), to_mb(attn_bias), to_mb(padding_mask))
    hidden = hidden.reshape((B,) + hidden.shape[2:])

    from vits_tpu.ops.conv import conv1d

    hidden = hidden * padding_mask
    stats = conv1d(hidden, p["project.weight"], p["project.bias"]) * padding_mask
    return EncoderOutput(
        hidden, stats[..., : config.flow_size], stats[..., config.flow_size :]
    )


def layer_suffixes_stacked(params: Mapping[str, jax.Array]) -> list[str]:
    """Suffixes present in the stacked (pp) layout."""
    suffixes = sorted(
        k[len(_STACK_PREFIX) :] for k in params if k.startswith(_STACK_PREFIX)
    )
    if not suffixes:
        raise ValueError(
            "params are not in pipeline layout — call stack_pipeline_params first"
        )
    return suffixes


def make_pp_train_step(
    config: VitsConfig,
    optimizer,
    mesh: Mesh,
    microbatches: int = 4,
    segment_frames: int = 32,
    mel_weight: float = 45.0,
    mel_kwargs: Optional[dict] = None,
    remat: bool = False,
):
    """Generator train step with the encoder pipelined over 'pipe' stages.

    Params must be in the stacked layout (:func:`stack_pipeline_params` with
    this mesh): each stage's layer block AND its optimizer moments live only
    on that stage's chip; gradients for stage parameters never leave it (the
    ppermute transpose carries only activation-sized cotangents between
    neighbors).  Everything outside the encoder runs replicated — for a model
    family where pp matters, those modules would shard over composed axes.
    Matches make_train_step losses (tests/test_pipeline.py).
    """
    from vits_tpu.train.step import generator_forward

    def encoder_fn(params_dict, cfg, input_ids, padding_mask3, attention_mask):
        return pipeline_text_encoder(
            params_dict, cfg, input_ids, padding_mask3, attention_mask,
            mesh=mesh, microbatches=microbatches, remat=remat,
        )

    def loss_fn(params, batch, rng):
        total, metrics, _, _ = generator_forward(
            params, config, batch, rng, segment_frames, mel_weight, mel_kwargs,
            encoder_fn=encoder_fn,
        )
        return total, metrics

    import optax

    @jax.jit
    def step(params, opt_state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step
