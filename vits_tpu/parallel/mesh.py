"""Device mesh and sharding rules.

The reference has no multi-device anything (SURVEY.md §2b: pthread workers and
SIMD only; batch==1 asserted).  The TPU-native replacement is not a wire
protocol but a *naming* layer: a ``jax.sharding.Mesh`` over ('data', 'model')
axes plus PartitionSpec rules mapping parameter names and activations onto it.
XLA inserts the collectives (all-gather / reduce-scatter / psum over ICI);
nothing here speaks NCCL/MPI.

Axes:
  * ``slice`` — (optional) multi-slice deployments: collectives crossing this
    axis ride DCN, everything inside a slice rides ICI.  Batch shards over
    ('slice', 'data') together so gradient psums are hierarchical.
  * ``data``  — batch-parallel synthesis/training (the common scale-out axis).
  * ``model`` — tensor-parallel sharding of the wide channel dimensions
    (encoder FFN, attention heads, WaveNet gates, HiFiGAN channels).
"""

from __future__ import annotations

import re
from typing import Mapping, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[list] = None,
    slices: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh — or ('slice', 'data', 'model') when
    ``slices > 1`` — over the available devices.

    ``jax.devices()`` orders devices slice-major on multi-slice TPU, so the
    leading reshape dim maps the slice axis onto DCN boundaries and the inner
    axes stay within a slice (ICI).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // (model * slices)
    if data * model * slices != n:
        raise ValueError(f"mesh {slices}x{data}x{model} != {n} devices")
    if slices > 1:
        arr = np.asarray(devices).reshape(slices, data, model)
        return Mesh(arr, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# ---------------------------------------------------------------------- #
# Parameter sharding rules: first regex that matches a canonical-layout
# param name wins.  Layouts (io/params.py): linear (in, out), conv
# (k, in, out), conv_transpose (k, in, out), embeddings (vocab, dim).
# The pattern pairs column-sharded producers with row-sharded consumers so
# activations stay sharded across the pair and XLA only inserts one psum.
_PARAM_RULES: list[tuple[re.Pattern, P]] = [
    # --- text encoder ---------------------------------------------------
    (re.compile(r".*\.attention\.(q|k|v)_proj\.weight$"), P(None, MODEL_AXIS)),
    (re.compile(r".*\.attention\.(q|k|v)_proj\.bias$"), P(MODEL_AXIS)),
    (re.compile(r".*\.attention\.out_proj\.weight$"), P(MODEL_AXIS, None)),
    (re.compile(r".*\.feed_forward\.conv_1\.weight$"), P(None, None, MODEL_AXIS)),
    (re.compile(r".*\.feed_forward\.conv_1\.bias$"), P(MODEL_AXIS)),
    (re.compile(r".*\.feed_forward\.conv_2\.weight$"), P(None, MODEL_AXIS, None)),
    # --- wavenet gates (2*hidden wide) ----------------------------------
    (re.compile(r".*wavenet\.in_layers\.\d+\.weight$"), P(None, None, MODEL_AXIS)),
    (re.compile(r".*wavenet\.in_layers\.\d+\.bias$"), P(MODEL_AXIS)),
    # --- hifigan: shard the wide channel dims ---------------------------
    (re.compile(r"decoder\.conv_pre\.weight$"), P(None, None, MODEL_AXIS)),
    (re.compile(r"decoder\.conv_pre\.bias$"), P(MODEL_AXIS)),
    (re.compile(r"decoder\.upsampler\.\d+\.weight$"), P(None, MODEL_AXIS, None)),
    (re.compile(r"decoder\.resblocks\.\d+\.convs\d\.\d+\.weight$"), P(None, None, MODEL_AXIS)),
    (re.compile(r"decoder\.resblocks\.\d+\.convs\d\.\d+\.bias$"), P(MODEL_AXIS)),
    # --- posterior encoder ----------------------------------------------
    (re.compile(r"posterior_encoder\.conv_pre\.weight$"), P(None, None, MODEL_AXIS)),
    (re.compile(r"posterior_encoder\.conv_pre\.bias$"), P(MODEL_AXIS)),
]


def param_spec(name: str, shape: tuple[int, ...], model_parallel: bool = True) -> P:
    """PartitionSpec for one parameter (replicated if nothing matches)."""
    if model_parallel:
        for pattern, spec in _PARAM_RULES:
            if pattern.match(name):
                # Only shard if the sharded dim is divisible-friendly; XLA
                # requires even division, so fall back to replication otherwise.
                return spec
    return P()


def shard_params(params: Mapping, mesh: Mesh, model_parallel: bool = True) -> dict:
    """Place the flat param dict on the mesh according to the rules.

    Dims that don't divide evenly by the axis size fall back to replication.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    out = {}
    for name, value in params.items():
        spec = param_spec(name, value.shape, model_parallel)
        dims = list(spec)
        ok = True
        for d, axis in enumerate(dims):
            if axis is not None and value.shape[d] % axis_sizes.get(axis, 1) != 0:
                ok = False
                break
        if not ok:
            spec = P()
        out[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def opt_state_shardings(opt_state, mesh: Mesh):
    """ZeRO-1 shardings: partition optimizer moments over the 'data' axis.

    With pure data parallelism the params are replicated but the optimizer
    statistics (Adam mu/nu — 2x the param bytes) need not be: each chip can
    own 1/dp of every moment tensor, update its slice, and let XLA all-gather
    only the (transient) parameter updates.  That is exactly what GSPMD emits
    when the new opt_state is constrained to these shardings inside the train
    step (reduce-scattered grads -> sharded moment update -> all-gathered
    updates) — the standard ZeRO-1/optimizer-state-sharding recipe, expressed
    as shardings rather than hand-written collectives.

    Rule per leaf: first dim divisible by dp shards over 'data'; scalars and
    indivisible shapes replicate.  Returns a pytree of NamedShardings matching
    ``opt_state`` — pass it to make_train_step(opt_shardings=...) /
    make_gan_train_step and device_put the initial state with it
    (shard_opt_state).
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = axis_sizes.get(DATA_AXIS, 1)

    def leaf(x):
        shape = getattr(x, "shape", ())
        if dp > 1:
            for d, s in enumerate(shape):
                if s >= dp and s % dp == 0:
                    spec = [None] * len(shape)
                    spec[d] = DATA_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(leaf, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optimizer state on the mesh per opt_state_shardings."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s),
        opt_state,
        opt_state_shardings(opt_state, mesh),
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded activation sharding (leading dim over 'data', plus
    'slice' when the mesh has one — batch divides across slices too)."""
    if SLICE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((SLICE_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
