"""Training-step tests: loss finiteness, gradient flow, optimizer update,
and full-mesh (data+model parallel) execution on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vits_tpu.parallel.mesh import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    shard_params,
)
from vits_tpu.train.step import TrainBatch, generator_loss, make_train_step

MEL_KWARGS = {"n_fft": 256, "hop_length": 64, "n_mels": 20}


def _random_batch(config, rng, B=2, T=12, S=24):
    up = config.total_upsample
    return TrainBatch(
        input_ids=rng.integers(0, config.vocab_size, (B, T)).astype(np.int32),
        token_mask=np.ones((B, T), np.float32),
        spectrogram=rng.standard_normal((B, S, config.spectrogram_bins)).astype(np.float32),
        frame_mask=np.ones((B, S), np.float32),
        audio=(rng.standard_normal((B, S * up)) * 0.1).astype(np.float32),
    )


def test_generator_loss_finite(tiny_bundle):
    config, params = tiny_bundle
    rng = np.random.default_rng(0)
    batch = _random_batch(config, rng)
    total, metrics = generator_loss(
        params, config, batch, jax.random.PRNGKey(0),
        segment_frames=8, mel_kwargs=MEL_KWARGS,
    )
    assert np.isfinite(float(total))
    for v in metrics:
        assert np.isfinite(float(v))


def test_train_step_updates_params(tiny_bundle):
    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(1)
    batch = _random_batch(config, rng)
    opt = optax.adamw(2e-4)
    opt_state = opt.init(params)
    step = make_train_step(config, opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
                           donate=False)
    new_params, new_opt_state, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics.loss))
    # at least the text-encoder and decoder weights must have moved
    moved = 0
    for key in ("text_encoder.embed_tokens.weight", "decoder.conv_pre.weight",
                "posterior_encoder.conv_pre.weight", "flow.flows.0.conv_pre.weight"):
        if not np.allclose(np.asarray(new_params[key]), np.asarray(params[key])):
            moved += 1
    assert moved >= 3


def test_train_step_on_mesh_dp_tp(tiny_bundle):
    """Data(4) x model(2) mesh over 8 virtual CPU devices — the SURVEY.md §4
    multi-chip-without-a-cluster pattern."""
    config, params = tiny_bundle
    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded = shard_params(params, mesh, model_parallel=True)
        opt = optax.adamw(2e-4)
        opt_state = opt.init(sharded)
        step = make_train_step(config, opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
                               donate=False)
        rng = np.random.default_rng(2)
        batch_np = _random_batch(config, rng, B=4)
        ds = data_sharding(mesh)
        batch = TrainBatch(*[
            jax.device_put(x, ds) if x is not None else None for x in batch_np
        ])
        new_params, _, metrics = step(sharded, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics.loss))


def test_model_parallel_params_actually_sharded(tiny_bundle):
    config, params = tiny_bundle
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh)
    w = sharded["decoder.conv_pre.weight"]
    assert len(w.sharding.device_set) == 8
    # out-channel dim (32) splits over model axis -> 2 distinct shards per replica
    spec = w.sharding.spec
    assert spec[-1] is not None or spec == ()  # sharded unless fallback hit


def test_loss_decreases_over_steps(tiny_bundle):
    """A few steps on one fixed batch must reduce the loss (end-to-end grad sanity)."""
    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(config, opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
                           donate=False)
    rng = np.random.default_rng(3)
    batch = _random_batch(config, rng)
    key = jax.random.PRNGKey(42)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch, key)
        losses.append(float(metrics.loss))
    assert losses[-1] < losses[0], losses


def test_train_step_on_slice_mesh(tiny_bundle):
    """('slice','data','model') mesh: batch shards over (slice, data); the
    same step program compiles and the loss matches the flat-mesh run."""
    config, params = tiny_bundle
    rng = np.random.default_rng(5)
    batch = _random_batch(config, rng, B=4)
    opt = optax.adamw(2e-4)

    from vits_tpu.parallel.mesh import SLICE_AXIS

    mesh_flat = make_mesh(data=4, model=2)
    mesh_slice = make_mesh(slices=2, data=2, model=2)
    assert mesh_slice.axis_names == (SLICE_AXIS, DATA_AXIS, "model")

    losses = []
    for mesh in (mesh_flat, mesh_slice):
        with mesh:
            p = shard_params(params, mesh, model_parallel=True)
            opt_state = opt.init(p)
            step = make_train_step(config, opt, segment_frames=8,
                                   mel_kwargs=MEL_KWARGS, donate=False)
            ds = data_sharding(mesh)
            sharded = TrainBatch(*[
                None if x is None else jax.device_put(x, ds) for x in batch
            ])
            _, _, metrics = step(p, opt_state, sharded, jax.random.PRNGKey(2))
            losses.append(float(metrics.loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
