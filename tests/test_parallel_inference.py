"""Multi-chip inference: batch-sharded synthesis over the device mesh.

The sharded-inference analogue of the training mesh tests — batch rides the
'data' axis; each virtual device computes its rows; results match the
single-device run (SPMD determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.models.vits import NoiseOverride, synthesize
from vits_tpu.parallel.mesh import data_sharding, make_mesh, replicated, shard_params


def test_data_parallel_synthesis_matches_single(tiny_bundle):
    config, params = tiny_bundle
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    B, T, F = 8, 12, 32
    ids = rng.integers(1, config.vocab_size, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)
    noise = NoiseOverride(
        duration=rng.standard_normal((B, T, 2)).astype(np.float32),
        prior=rng.standard_normal((B, F, config.flow_size)).astype(np.float32),
    )

    # single-device reference
    ref = synthesize(params, config, ids, mask, F, noise=noise)

    with mesh:
        sharded = shard_params(params, mesh, model_parallel=False)
        ds = data_sharding(mesh)
        fn = jax.jit(lambda p, i, m, n: synthesize(p, config, i, m, F, noise=n))
        out = fn(
            sharded,
            jax.device_put(ids, ds),
            jax.device_put(mask, ds),
            NoiseOverride(
                duration=jax.device_put(noise.duration, ds),
                prior=jax.device_put(noise.prior, ds),
            ),
        )
        wave = np.asarray(out.waveform)
    np.testing.assert_allclose(wave, np.asarray(ref.waveform), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.lengths), np.asarray(ref.lengths))


def test_tensor_parallel_synthesis_runs(tiny_bundle):
    """dp4 x tp2: model-sharded params through the full synthesis program."""
    config, params = tiny_bundle
    mesh = make_mesh(data=4, model=2)
    rng = np.random.default_rng(1)
    B, T, F = 4, 10, 32
    ids = rng.integers(1, config.vocab_size, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)

    with mesh:
        sharded = shard_params(params, mesh, model_parallel=True)
        ds = data_sharding(mesh)
        fn = jax.jit(lambda p, i, m, k: synthesize(p, config, i, m, F, rng=k))
        out = fn(
            sharded,
            jax.device_put(ids, ds),
            jax.device_put(mask, ds),
            jax.random.PRNGKey(0),
        )
        wave = np.asarray(out.waveform)
    assert np.isfinite(wave).all()
    assert wave.shape == (B, F * config.total_upsample)
