"""Trainable fused trio: forward equivalence + gradient parity vs XLA autodiff.

Round-2 verdict item 4: training could not use the fused kernels.  The
custom-VJP path (ops/pallas/trio_grad.py) must produce gradients matching
XLA autodiff of the reference trio at fp32 tolerance — for the input AND
every weight/bias — under the "highest" precision tier used by parity tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.ops.pallas.trio_grad import (
    make_trainable_trio,
    xla_trio_reference,
)

METAS = [
    {"kernel_size": 3, "dilations": (1, 3)},
    {"kernel_size": 5, "dilations": (1, 2)},
]
SLOPE = 0.1


def _make_weights(rng, C):
    weights = []
    for m in METAS:
        pairs, k = len(m["dilations"]), m["kernel_size"]
        weights.append((
            jnp.asarray(rng.standard_normal((pairs, k, C, C)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((pairs, C)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((pairs, k, C, C)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((pairs, C)) * 0.1, jnp.float32),
        ))
    return tuple(weights)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    C = 8
    x = jnp.asarray(rng.standard_normal((2, 40, C)), jnp.float32)
    weights = _make_weights(rng, C)
    f = make_trainable_trio(METAS, slope=SLOPE, tile_t=16, interpret=True,
                            precision="highest")
    return x, weights, f


def test_forward_matches_reference(setup):
    x, weights, f = setup
    got = np.asarray(f(x, weights))
    ref = np.asarray(xla_trio_reference(x, weights, METAS, SLOPE))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_grads_match_xla_autodiff(setup):
    x, weights, f = setup

    def loss_fused(x, w):
        return jnp.sum(jnp.sin(f(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(xla_trio_reference(x, w, METAS, SLOPE)))

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, weights)

    scale = max(1.0, float(jnp.abs(rx).max()))
    np.testing.assert_allclose(np.asarray(gx) / scale, np.asarray(rx) / scale,
                               atol=1e-5)
    for (g1, gb1, g2, gb2), (r1, rb1, r2, rb2) in zip(gw, rw):
        for g, r in zip((g1, gb1, g2, gb2), (r1, rb1, r2, rb2)):
            s = max(1.0, float(jnp.abs(r).max()))
            np.testing.assert_allclose(np.asarray(g) / s, np.asarray(r) / s,
                                       atol=1e-5)


def test_tile_boundaries_do_not_break_grads(setup):
    """T not dividing tile_t exercises tail padding in fwd AND saved acts."""
    rng = np.random.default_rng(3)
    C = 8
    x = jnp.asarray(rng.standard_normal((1, 27, C)), jnp.float32)
    weights = _make_weights(rng, C)
    f = make_trainable_trio(METAS, slope=SLOPE, tile_t=16, interpret=True,
                            precision="highest")
    gx = jax.grad(lambda x: jnp.sum(f(x, weights) ** 2))(x)
    rx = jax.grad(
        lambda x: jnp.sum(xla_trio_reference(x, weights, METAS, SLOPE) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
