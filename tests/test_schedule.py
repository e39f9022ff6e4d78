"""Optimizer schedule + EMA tests."""

import jax.numpy as jnp
import numpy as np

from vits_tpu.train.schedule import ParamEMA, vits_learning_rate, vits_optimizer


def test_learning_rate_decays_per_epoch_gamma():
    sched = vits_learning_rate(2e-4, gamma_per_epoch=0.999875, steps_per_epoch=100)
    lr0 = float(sched(0))
    lr_epoch = float(sched(100))
    assert abs(lr0 - 2e-4) < 1e-9
    assert abs(lr_epoch / lr0 - 0.999875) < 1e-6


def test_optimizer_updates():
    import optax

    opt = vits_optimizer(1e-3, steps_per_epoch=10)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))


def test_ema_tracks_params():
    ema = ParamEMA(decay=0.5)
    p0 = {"w": jnp.zeros((3,))}
    e = ema.init(p0)
    p1 = {"w": jnp.ones((3,))}
    e = ema.update(e, p1)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.5)
    e = ema.update(e, p1)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.75)
