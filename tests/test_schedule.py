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


def test_ema_warmup_sheds_init_fast():
    """Warmed-up decay must not leave the EMA pinned to the random init.

    Root cause of the round-4 EMA-worse-than-raw inversion
    (docs/convergence/eval.json): fixed decay 0.9999 with the EMA seeded at
    the init keeps 0.9999^t of the init — 82% after 2,000 steps.  With the
    (1+t)/(10+t) ramp the init weight after N steps is prod(d_t), which is
    tiny almost immediately.
    """
    ema = ParamEMA(decay=0.9999, warmup=True)
    # decay ramp: step 0 -> 0.1, step 10 -> 11/20, large t -> 0.9999
    assert abs(float(ema.decay_at(0)) - 0.1) < 1e-6
    assert abs(float(ema.decay_at(10)) - 11.0 / 20.0) < 1e-6
    assert abs(float(ema.decay_at(10**9)) - 0.9999) < 1e-6

    init = {"w": jnp.zeros((3,))}
    target = {"w": jnp.ones((3,))}
    e = ema.init(init)
    init_weight = 1.0
    for t in range(200):
        e = ema.update(e, target, step=t)
        init_weight *= float(ema.decay_at(t))
    # after 200 steps the init's weight in the average is negligible...
    assert init_weight < 1e-3
    np.testing.assert_allclose(np.asarray(e["w"]), 1.0 - init_weight, rtol=1e-5)
    # ...whereas the un-warmed EMA would still be ~98% init
    assert 0.9999**200 > 0.98
