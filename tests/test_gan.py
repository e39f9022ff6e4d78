"""Adversarial training tests: discriminator shapes/grads, full GAN step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vits_tpu.models.discriminator import (
    PERIODS,
    discriminate,
    init_discriminator_params,
)
from vits_tpu.train.step import make_gan_train_step

from tests.test_train import MEL_KWARGS, _random_batch


@pytest.fixture(scope="module")
def disc_params():
    return {k: jnp.asarray(v) for k, v in init_discriminator_params(0).items()}


def test_discriminate_shapes(disc_params):
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1024)), jnp.float32)
    logits, feats = discriminate(disc_params, audio)
    assert len(logits) == len(PERIODS) + 1
    assert len(feats) == len(PERIODS) + 1
    for lg in logits:
        assert lg.shape[0] == 2 and lg.ndim == 2
    for ft in feats:
        assert len(ft) >= 5


def test_discriminator_separates_after_training(disc_params):
    """A few LSGAN steps should push real logits above fake logits."""
    from vits_tpu.train.losses import discriminator_loss

    rng = np.random.default_rng(1)
    t = np.linspace(0, 40 * np.pi, 1024)
    real = jnp.asarray(np.sin(t)[None, :] * 0.5, jnp.float32)
    fake = jnp.asarray(rng.standard_normal((1, 1024)) * 0.5, jnp.float32)

    opt = optax.adam(1e-3)
    params = disc_params
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            rl, _ = discriminate(p, real)
            fl, _ = discriminate(p, fake)
            return discriminator_loss(rl, fl)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    losses = []
    for _ in range(10):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    rl, _ = discriminate(params, real)
    fl, _ = discriminate(params, fake)
    assert float(jnp.mean(rl[0])) > float(jnp.mean(fl[0]))


def test_gan_train_step_runs(tiny_bundle, disc_params):
    config, gen_params = tiny_bundle
    gen_params = {k: jnp.asarray(v) for k, v in gen_params.items()}
    gen_opt = optax.adamw(2e-4)
    disc_opt = optax.adamw(2e-4)
    step = make_gan_train_step(
        config, gen_opt, disc_opt, segment_frames=8,
        mel_kwargs=MEL_KWARGS, donate=False,
    )
    batch = _random_batch(config, np.random.default_rng(2))
    gp, dp, gs, ds, metrics = step(
        gen_params, disc_params, gen_opt.init(gen_params),
        disc_opt.init(disc_params), batch, jax.random.PRNGKey(0),
    )
    for name, v in metrics._asdict().items():
        assert np.isfinite(float(v)), name
    # both networks must have moved
    assert not np.allclose(
        np.asarray(gp["decoder.conv_pre.weight"]),
        np.asarray(gen_params["decoder.conv_pre.weight"]),
    )
    assert not np.allclose(
        np.asarray(dp["discriminator.msd.convs.0.weight"]),
        np.asarray(disc_params["discriminator.msd.convs.0.weight"]),
    )


def test_reused_forward_matches_two_forward_step(tiny_bundle, disc_params):
    """The single-forward (vjp) GAN step must be numerically identical to the
    naive two-forward formulation — same losses AND same updated params."""
    config, gen_params = tiny_bundle
    gen_params = {k: jnp.asarray(v) for k, v in gen_params.items()}
    batch = _random_batch(config, np.random.default_rng(3))
    rng = jax.random.PRNGKey(4)
    gen_opt, disc_opt = optax.adamw(2e-4), optax.adamw(2e-4)

    results = []
    for reuse in (True, False):
        step = make_gan_train_step(
            config, gen_opt, disc_opt, segment_frames=8,
            mel_kwargs=MEL_KWARGS, donate=False, reuse_forward=reuse,
        )
        gp, dp, gos, dos, metrics = step(
            gen_params, disc_params, gen_opt.init(gen_params),
            disc_opt.init(disc_params), batch, rng,
        )
        results.append((gp, dp, metrics))

    (gp_a, dp_a, m_a), (gp_b, dp_b, m_b) = results
    np.testing.assert_allclose(float(m_a.gen_loss), float(m_b.gen_loss), rtol=1e-5)
    np.testing.assert_allclose(float(m_a.disc_loss), float(m_b.disc_loss), rtol=1e-5)
    for k in gp_a:
        np.testing.assert_allclose(
            np.asarray(gp_a[k]), np.asarray(gp_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"gen param {k} diverged",
        )
    for k in dp_a:
        np.testing.assert_allclose(
            np.asarray(dp_a[k]), np.asarray(dp_b[k]), rtol=1e-4, atol=1e-6,
            err_msg=f"disc param {k} diverged",
        )
