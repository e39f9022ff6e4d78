"""At-scale training modes: gradient accumulation and bf16 mixed precision.

The reference has no training at all (SURVEY.md §5); these pin the two knobs
that make the training stack usable at production batch sizes on TPU:

- ``grad_accum=N``: lax.scan over N microbatches, gradients averaged before
  ONE optimizer update — pinned EXACTLY against a hand-rolled mean of
  per-microbatch grads (same fold_in key schedule).
- ``compute_dtype="bfloat16"``: model math in bf16 (the MXU's native input
  dtype), master params / optimizer / loss reductions fp32.  Pinned by grad
  direction agreement vs fp32 and by an end-to-end loss-descent run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vits_tpu.models.discriminator import init_discriminator_params
from vits_tpu.train.step import (
    TrainBatch,
    generator_loss,
    make_gan_train_step,
    make_train_step,
)

MEL_KWARGS = {"n_fft": 256, "hop_length": 64, "n_mels": 20}


def _random_batch(config, rng, B=4, T=12, S=24):
    up = config.total_upsample
    return TrainBatch(
        input_ids=rng.integers(0, config.vocab_size, (B, T)).astype(np.int32),
        token_mask=np.ones((B, T), np.float32),
        spectrogram=rng.standard_normal((B, S, config.spectrogram_bins)).astype(np.float32),
        frame_mask=np.ones((B, S), np.float32),
        audio=(rng.standard_normal((B, S * up)) * 0.1).astype(np.float32),
    )


def _micro(batch, i, n):
    B = batch.input_ids.shape[0]
    sl = slice(i * (B // n), (i + 1) * (B // n))
    return TrainBatch(*(None if x is None else x[sl] for x in batch))


def test_grad_accum_matches_manual_mean(tiny_bundle):
    """grad_accum=2 must equal mean(grad(microbatch_i, fold_in(key, i)))
    followed by one optimizer update.

    Pinned through SGD so the comparison is LINEAR in the gradients: Adam's
    g/(sqrt(g^2)+eps) normalization would amplify benign fusion-order noise on
    near-zero bias grads into O(1) relative update differences.  A wrong key
    schedule, wrong microbatch split, or wrong averaging still shows up as an
    O(1) mismatch here."""
    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(7)
    batch = _random_batch(config, rng, B=4)
    key = jax.random.PRNGKey(3)
    lr = 0.1
    opt = optax.sgd(lr)
    opt_state = opt.init(params)

    step = make_train_step(config, opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
                           donate=False, grad_accum=2)
    got_params, _, got_metrics = step(params, opt_state, batch, key)

    manual = jax.jit(jax.value_and_grad(
        lambda prm, mb, k: generator_loss(
            prm, config, mb, k, segment_frames=8, mel_kwargs=MEL_KWARGS),
        has_aux=True,
    ))
    grads, losses = None, []
    for i in range(2):
        (loss, _), g = manual(params, _micro(batch, i, 2),
                              jax.random.fold_in(key, i))
        losses.append(float(loss))
        grads = g if grads is None else jax.tree.map(jnp.add, grads, g)
    grads = jax.tree.map(lambda x: x / 2.0, grads)

    np.testing.assert_allclose(
        float(got_metrics.loss), float(np.mean(losses)), rtol=1e-6)
    # compare in PARAM space (p - lr*g): deriving grads back out of the
    # update would amplify fp32 cancellation noise on small updates.  atol
    # covers lr x per-element fusion-order grad noise between the scanned and
    # unscanned programs (~3e-5 observed on embed_tokens, whose grad is a
    # scatter-add whose summation order XLA is free to reassociate); a wrong
    # key schedule / microbatch split / averaging shows up as O(1) mismatches
    # (the tiny_bundle params and their lr-scaled updates are O(1)-O(100)).
    for k in grads:
        want = np.asarray(params[k]) - lr * np.asarray(grads[k])
        np.testing.assert_allclose(
            np.asarray(got_params[k]), want,
            rtol=1e-5, atol=5e-5, err_msg=k)


def test_grad_accum_gan_step(tiny_bundle):
    """Accumulated GAN step: finite losses, BOTH networks updated."""
    config, params = tiny_bundle
    gen_params = {k: jnp.asarray(v) for k, v in params.items()}
    disc_params = init_discriminator_params(0)
    gen_opt = optax.adamw(2e-4)
    disc_opt = optax.adamw(2e-4)
    step = make_gan_train_step(
        config, gen_opt, disc_opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
        donate=False, grad_accum=2,
    )
    rng = np.random.default_rng(11)
    batch = _random_batch(config, rng, B=4)
    out = step(gen_params, disc_params, gen_opt.init(gen_params),
               disc_opt.init(disc_params), batch, jax.random.PRNGKey(0))
    new_gen, new_disc, _, _, metrics = out
    for v in metrics:
        assert np.isfinite(float(v)), metrics
    assert not np.allclose(np.asarray(new_gen["decoder.conv_pre.weight"]),
                           np.asarray(gen_params["decoder.conv_pre.weight"]))
    moved_disc = any(
        not np.allclose(np.asarray(new_disc[k]), np.asarray(disc_params[k]))
        for k in list(disc_params)[:4]
    )
    assert moved_disc


def test_grad_accum_on_mesh(tiny_bundle):
    """Accumulation composes with the dp mesh (microbatch rows stay sharded)."""
    from vits_tpu.parallel.mesh import data_sharding, make_mesh, shard_params

    config, params = tiny_bundle
    mesh = make_mesh(data=8, model=1)
    with mesh:
        sharded = shard_params(params, mesh, model_parallel=False)
        opt = optax.adamw(2e-4)
        step = make_train_step(config, opt, segment_frames=8,
                               mel_kwargs=MEL_KWARGS, donate=False,
                               grad_accum=2)
        rng = np.random.default_rng(13)
        batch_np = _random_batch(config, rng, B=8)
        ds = data_sharding(mesh)
        batch = TrainBatch(*[
            None if x is None else jax.device_put(x, ds) for x in batch_np
        ])
        _, _, metrics = step(sharded, opt.init(sharded), batch,
                             jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics.loss))


def test_zero1_opt_state_sharded_and_equivalent(tiny_bundle):
    """ZeRO-1: Adam moments shard 1/dp per chip; the training math is
    unchanged (first-step mu == (1-b1) * grad regardless of sharding)."""
    from vits_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        opt_state_shardings,
        shard_opt_state,
        shard_params,
    )

    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(29)
    batch_np = _random_batch(config, rng, B=8)
    key = jax.random.PRNGKey(9)
    opt = optax.adamw(2e-4)

    # --- reference: single-device step ---------------------------------- #
    ref_step = make_train_step(config, opt, segment_frames=8,
                               mel_kwargs=MEL_KWARGS, donate=False)
    _, ref_opt, ref_metrics = ref_step(params, opt.init(params), batch_np, key)

    # --- ZeRO-1 over an 8-way data mesh ---------------------------------- #
    mesh = make_mesh(data=8, model=1)
    with mesh:
        p = shard_params(params, mesh, model_parallel=False)
        opt_state = shard_opt_state(opt.init(p), mesh)
        shardings = opt_state_shardings(opt_state, mesh)
        step = make_train_step(config, opt, segment_frames=8,
                               mel_kwargs=MEL_KWARGS, donate=False,
                               opt_shardings=shardings)
        ds = data_sharding(mesh)
        batch = TrainBatch(*[
            None if x is None else jax.device_put(x, ds) for x in batch_np
        ])
        new_p, new_opt, metrics = step(p, opt_state, batch, key)

    np.testing.assert_allclose(float(metrics.loss), float(ref_metrics.loss),
                               rtol=1e-5)
    # moments are physically sharded: each chip holds 1/8 of the big tensors
    mu = new_opt[0].mu["text_encoder.embed_tokens.weight"]
    assert len(mu.sharding.device_set) == 8
    shard_elems = int(np.prod(mu.addressable_shards[0].data.shape))
    assert shard_elems * 8 == mu.size, (mu.addressable_shards[0].data.shape, mu.shape)
    # and numerically equal to the unsharded moments (linear in the grads;
    # tolerance covers sharded-vs-replicated reduction-order noise)
    ref_mu = np.asarray(ref_opt[0].mu["text_encoder.embed_tokens.weight"])
    np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=3e-3, atol=1e-6)


def test_bf16_master_params_stay_fp32(tiny_bundle):
    """bf16 GAN step: finite losses, fp32 master params, weights move."""
    config, params = tiny_bundle
    gen_params = {k: jnp.asarray(v) for k, v in params.items()}
    disc_params = init_discriminator_params(0)
    gen_opt = optax.adamw(2e-4)
    disc_opt = optax.adamw(2e-4)
    step = make_gan_train_step(
        config, gen_opt, disc_opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
        donate=False, compute_dtype="bfloat16",
    )
    rng = np.random.default_rng(17)
    batch = _random_batch(config, rng, B=2)
    new_gen, new_disc, _, _, metrics = step(
        gen_params, disc_params, gen_opt.init(gen_params),
        disc_opt.init(disc_params), batch, jax.random.PRNGKey(1))
    for v in metrics:
        assert np.isfinite(float(v)), metrics
    assert new_gen["decoder.conv_pre.weight"].dtype == jnp.float32
    assert next(iter(new_disc.values())).dtype == jnp.float32
    assert not np.allclose(np.asarray(new_gen["decoder.conv_pre.weight"]),
                           np.asarray(gen_params["decoder.conv_pre.weight"]))


def test_bf16_grads_agree_with_fp32(tiny_bundle):
    """bf16 generator grads point the same way as fp32 grads (cosine >= 0.97
    on the concatenated gradient vector — direction, not magnitude, is what
    the optimizer consumes)."""
    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    rng = np.random.default_rng(19)
    batch = _random_batch(config, rng, B=2)
    key = jax.random.PRNGKey(5)

    def grads_at(dtype):
        f = jax.jit(jax.value_and_grad(
            lambda prm: generator_loss(
                prm, config, batch, key, segment_frames=8,
                mel_kwargs=MEL_KWARGS, compute_dtype=dtype)[0],
        ))
        _, g = f(params)
        return np.concatenate([np.asarray(v).ravel() for _, v in sorted(g.items())])

    g32 = grads_at(None)
    g16 = grads_at("bfloat16")
    assert g16.dtype == np.float32  # cast edge returns fp32 master grads
    cos = float(g32 @ g16 / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-12))
    assert cos >= 0.97, cos


def test_bf16_loss_decreases(tiny_bundle):
    """End-to-end: a few bf16 steps on a fixed batch reduce the loss."""
    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(config, opt, segment_frames=8, mel_kwargs=MEL_KWARGS,
                           donate=False, compute_dtype="bfloat16")
    rng = np.random.default_rng(23)
    batch = _random_batch(config, rng, B=2)
    key = jax.random.PRNGKey(42)
    losses = []
    for _ in range(5):
        params, opt_state, metrics = step(params, opt_state, batch, key)
        losses.append(float(metrics.loss))
    assert losses[-1] < losses[0], losses
