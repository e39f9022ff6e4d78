"""Training checkpoint round-trip + debug toolkit tests."""

import jax
import numpy as np
import optax
import pytest

from vits_tpu.train.checkpoint import (
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from vits_tpu.utils import debug


def test_checkpoint_roundtrip(tmp_path, tiny_bundle):
    import jax.numpy as jnp

    config, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adamw(1e-4)
    opt_state = opt.init(params)

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, 100, params, opt_state, metadata={"note": "test"})
    save_checkpoint(path, 200, params, opt_state)
    assert latest_step(path) == 200

    restored = restore_checkpoint(path, gen_opt_template=opt.init(params))
    assert restored["step"] == 200
    assert set(restored["gen_params"]) == set(params)
    for k in params:
        np.testing.assert_array_equal(restored["gen_params"][k], np.asarray(params[k]))
    # optimizer state round-trips leaf-for-leaf
    orig_leaves = jax.tree_util.tree_leaves(opt_state)
    rest_leaves = jax.tree_util.tree_leaves(restored["gen_opt_state"])
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_prunes_old(tmp_path, tiny_bundle):
    _, params = tiny_bundle
    path = str(tmp_path / "ckpt")
    for step in (1, 2, 3, 4, 5):
        save_checkpoint(path, step, params, keep=2)
    import os

    kept = sorted(os.listdir(path))
    assert kept == ["step_00000004", "step_00000005"]


def test_checkpoint_template_mismatch_raises(tmp_path, tiny_bundle):
    import jax.numpy as jnp

    _, params = tiny_bundle
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = optax.adamw(1e-4)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, 1, params, opt.init(params))
    wrong_opt = optax.sgd(1e-4)  # different state structure
    with pytest.raises(ValueError, match="leaves"):
        restore_checkpoint(path, gen_opt_template=wrong_opt.init(params))


def test_stage_dump_compare_roundtrip(tmp_path, tiny_bundle):
    config, params = tiny_bundle
    ids = np.ones((1, 9), np.int32)
    mask = np.ones((1, 9), np.float32)
    stages = debug.stage_outputs(
        params, config, ids, mask, 32, rng=jax.random.PRNGKey(0)
    )
    assert set(stages) >= {
        "text_encoder_output", "prior_means", "prior_log_variances",
        "log_duration", "latents", "waveform",
    }
    d = str(tmp_path / "stages")
    debug.save_stages(d, stages)
    loaded = debug.load_stages(d)
    report = debug.compare_stages(stages, loaded, atol=0)
    assert all(v == 0.0 for v in report.values())

    # a perturbed stage must fail the comparison
    loaded["latents"] = loaded["latents"] + 1.0
    with pytest.raises(AssertionError, match="latents"):
        debug.compare_stages(stages, loaded, atol=1e-3)


def test_assert_shape_and_prefix():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    debug.assert_shape(x, 3, 4)
    debug.assert_shape(x, None, 4)
    with pytest.raises(AssertionError):
        debug.assert_shape(x, 4, 3)
    debug.assert_starts_with(x, 0.0, 1.0, 2.0)
    with pytest.raises(AssertionError):
        debug.assert_starts_with(x, 5.0, 1.0)
