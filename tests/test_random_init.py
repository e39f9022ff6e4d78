"""Pin the numpy shape builder against the HF-derived shape set."""

import numpy as np
import pytest

from vits_tpu.io.random_init import _random_params_numpy, random_params


@pytest.mark.parametrize("keep_training", [True, False])
def test_numpy_shapes_match_hf(tiny_hf_model, keep_training):
    from vits_tpu.io.loader import load_hf_module

    config, _, hf_params = load_hf_module(tiny_hf_model, keep_training=keep_training)
    np_params = _random_params_numpy(config, seed=0, keep_training=keep_training)
    missing = sorted(set(hf_params) - set(np_params))
    extra = sorted(set(np_params) - set(hf_params))
    assert not missing, f"numpy builder missing: {missing[:8]}"
    assert not extra, f"numpy builder extra: {extra[:8]}"
    for name in hf_params:
        assert np_params[name].shape == hf_params[name].shape, (
            name, np_params[name].shape, hf_params[name].shape)


def test_numpy_params_synthesize(tiny_bundle):
    """The numpy-initialized model must run the full pipeline."""
    import jax

    from vits_tpu.models.vits import synthesize

    config, _ = tiny_bundle
    params = _random_params_numpy(config, seed=0, keep_training=False)
    ids = np.ones((1, 9), np.int32)
    mask = np.ones((1, 9), np.float32)
    out = synthesize(params, config, ids, mask, 32, rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out.waveform)).all()
