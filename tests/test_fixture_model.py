"""Torch-free smoke tests on the committed tiny checkpoint fixture.

tests/fixtures/tiny-vits.ggml is a self-contained (fp16-conv, training-
complete) random model in the reference format — nothing here imports torch
or transformers, demonstrating the torch-free deployment path end-to-end.
"""

import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny-vits.ggml")


@pytest.fixture(scope="module")
def model():
    import vits_tpu
    from vits_tpu.config import EngineConfig

    return vits_tpu.load_model(FIXTURE, EngineConfig(token_buckets=(32, 64)))


def test_fixture_loads_and_synthesizes(model):
    wave = model.synthesize("hello sad dame", seed=0)
    assert wave.dtype == np.float32 and len(wave) > 0
    assert np.isfinite(wave).all() and np.abs(wave).max() <= 1.0


def test_fixture_deterministic(model):
    a = model.synthesize("well hum", seed=3)
    b = model.synthesize("well hum", seed=3)
    np.testing.assert_array_equal(a, b)


def test_fixture_streaming_matches(model):
    from vits_tpu.engine.streaming import StreamingDecoder

    text = "hello sad dame well cheese ask me"
    # disable the engine's int16 transfer for the exactness comparison
    import vits_tpu
    from vits_tpu.config import EngineConfig

    exact_model = vits_tpu.load_model(
        FIXTURE, EngineConfig(token_buckets=(64,), transfer_int16=False)
    )
    oneshot = exact_model.synthesize(text, seed=1)
    streamed = StreamingDecoder(
        exact_model, chunk_frames=16, margin_frames=16
    ).synthesize_streaming(text, seed=1)
    np.testing.assert_allclose(streamed, oneshot, atol=2e-6)


def test_fixture_trains_without_torch(tmp_path):
    """One recon train step from the fixture — the full torch-free loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vits_tpu.io.loader import load_ggml
    from vits_tpu.train.schedule import vits_optimizer
    from vits_tpu.train.step import TrainBatch, make_train_step

    config, tok, params = load_ggml(FIXTURE)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    opt = vits_optimizer(1e-4, steps_per_epoch=10)
    step = make_train_step(config, opt, segment_frames=8,
                           mel_kwargs={"n_fft": 256, "hop_length": 64, "n_mels": 20},
                           donate=False)
    rng = np.random.default_rng(0)
    B, T, S = 2, 10, 20
    batch = TrainBatch(
        input_ids=rng.integers(0, config.vocab_size, (B, T)).astype(np.int32),
        token_mask=np.ones((B, T), np.float32),
        spectrogram=rng.standard_normal((B, S, config.spectrogram_bins)).astype(np.float32),
        frame_mask=np.ones((B, S), np.float32),
        audio=(rng.standard_normal((B, S * config.total_upsample)) * 0.1).astype(np.float32),
    )
    _, _, metrics = step(params, opt.init(params), batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics.loss))
