"""Time-axis sharded decode (engine/sp.py): sample-exact vs one-shot.

Runs on the 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8), same as the other mesh tests.
"""

import numpy as np
import pytest

import jax

import vits_tpu
from vits_tpu.config import EngineConfig
from vits_tpu.engine.sp import ShardedDecoder
from vits_tpu.parallel.mesh import make_mesh

FIXTURE = "tests/fixtures/tiny-vits.ggml"
ENGINE_KW = dict(
    token_buckets=(64,), frames_per_token=4.0, use_pallas_vocoder=False,
    use_pallas_attention=False, transfer_int16=False,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def model():
    return vits_tpu.load_model(FIXTURE, EngineConfig(**ENGINE_KW))


@pytest.fixture(scope="module")
def sp8(model):
    return ShardedDecoder(model, mesh=make_mesh(data=8, model=1))


@pytest.mark.parametrize("text,seed", [
    ("hello sharded decoder well cheese and more words to say", 6),
    ("a", 0),  # single-token utterance, most shards fully padded
    ("my sweet valley hums a song of sad dames and wellness", 123),
])
def test_sample_exact_vs_oneshot(model, sp8, text, seed):
    ref = model.synthesize(text, seed=seed)
    got = sp8.synthesize(text, seed=seed)
    np.testing.assert_array_equal(ref, got)


def test_nondividing_shard_count(model):
    """3 shards over a capacity not divisible by 3: ceil + tail padding."""
    sp3 = ShardedDecoder(model, mesh=make_mesh(data=3, model=1,
                                               devices=jax.devices()[:3]))
    text = "hello sad dame be well"
    ref = model.synthesize(text, seed=2)
    np.testing.assert_array_equal(ref, sp3.synthesize(text, seed=2))


def test_controls_and_overflow_ladder(model, sp8):
    """speaking_rate overflow rides the doubling ladder identically."""
    text = "hello sad dame be well and hum"
    kw = dict(seed=9, speaking_rate=0.5)  # ~2x frames: overflows 4.0 ratio
    ref = model.synthesize(text, **kw)
    got = sp8.synthesize(text, **kw)
    np.testing.assert_array_equal(ref, got)


def test_speaker_conditioning(model, sp8):
    if getattr(model.config, "num_speakers", 1) <= 1:
        pytest.skip("fixture is single-speaker")
    text = "hello well spoken"
    ref = model.synthesize(text, seed=4, speaker_id=1)
    got = sp8.synthesize(text, seed=4, speaker_id=1)
    np.testing.assert_array_equal(ref, got)


def test_mesh_synthesizer_params_reused():
    mesh = make_mesh(data=8, model=1)
    m = vits_tpu.load_model(FIXTURE, EngineConfig(**ENGINE_KW), mesh=mesh)
    sp = ShardedDecoder(m, mesh=mesh)
    assert sp._params is m.params  # replicated params are shared, not copied
    ref = vits_tpu.load_model(FIXTURE, EngineConfig(**ENGINE_KW))
    text = "hello mesh engine"
    np.testing.assert_array_equal(
        ref.synthesize(text, seed=1), sp.synthesize(text, seed=1))


def test_requires_mesh(model):
    with pytest.raises(ValueError, match="mesh"):
        ShardedDecoder(model)
