"""Synthesizer engine tests: bucketing, jit caching, overflow re-dispatch, WAV."""

import io

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.synthesizer import Synthesizer, _next_bucket
from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.utils.wav import pcm16, read_wav, write_wav

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def engine_model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32, 64), frames_per_token=2.0)
    return Synthesizer(config, tok, params, eng)


def test_next_bucket():
    assert _next_bucket((64, 128, 256), 1) == 64
    assert _next_bucket((64, 128, 256), 64) == 64
    assert _next_bucket((64, 128, 256), 65) == 128
    assert _next_bucket((64, 128, 256), 300) == 512  # beyond largest: rounds up


def test_synthesize_single(engine_model):
    wave = engine_model.synthesize("hello sad dame", seed=0)
    assert wave.ndim == 1 and wave.dtype == np.float32
    assert len(wave) > 0 and np.isfinite(wave).all()
    assert np.abs(wave).max() <= 1.0


def test_synthesize_deterministic_per_seed(engine_model):
    a = engine_model.synthesize("hello sad dame", seed=7)
    b = engine_model.synthesize("hello sad dame", seed=7)
    c = engine_model.synthesize("hello sad dame", seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_synthesize_batch_lengths(engine_model):
    waves = engine_model.synthesize(["hello sad dame", "ab"], seed=0)
    assert isinstance(waves, list) and len(waves) == 2
    assert len(waves[0]) != len(waves[1])


def test_batch_rows_draw_independent_noise(engine_model):
    """Identical texts in one batch must get independent noise draws
    (each row is its own utterance, not a copy)."""
    waves_batch = engine_model.synthesize(["hello", "hello"], seed=3)
    assert not np.array_equal(waves_batch[0], waves_batch[1])


def test_overflow_redispatch(tiny_bundle):
    """A tiny frame budget must escalate until the utterance fits."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,), frames_per_token=0.125)  # absurdly small
    model = Synthesizer(config, tok, params, eng)
    out = model.synthesize_raw("hello sad dame", seed=0, max_redispatch=8)
    predicted = int(np.asarray(out.frame_lengths)[0])
    capacity = np.asarray(out.waveform).shape[1] // config.total_upsample
    assert capacity >= predicted  # escalation reached a fitting bucket


def test_warmup_compiles_without_error(engine_model):
    """warmup() drives _dispatch directly; regression: it crashed on the raw
    output tuple after the single-device_get refactor (broke server startup)."""
    engine_model.warmup(batch_sizes=(1,), token_buckets=(32,))
    assert engine_model.stats["dispatches"] > 0


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal(1000) * 0.3, -1, 1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, audio, 16000)
    back, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(back, audio, atol=1.0 / 32000)


def test_pcm16_clamps():
    out = pcm16(np.array([-2.0, 0.0, 2.0], np.float32))
    assert out.tolist() == [-32767, 0, 32767]
