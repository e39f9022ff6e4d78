"""Long-form synthesis, engine stats, espeak fallback behavior."""

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.longform import split_sentences, synthesize_long
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.text.tokenizer import VitsTokenizer

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc.")}


@pytest.fixture(scope="module")
def model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    return Synthesizer(config, tok, params, EngineConfig(token_buckets=(64,)))


def test_split_sentences():
    text = "Hello there. How are you today? I am fine; thanks!   "
    parts = split_sentences(text)
    assert parts == ["Hello there.", "How are you today?", "I am fine;", "thanks!"]


def test_split_long_sentence_at_commas():
    text = "a" * 100 + ", " + "b" * 100 + ", " + "c" * 100
    parts = split_sentences(text, max_chars=120)
    assert all(len(p) <= 120 for p in parts)
    assert "".join(parts).count("a") == 100


def test_synthesize_long_concatenates(model):
    text = "hello sad dame. my sweet валley shell."
    audio = synthesize_long(model, text, seed=0, gap_ms=50)
    assert audio.ndim == 1 and len(audio) > 0
    # must be longer than either sentence alone and contain the silence gap
    solo = model.synthesize("hello sad dame.", seed=0)
    assert len(audio) > len(solo)
    gap = int(model.config.sampling_rate * 0.05)
    assert gap > 0


def test_synthesize_long_empty(model):
    assert len(synthesize_long(model, "   ")) == 0


def test_engine_stats_accumulate(model):
    before = dict(model.stats)
    model.synthesize("hello dame", seed=0)
    after = model.stats
    assert after["dispatches"] > before["dispatches"]
    assert after["audio_seconds"] > before["audio_seconds"]
    assert after["wall_seconds"] > before["wall_seconds"]


def test_espeak_unavailable_raises_cleanly():
    from vits_tpu.text.phonemizer import Phonemizer, PhonemizerUnavailable

    try:
        Phonemizer(language="en-us")
        has_espeak = True
    except PhonemizerUnavailable as exc:
        has_espeak = False
        assert "espeak" in str(exc)
    if has_espeak:
        pytest.skip("espeak present on this system")


def test_phonetic_tokenizer_fails_without_espeak():
    from vits_tpu.text.phonemizer import PhonemizerUnavailable

    try:
        VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z", phonetic=True)
    except PhonemizerUnavailable:
        pass  # expected on espeak-less systems
    else:
        pytest.skip("espeak present on this system")
