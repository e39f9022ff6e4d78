"""Streaming decode must be sample-exact vs one-shot synthesis."""

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.streaming import StreamingDecoder
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.text.tokenizer import VitsTokenizer

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    # transfer_int16=False: the sample-exactness invariant is between the
    # streaming decode and the one-shot decode; the engine's int16 transfer
    # quantization (<= 1/32767) is checked separately below.
    eng = EngineConfig(token_buckets=(64,), frames_per_token=4.0, transfer_int16=False)
    return Synthesizer(config, tok, params, eng)


def test_stream_concat_equals_oneshot(model):
    text = "hello sad dame well cheese"
    oneshot = model.synthesize(text, seed=5)
    # margin >= vocoder receptive field (tiny config RF is well under 16)
    stream = StreamingDecoder(model, chunk_frames=32, margin_frames=16)
    streamed = stream.synthesize_streaming(text, seed=5)
    assert streamed.shape == oneshot.shape
    np.testing.assert_allclose(streamed, oneshot, atol=2e-6)


def test_stream_yields_multiple_chunks(model):
    text = "hello sad dame well cheese"
    chunks = list(StreamingDecoder(model, chunk_frames=16, margin_frames=16).stream(text, seed=5))
    assert len(chunks) >= 2
    up = model.config.total_upsample
    assert all(len(c) % up == 0 for c in chunks[:-1])


def test_int16_transfer_quantization_bounded(tiny_bundle):
    """Default engine mode ships int16 PCM; error must stay <= 1/32767."""
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    exact = Synthesizer(
        config, tok, params, EngineConfig(token_buckets=(64,), transfer_int16=False)
    ).synthesize("hello sad dame", seed=4)
    quant = Synthesizer(
        config, tok, params, EngineConfig(token_buckets=(64,), transfer_int16=True)
    ).synthesize("hello sad dame", seed=4)
    assert quant.shape == exact.shape
    np.testing.assert_allclose(quant, exact, atol=1.0 / 32767 + 1e-7)


def test_stream_small_margin_detectably_diverges(model):
    """Sanity of the exactness test: a 0 margin must NOT be exact (otherwise
    the overlap machinery is vacuous)."""
    text = "hello sad dame well cheese"
    oneshot = model.synthesize(text, seed=5)
    streamed = StreamingDecoder(
        model, chunk_frames=16, margin_frames=0, flow_margin_frames=0
    ).synthesize_streaming(text, seed=5)
    assert streamed.shape == oneshot.shape
    assert not np.allclose(streamed, oneshot, atol=2e-6)


def test_warmup_compiles_stream_programs(model):
    """warmup() must populate the prior/decode program caches so the first
    real stream pays no cold compile, and streaming afterwards still matches
    the one-shot decode."""
    stream = StreamingDecoder(model, chunk_frames=32, margin_frames=16)
    stream.warmup()
    assert stream._prior_fn_cache and stream._decode_fn_cache
    text = "hello sad dame well cheese"
    streamed = stream.synthesize_streaming(text, seed=5)
    oneshot = model.synthesize(text, seed=5)
    np.testing.assert_allclose(streamed, oneshot, atol=2e-6)
