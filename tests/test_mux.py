"""Multiplexed streaming: batched window dispatches, sample-exact per stream.

The invariant stack: MultiplexedStreamingDecoder output == StreamingDecoder
output == one-shot synthesis, for solo streams, concurrent mixed-seed
streams, and short utterances that ride the mask-padded full-window path.
"""

import threading

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.mux import MultiplexedStreamingDecoder
from vits_tpu.engine.streaming import StreamingDecoder
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.text.tokenizer import VitsTokenizer

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
TEXT = "hello sad dame well cheese"


@pytest.fixture(scope="module")
def model(tiny_bundle):
    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(64,), frames_per_token=4.0,
                       transfer_int16=False)
    return Synthesizer(config, tok, params, eng)


def test_mux_single_stream_equals_oneshot(model):
    oneshot = model.synthesize(TEXT, seed=5)
    mux = MultiplexedStreamingDecoder(model, chunk_frames=32, margin_frames=16,
                                      max_batch=4)
    try:
        streamed = mux.synthesize_streaming(TEXT, seed=5)
    finally:
        mux.stop()
    assert streamed.shape == oneshot.shape
    np.testing.assert_allclose(streamed, oneshot, atol=2e-6)


def test_mux_concurrent_streams_exact_and_batched(model):
    """Three concurrent streams: each sample-exact vs the SOLO streaming
    decoder, and the worker actually coalesced windows (fewer dispatches
    than windows)."""
    texts = [TEXT, "hello dame", "cheese well said hello sad dame"]
    seeds = [5, 11, 23]
    solo = StreamingDecoder(model, chunk_frames=16, margin_frames=16)
    expected = [solo.synthesize_streaming(t, seed=s)
                for t, s in zip(texts, seeds)]

    mux = MultiplexedStreamingDecoder(
        model, chunk_frames=16, margin_frames=16, max_batch=4,
        batch_window_ms=100.0,  # generous pickup so the threads coalesce
    )
    results = [None] * len(texts)
    errors = []

    def run(i):
        try:
            results[i] = mux.synthesize_streaming(texts[i], seed=seeds[i])
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append((i, exc))

    try:
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(texts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        mux.stop()

    assert not errors, errors
    for got, want in zip(results, expected):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)
    assert mux.stats["windows"] >= mux.stats["dispatches"]
    assert mux.stats["max_rows"] >= 2, mux.stats  # coalescing happened
    assert mux.stats["dispatches"] < mux.stats["windows"], mux.stats


def test_mux_short_utterance_padded_path(model):
    """An utterance that fits in one window rides the mask-padded
    full-window program and still matches one-shot synthesis."""
    short = "hi"
    oneshot = model.synthesize(short, seed=3)
    mux = MultiplexedStreamingDecoder(model, chunk_frames=64, margin_frames=20,
                                      max_batch=4)
    try:
        streamed = mux.synthesize_streaming(short, seed=3)
    finally:
        mux.stop()
    assert streamed.shape == oneshot.shape
    np.testing.assert_allclose(streamed, oneshot, atol=2e-6)


def test_mux_warmup_compiles_bucketed_programs(model):
    mux = MultiplexedStreamingDecoder(model, chunk_frames=32, margin_frames=16,
                                      max_batch=4)
    try:
        mux.warmup()
        window = mux.chunk_frames + 2 * mux.total_margin
        assert window in mux._decode_fn_cache
        # after warmup a stream must add no NEW window-decode cache entries
        n_before = len(mux._decode_fn_cache)
        _ = mux.synthesize_streaming(TEXT, seed=5)
        assert len(mux._decode_fn_cache) == n_before
    finally:
        mux.stop()
