"""End-to-end engine runs for every precision policy combination.

Round-1 review finding: ``compute_dtype="bfloat16"`` existed but no test ran
the engine with it (and it was in fact broken — traced fp32 control scalars
promoted bf16 activations to fp32 inside the SDP/prior, crashing the convs).
These tests pin the full synthesize path for bf16 compute, int8 weights, and
their combination, on the committed fixture checkpoint.
"""

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.io.loader import load_ggml
from vits_tpu.io.quantize import quantize_params

FIXTURE = "tests/fixtures/tiny-vits.ggml"


@pytest.fixture(scope="module")
def bundle():
    return load_ggml(FIXTURE)


def make(bundle, dtype="float32", int8=False):
    config, tok, params = bundle
    if int8:
        params = quantize_params(params)
    return Synthesizer(
        config, tok, params,
        EngineConfig(token_buckets=(64,), compute_dtype=dtype,
                     use_pallas_vocoder=False),
    )


@pytest.mark.parametrize("dtype,int8", [
    ("bfloat16", False),
    ("float32", True),
    ("bfloat16", True),
])
def test_variant_synthesizes(bundle, dtype, int8):
    m = make(bundle, dtype, int8)
    w = m.synthesize("hello world", seed=3)
    assert w.dtype == np.float32 and w.ndim == 1 and len(w) > 0
    assert np.all(np.isfinite(w)) and np.abs(w).max() <= 1.0


def test_int8_close_to_fp32(bundle):
    """int8 weights + fp32 compute draw the SAME noise as fp32 — output must
    stay in the same neighborhood (weight quantization error only).

    Sample-level correlation is NOT a usable metric here: the quantized SDP
    predicts slightly different durations, so the waveforms time-shift
    (measured on this fixture: 3408 vs 3328 samples, corr 0.73 despite
    near-identical audio).  Pin duration drift and log-mel distance instead.
    """
    from vits_tpu.utils.mel import mel_l1

    ref = make(bundle).synthesize("the quick brown fox", seed=7)
    q = make(bundle, int8=True).synthesize("the quick brown fox", seed=7)
    n = min(len(ref), len(q))
    assert n > 0
    assert abs(len(ref) - len(q)) / len(ref) < 0.1  # durations within 10%
    d = float(mel_l1(ref[None, :n], q[None, :n], sample_rate=16000))
    assert d < 0.5, d


def test_controls_stay_bf16(bundle):
    """Per-call control overrides must not re-promote bf16 activations."""
    m = make(bundle, "bfloat16")
    w = m.synthesize("hello", seed=0, noise_scale=0.5, speaking_rate=1.5,
                     noise_scale_duration=0.2)
    assert np.all(np.isfinite(w))
