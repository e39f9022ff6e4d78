"""Regression tests for code-review findings (round 1)."""

import numpy as np
import pytest

from vits_tpu.config import EngineConfig
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.text.tokenizer import VitsTokenizer

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


def test_bfloat16_lengths_match_fp32(tiny_bundle):
    """Duration/alignment bookkeeping must be fp32 even in bf16 compute mode:
    bf16 cannot represent integers > 256, which corrupted frame alignment."""
    import jax
    import jax.numpy as jnp

    from vits_tpu.models.vits import NoiseOverride, synthesize

    config, params = tiny_bundle
    rng = np.random.default_rng(0)
    B, T, F = 1, 24, 512  # frame capacity far above 256
    ids = rng.integers(1, config.vocab_size, (B, T)).astype(np.int32)

    def run(dtype):
        prm = {
            k: jnp.asarray(v).astype(dtype) if np.asarray(v).dtype == np.float32 else jnp.asarray(v)
            for k, v in params.items()
        }
        mask = jnp.ones((B, T), dtype)
        noise = NoiseOverride(
            duration=jnp.zeros((B, T, 2), dtype),
            prior=jnp.zeros((B, F, config.flow_size), dtype),
        )
        return synthesize(prm, config, ids, mask, F, noise=noise)

    for dtype in (jnp.float32, jnp.bfloat16):
        out = run(dtype)
        # The model may legitimately predict different durations in bf16, but
        # the frame BOOKKEEPING (exp/ceil/cumsum/clip) must match an exact
        # fp32 host recomputation from the model's own log-durations — with
        # bf16 bookkeeping, the >256-frame sums/comparisons drift.
        log_dur = np.asarray(out.log_duration, np.float32)[0, :, 0]
        expected = int(max(np.sum(np.ceil(np.exp(log_dur))), 1.0))
        assert int(out.frame_lengths[0]) == expected, dtype
        assert int(out.lengths[0]) == min(expected, F) * config.total_upsample


def test_quantized_params_through_engine(tiny_bundle):
    """int8 params must serve through the Synthesizer (dequant in ParamView);
    previously the engine silently consumed raw unscaled int8 weights."""
    from vits_tpu.io.quantize import quantize_params

    config, params = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32,))

    import jax

    from vits_tpu.models.vits import synthesize

    qparams = quantize_params(params)
    model_q = Synthesizer(config, tok, qparams, eng)
    out_engine = model_q.synthesize_raw("hello sad dame", seed=0, max_redispatch=0)

    # Direct model call with the SAME quantized dict, shapes, and key — the
    # engine path must be bit-identical (previously it silently consumed raw
    # unscaled int8 weights).
    ids, mask = tok(["hello sad dame"], pad_to=32)
    out_direct = synthesize(
        qparams, config, ids, mask,
        model_q.engine.frame_bucket(32), rng=jax.random.PRNGKey(0),
    )
    # allclose not equal: the engine path is jitted (fused float ordering)
    # while the direct call traces eagerly; raw unscaled int8 weights would
    # differ by O(1), not 1e-5.
    np.testing.assert_allclose(
        np.asarray(out_engine.waveform), np.asarray(out_direct.waveform), atol=1e-4
    )
    # and the output must be sane audio, not int8 garbage
    wave = np.asarray(out_engine.waveform)
    assert np.isfinite(wave).all() and 0 < np.abs(wave).max() <= 1.0


def test_stream_speaker_id_supported(tiny_bundle):
    """StreamingDecoder must thread speaker_id (was silently dropped)."""
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel
    import torch

    from vits_tpu.engine.streaming import StreamingDecoder
    from vits_tpu.io.loader import load_hf_module

    torch.manual_seed(2)
    hf = VitsModel(HFVitsConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2, ffn_dim=64,
        flow_size=16, spectrogram_bins=65, upsample_initial_channel=32,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3]],
        prior_encoder_num_flows=1, prior_encoder_num_wavenet_layers=1,
        posterior_encoder_num_wavenet_layers=1, duration_predictor_num_flows=1,
        duration_predictor_flow_bins=4, depth_separable_num_layers=1,
        duration_predictor_filter_channels=16,
        num_speakers=3, speaker_embedding_size=8,
    )).eval()
    config, _, params = load_hf_module(hf)
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))
    stream = StreamingDecoder(model, chunk_frames=16, margin_frames=8)
    a = stream.synthesize_streaming("hello dame", seed=0, speaker_id=0)
    b = stream.synthesize_streaming("hello dame", seed=0, speaker_id=2)
    n = min(len(a), len(b))
    assert not np.allclose(a[:n], b[:n])
