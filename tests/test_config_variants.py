"""Second-config-shape coverage (VERDICT weak #10).

BASELINE lists vits-spanish as a supported artifact: same graph, different
vocab/config values.  The tiny fixture exercises one shape only; this builds a
distinct variant (Spanish-style vocab size, different SDP/flow widths) through
the same random-HF machinery and proves the whole pipeline — config round-trip,
export/load, synthesis — is shape-generic, not tuned to one config.
"""

import numpy as np
import pytest

from vits_tpu.config import VitsConfig


@pytest.fixture(scope="module")
def spanish_like_bundle():
    import torch
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel

    from vits_tpu.io.loader import load_hf_module

    torch.manual_seed(7)
    cfg = HFVitsConfig(
        vocab_size=43,  # mms-tts-spa vocab size (vs 38 for eng)
        hidden_size=48,
        num_hidden_layers=2,
        num_attention_heads=2,
        window_size=4,
        ffn_dim=96,
        ffn_kernel_size=3,
        flow_size=24,
        spectrogram_bins=65,
        upsample_initial_channel=48,
        upsample_rates=[8, 2],
        upsample_kernel_sizes=[16, 4],
        resblock_kernel_sizes=[3, 7],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        prior_encoder_num_flows=3,
        prior_encoder_num_wavenet_layers=3,
        posterior_encoder_num_wavenet_layers=2,
        duration_predictor_num_flows=3,
        duration_predictor_flow_bins=8,
        depth_separable_num_layers=2,
        duration_predictor_filter_channels=48,
    )
    model = VitsModel(cfg)
    model.eval()
    config, _, params = load_hf_module(model, keep_training=False)
    return config, params


def test_variant_config_values(spanish_like_bundle):
    config, _ = spanish_like_bundle
    assert config.vocab_size == 43
    assert config.total_upsample == 16
    assert config.prior_encoder_num_flows == 3
    assert config.duration_predictor_num_flows == 3


def test_variant_synthesizes(spanish_like_bundle):
    from vits_tpu.config import EngineConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, params = spanish_like_bundle
    chars = "abcdefghijklmnopqrstuvwxyzáéíóúñü¿¡ '"
    vocab = {c: i for i, c in enumerate(chars[: config.vocab_size])}
    tok = VitsTokenizer(vocab=vocab, pad_token="a", unk_token="b")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32, 64)))
    wave = model.synthesize("cada amanecer trae", seed=0)
    assert wave.ndim == 1 and len(wave) > 0
    assert np.isfinite(wave).all()


def test_variant_ggml_roundtrip(spanish_like_bundle, tmp_path):
    """Export the variant to .ggml and reload: config + params survive."""
    from vits_tpu.io.loader import export_to_ggml, load_ggml
    from vits_tpu.models.vits import NoiseOverride, synthesize
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, params = spanish_like_bundle
    vocab = {c: i for i, c in enumerate("abcdefghijklmnopqrstuvwxyzáéíóúñü¿¡ '"[: config.vocab_size])}
    tok = VitsTokenizer(vocab=vocab, pad_token="a", unk_token="b")
    path = str(tmp_path / "spa.ggml")
    export_to_ggml(path, config, tok, params, fp16_convs=False)
    config2, tok2, params2 = load_ggml(path)
    assert config2 == config
    assert tok2.vocab == vocab

    ids = np.array([[3, 0, 5, 0, 7]], np.int32)
    mask = np.ones((1, 5), np.float32)
    noise = NoiseOverride(
        duration=np.zeros((1, 5, 2), np.float32),
        prior=np.zeros((1, 32, config.flow_size), np.float32),
    )
    a = synthesize(params, config, ids, mask, 32, noise=noise)
    b = synthesize(params2, config2, ids, mask, 32, noise=noise)
    np.testing.assert_allclose(
        np.asarray(a.waveform), np.asarray(b.waveform), atol=1e-6
    )


def test_from_kv_roundtrip_variant():
    """The reference KV block round-trips a non-default config exactly."""
    import dataclasses

    config = VitsConfig(
        vocab_size=43, upsample_rates=(8, 2), upsample_kernel_sizes=(16, 4),
        resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        prior_encoder_num_flows=3, speaking_rate=1.2, phonetic=True,
    )
    kv = {k: str(v) for k, v in dataclasses.asdict(config).items()}
    back = VitsConfig.from_kv(kv)
    assert back == config
