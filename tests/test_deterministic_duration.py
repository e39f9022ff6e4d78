"""Deterministic (non-stochastic) duration predictor parity vs HF.

Exercises ``use_stochastic_duration_prediction=False`` — the VitsDurationPredictor
variant the reference explicitly rejects (vits.cpp:993 asserts stochastic-only)."""

import numpy as np
import pytest
import torch

from vits_tpu.io.loader import load_hf_module
from vits_tpu.io.params import ParamView
from vits_tpu.models.duration import duration_predictor
from vits_tpu.models.vits import NoiseOverride, synthesize

from tests.test_modules_parity import _det_randn_patcher


@pytest.fixture(scope="module")
def det_hf_model():
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel

    torch.manual_seed(7)
    cfg = HFVitsConfig(
        vocab_size=38, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        ffn_dim=64, flow_size=16, spectrogram_bins=65, upsample_initial_channel=32,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 3], [1, 3]],
        prior_encoder_num_flows=2, prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=2,
        duration_predictor_filter_channels=24,
        use_stochastic_duration_prediction=False,
    )
    model = VitsModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def det_bundle(det_hf_model):
    config, _, params = load_hf_module(det_hf_model, keep_training=True)
    assert config.use_stochastic_duration_prediction is False
    return config, params


def test_duration_predictor_matches_hf(det_hf_model, det_bundle):
    config, params = det_bundle
    rng = np.random.default_rng(0)
    B, T = 2, 11
    hidden = rng.standard_normal((B, T, config.hidden_size)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 7:] = 0.0
    hidden *= mask[..., None]

    with torch.no_grad():
        hf_out = det_hf_model.duration_predictor(
            torch.tensor(hidden).transpose(1, 2),
            torch.tensor(mask)[:, None, :],
        )
    got = duration_predictor(ParamView(params), config, hidden, mask[..., None])
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], hf_out.numpy()[:, 0, :], atol=1e-5
    )


def test_e2e_deterministic_duration_matches_hf(det_hf_model, det_bundle, monkeypatch):
    config, params = det_bundle
    rng_np = np.random.default_rng(1)
    ids = rng_np.integers(0, config.vocab_size, size=(1, 9)).astype(np.int32)
    mask = np.ones((1, 9), np.float32)

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        hf_out = det_hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            return_dict=True,
        )
    # only ONE noise draw in the deterministic path (the prior sample)
    prior_hf = recorded[0].numpy().transpose(0, 2, 1)
    num_frames = hf_out.spectrogram.shape[2] + 8
    prior = np.zeros((1, num_frames, config.flow_size), np.float32)
    prior[:, : prior_hf.shape[1]] = prior_hf
    noise = NoiseOverride(
        duration=np.zeros((1, 9, 2), np.float32),  # unused in deterministic mode
        prior=prior,
    )
    out = synthesize(params, config, ids, mask, num_frames, noise=noise)
    hf_len = int(hf_out.sequence_lengths[0])
    assert int(out.lengths[0]) == hf_len
    np.testing.assert_allclose(
        np.asarray(out.waveform)[0, :hf_len],
        hf_out.waveform.numpy()[0, :hf_len],
        atol=2e-4,
    )
