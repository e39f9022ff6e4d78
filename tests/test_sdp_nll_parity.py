"""Stochastic duration predictor TRAINING direction (NLL) parity vs HF.

HF's SDP forward branch (modeling_vits.py, reverse=False) is the only
training-path oracle transformers exposes; pinning it validates our duration
loss end-to-end (posterior flows, spline forward direction, log-determinants)."""

import numpy as np
import pytest
import torch

from vits_tpu.io.params import ParamView
from vits_tpu.models.duration import stochastic_duration_predictor_nll

from tests.test_modules_parity import _det_randn_patcher


def test_sdp_nll_matches_hf(tiny_hf_model, tiny_bundle, monkeypatch):
    config, params = tiny_bundle
    rng = np.random.default_rng(0)
    B, T = 2, 9
    hidden = rng.standard_normal((B, T, config.hidden_size)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    mask[1, 6:] = 0.0
    hidden *= mask[..., None]
    durations = (rng.integers(1, 6, (B, T)).astype(np.float32)) * mask

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        hf_nll = tiny_hf_model.duration_predictor(
            torch.tensor(hidden).transpose(1, 2),
            torch.tensor(mask)[:, None, :],
            None,
            durations=torch.tensor(durations)[:, None, :],
            reverse=False,
        )
    # HF draws one posterior noise tensor (B, 2, T)
    noise = recorded[0].numpy().transpose(0, 2, 1)

    got = stochastic_duration_predictor_nll(
        ParamView(params), config, hidden, mask[..., None],
        durations[..., None], noise,
    )
    np.testing.assert_allclose(np.asarray(got), hf_nll.numpy(), rtol=1e-4, atol=1e-3)
