"""Per-module numerical parity vs HF VitsModel (random tiny weights).

This is the reference's verification strategy (HF activations as goldens,
/root/reference/scripts/verify_layers.py, atol=1e-3) tightened to 1e-5 and run
against every stage boundary the reference checks at
/root/reference/src/vits.cpp:1170-1176.
"""

import numpy as np
import pytest
import torch

from vits_tpu.io.params import ParamView
from vits_tpu.models.duration import stochastic_duration_predictor_reverse
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.posterior import posterior_encoder


def _det_randn_patcher(monkeypatch, seed=0):
    """Make torch.randn/randn_like deterministic and record draws in order."""
    gen = torch.Generator().manual_seed(seed)
    recorded = []
    orig_randn = torch.randn

    def fake_randn(*size, **kwargs):
        if size and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        kwargs.pop("generator", None)
        device = kwargs.pop("device", None)
        dtype = kwargs.pop("dtype", None)
        t = orig_randn(*size, generator=gen)
        if dtype is not None:
            t = t.to(dtype)
        if device is not None:
            t = t.to(device)
        recorded.append(t.clone())
        return t

    def fake_randn_like(t, **kwargs):
        return fake_randn(*t.shape, dtype=t.dtype, device=t.device)

    monkeypatch.setattr(torch, "randn", fake_randn)
    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    return recorded


def test_sdp_reverse_matches_hf(tiny_hf_model, tiny_bundle, monkeypatch):
    config, params = tiny_bundle
    rng = np.random.default_rng(4)
    B, T = 2, 13
    hidden = rng.standard_normal((B, T, config.hidden_size)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.float32)
    mask[1, 8:] = 0.0
    hidden *= mask[..., None]

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        hf_logdur = tiny_hf_model.duration_predictor(
            torch.tensor(hidden).transpose(1, 2),
            torch.tensor(mask)[:, None, :],
            None,
            reverse=True,
            noise_scale=config.noise_scale_duration,
        )
    noise = recorded[0].numpy().transpose(0, 2, 1)  # (B,2,T) -> (B,T,2)

    got = stochastic_duration_predictor_reverse(
        ParamView(params), config, hidden, mask[..., None],
        noise, config.noise_scale_duration,
    )
    np.testing.assert_allclose(
        np.asarray(got)[..., 0], hf_logdur.numpy()[:, 0, :], atol=1e-5
    )


def test_flow_reverse_matches_hf(tiny_hf_model, tiny_bundle):
    config, params = tiny_bundle
    rng = np.random.default_rng(5)
    B, T = 2, 11
    x = rng.standard_normal((B, T, config.flow_size)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.float32)
    mask[1, 6:] = 0.0
    x *= mask[..., None]

    with torch.no_grad():
        hf_out = tiny_hf_model.flow(
            torch.tensor(x).transpose(1, 2),
            torch.tensor(mask)[:, None, :],
            reverse=True,
        )
    got, _ = residual_coupling_block(
        ParamView(params), config, x, mask[..., None], reverse=True
    )
    np.testing.assert_allclose(
        np.asarray(got), hf_out.numpy().transpose(0, 2, 1), atol=1e-5
    )


def test_flow_forward_inverts_reverse(tiny_bundle):
    """forward(reverse(x)) == x — flow invertibility (training dir sanity)."""
    config, params = tiny_bundle
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 9, config.flow_size)).astype(np.float32)
    mask = np.ones((1, 9, 1), dtype=np.float32)
    p = ParamView(params)
    z, _ = residual_coupling_block(p, config, x, mask, reverse=True)
    back, _ = residual_coupling_block(p, config, np.asarray(z), mask, reverse=False)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_hifigan_matches_hf(tiny_hf_model, tiny_bundle):
    config, params = tiny_bundle
    rng = np.random.default_rng(7)
    B, T = 1, 19
    spec = rng.standard_normal((B, T, config.flow_size)).astype(np.float32)

    with torch.no_grad():
        hf_wave = tiny_hf_model.decoder(torch.tensor(spec).transpose(1, 2))
    got = hifigan(ParamView(params), config, spec, None)
    np.testing.assert_allclose(
        np.asarray(got), hf_wave.numpy()[:, 0, :], atol=1e-5
    )


def test_hifigan_mask_padding_invariance(tiny_bundle):
    """Padded+masked run must equal the exact-length run on the valid region."""
    config, params = tiny_bundle
    rng = np.random.default_rng(8)
    T, Tpad = 13, 20
    spec = rng.standard_normal((1, T, config.flow_size)).astype(np.float32)
    p = ParamView(params)

    exact = hifigan(p, config, spec, np.ones((1, T, 1), np.float32))
    spec_pad = np.zeros((1, Tpad, config.flow_size), np.float32)
    spec_pad[:, :T] = spec
    mask = np.zeros((1, Tpad, 1), np.float32)
    mask[:, :T] = 1.0
    padded = hifigan(p, config, spec_pad, mask)

    up = config.total_upsample
    np.testing.assert_allclose(
        np.asarray(padded)[:, : T * up], np.asarray(exact), atol=1e-5
    )
    # Masked tail must be exactly zero.
    assert np.abs(np.asarray(padded)[:, T * up :]).max() == 0.0


def test_posterior_encoder_matches_hf(tiny_hf_model, tiny_bundle, monkeypatch):
    config, params = tiny_bundle
    rng = np.random.default_rng(9)
    B, T = 1, 10
    spec = rng.standard_normal((B, T, config.spectrogram_bins)).astype(np.float32)
    mask = np.ones((B, T), dtype=np.float32)

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        hf_sampled, hf_mean, hf_logstd = tiny_hf_model.posterior_encoder(
            torch.tensor(spec).transpose(1, 2), torch.tensor(mask)[:, None, :]
        )
    noise = recorded[0].numpy().transpose(0, 2, 1)
    sampled, mean, log_stddev = posterior_encoder(
        ParamView(params), config, spec, mask[..., None], noise
    )
    np.testing.assert_allclose(np.asarray(mean), hf_mean.numpy().transpose(0, 2, 1), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_stddev), hf_logstd.numpy().transpose(0, 2, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sampled), hf_sampled.numpy().transpose(0, 2, 1), atol=1e-5
    )
