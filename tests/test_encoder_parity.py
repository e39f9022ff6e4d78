"""Text-encoder parity vs HF VitsTextEncoder (reference oracle pattern:
/root/reference/scripts/verify_layers.py, atol 1e-3; we hold 1e-5)."""

import numpy as np
import pytest
import torch

from vits_tpu.io.params import ParamView
from vits_tpu.models.encoder import text_encoder


def _run_hf_encoder(model, ids, mask):
    with torch.no_grad():
        out = model.text_encoder(
            input_ids=torch.tensor(ids),
            padding_mask=torch.tensor(mask)[..., None],
            attention_mask=torch.tensor(mask),
            return_dict=True,
        )
    return (
        out.last_hidden_state.numpy(),
        out.prior_means.numpy(),
        out.prior_log_variances.numpy(),
    )


def test_encoder_matches_hf_single(tiny_hf_model, tiny_bundle):
    config, params = tiny_bundle
    rng = np.random.default_rng(1)
    ids = rng.integers(0, config.vocab_size, size=(1, 21)).astype(np.int32)
    mask = np.ones((1, 21), dtype=np.float32)

    hf_h, hf_m, hf_v = _run_hf_encoder(tiny_hf_model, ids, mask)
    out = text_encoder(ParamView(params), config, ids, mask[..., None], mask)

    np.testing.assert_allclose(np.asarray(out.last_hidden_state), hf_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.prior_means), hf_m, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.prior_log_variances), hf_v, atol=1e-5)


def test_encoder_matches_hf_batched_padded(tiny_hf_model, tiny_bundle):
    """Padded batch rows must equal HF run on the same padded batch."""
    config, params = tiny_bundle
    rng = np.random.default_rng(2)
    ids = rng.integers(1, config.vocab_size, size=(2, 17)).astype(np.int32)
    mask = np.ones((2, 17), dtype=np.float32)
    ids[1, 9:] = 0
    mask[1, 9:] = 0.0

    hf_h, hf_m, hf_v = _run_hf_encoder(tiny_hf_model, ids, mask)
    out = text_encoder(ParamView(params), config, ids, mask[..., None], mask)
    np.testing.assert_allclose(np.asarray(out.last_hidden_state), hf_h, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.prior_means), hf_m, atol=1e-5)


def test_encoder_padding_invariance(tiny_hf_model, tiny_bundle):
    """A padded row must produce the same valid-region output as its solo run."""
    config, params = tiny_bundle
    rng = np.random.default_rng(3)
    ids_short = rng.integers(1, config.vocab_size, size=(1, 9)).astype(np.int32)

    out_solo = text_encoder(
        ParamView(params), config, ids_short,
        np.ones((1, 9, 1), np.float32), np.ones((1, 9), np.float32),
    )
    ids_pad = np.zeros((1, 17), np.int32)
    ids_pad[:, :9] = ids_short
    mask = np.zeros((1, 17), np.float32)
    mask[:, :9] = 1.0
    out_pad = text_encoder(ParamView(params), config, ids_pad, mask[..., None], mask)
    np.testing.assert_allclose(
        np.asarray(out_pad.last_hidden_state)[:, :9],
        np.asarray(out_solo.last_hidden_state),
        atol=1e-5,
    )
