"""End-to-end synthesis parity vs HF VitsModel.forward with recorded noise.

The TPU pipeline runs at a *static* frame capacity with masked padding; HF runs
at the exact predicted length.  With identical noise the valid region must be
bit-close (the reference's e2e golden strategy, scripts/test_vits.py, at the
waveform level)."""

import numpy as np
import pytest
import torch

from vits_tpu.models.vits import NoiseOverride, align_durations, synthesize

from tests.test_modules_parity import _det_randn_patcher


def _hf_forward(model, ids, mask):
    with torch.no_grad():
        return model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            return_dict=True,
        )


def _noise_from_recorded(recorded, num_frames, flow_size):
    dur = recorded[0].numpy().transpose(0, 2, 1)  # (B,2,T)->(B,T,2)
    prior_hf = recorded[1].numpy().transpose(0, 2, 1)  # (B,flow,F_hf)->(B,F_hf,flow)
    B, F_hf, _ = prior_hf.shape
    prior = np.zeros((B, num_frames, flow_size), np.float32)
    prior[:, :F_hf] = prior_hf[:, :num_frames]
    return NoiseOverride(duration=dur, prior=prior)


def test_e2e_single_matches_hf(tiny_hf_model, tiny_bundle, monkeypatch):
    config, params = tiny_bundle
    rng_np = np.random.default_rng(11)
    ids = rng_np.integers(0, config.vocab_size, size=(1, 15)).astype(np.int32)
    mask = np.ones((1, 15), dtype=np.float32)

    recorded = _det_randn_patcher(monkeypatch)
    hf_out = _hf_forward(tiny_hf_model, ids, mask)
    hf_wave = hf_out.waveform.numpy()
    hf_len = int(hf_out.sequence_lengths[0])

    num_frames = 64
    noise = _noise_from_recorded(recorded, num_frames, config.flow_size)
    out = synthesize(params, config, ids, mask, num_frames, noise=noise)

    assert int(out.lengths[0]) == hf_len
    np.testing.assert_allclose(
        np.asarray(out.waveform)[0, :hf_len], hf_wave[0, :hf_len], atol=2e-4
    )
    # spectrogram (latents) parity too — reference golden vits.cpp:1175
    hf_spec = hf_out.spectrogram.numpy().transpose(0, 2, 1)  # (B,F,flow)
    F_hf = hf_spec.shape[1]
    np.testing.assert_allclose(
        np.asarray(out.latents)[0, :F_hf], hf_spec[0], atol=5e-4
    )


def test_e2e_batch_padded_matches_hf_solo_rows(tiny_hf_model, tiny_bundle, monkeypatch):
    """Batched synthesis (reference can't: bsz==1 asserted) vs per-row HF runs.

    Note the oracle here is HF run *solo* on each row: HF's own batched forward
    does not mask inside the decoder, so its padded rows pick up boundary
    contamination from the padding region — our mask-propagating pipeline
    instead reproduces the clean per-utterance result for every row.
    """
    config, params = tiny_bundle
    rng_np = np.random.default_rng(12)
    lens = [13, 7]
    t_pad = 13
    ids = np.zeros((2, t_pad), np.int32)
    mask = np.zeros((2, t_pad), np.float32)
    rows = []
    for b, n in enumerate(lens):
        row = rng_np.integers(1, config.vocab_size, size=(1, n)).astype(np.int32)
        ids[b, :n] = row
        mask[b, :n] = 1.0
        rows.append(row)

    recorded = _det_randn_patcher(monkeypatch)
    hf_solo = []
    for row in rows:
        hf_solo.append(_hf_forward(tiny_hf_model, row, np.ones_like(row, np.float32)))

    num_frames = max(o.spectrogram.shape[2] for o in hf_solo) + 8
    # Assemble per-row noise from the per-run captures (2 draws per run).
    dur = np.zeros((2, t_pad, 2), np.float32)
    prior = np.zeros((2, num_frames, config.flow_size), np.float32)
    for b, n in enumerate(lens):
        dur_b = recorded[2 * b].numpy().transpose(0, 2, 1)
        prior_b = recorded[2 * b + 1].numpy().transpose(0, 2, 1)
        dur[b, :n] = dur_b[0]
        prior[b, : prior_b.shape[1]] = prior_b[0]
    noise = NoiseOverride(duration=dur, prior=prior)

    out = synthesize(params, config, ids, mask, num_frames, noise=noise)

    for b in range(2):
        hf_len = int(hf_solo[b].sequence_lengths[0])
        assert int(out.lengths[b]) == hf_len
        np.testing.assert_allclose(
            np.asarray(out.waveform)[b, :hf_len],
            hf_solo[b].waveform.numpy()[0, :hf_len],
            atol=2e-4,
        )


def test_align_durations_basic():
    duration = np.array([[2.0, 0.0, 3.0]], dtype=np.float32)
    mask = np.ones((1, 3), dtype=np.float32)
    attn, frame_mask = align_durations(duration, mask, num_frames=8)
    attn = np.asarray(attn)
    # frames 0-1 -> token 0; frames 2-4 -> token 2; rest invalid
    expected = np.zeros((1, 8, 3), np.float32)
    expected[0, 0, 0] = expected[0, 1, 0] = 1.0
    expected[0, 2, 2] = expected[0, 3, 2] = expected[0, 4, 2] = 1.0
    np.testing.assert_array_equal(attn, expected)
    np.testing.assert_array_equal(np.asarray(frame_mask)[0], [1, 1, 1, 1, 1, 0, 0, 0])


def test_align_durations_overflow_clamps():
    duration = np.array([[5.0, 5.0]], dtype=np.float32)
    mask = np.ones((1, 2), dtype=np.float32)
    attn, frame_mask = align_durations(duration, mask, num_frames=6)
    assert np.asarray(frame_mask).sum() == 6  # capacity-clamped
    # every valid frame still maps to exactly one token
    np.testing.assert_array_equal(np.asarray(attn).sum(-1)[0], np.ones(6))


def test_synthesize_with_rng_key_runs(tiny_bundle):
    """The production path (jax.random key, no override) is jittable."""
    import jax

    config, params = tiny_bundle
    ids = np.ones((1, 9), np.int32)
    mask = np.ones((1, 9), np.float32)
    fn = jax.jit(
        lambda p, i, m, k: synthesize(p, config, i, m, 32, rng=k),
    )
    out = fn(params, ids, mask, jax.random.PRNGKey(0))
    wave = np.asarray(out.waveform)
    assert wave.shape == (1, 32 * config.total_upsample)
    assert np.isfinite(wave).all()
    assert 0 < int(out.lengths[0]) <= wave.shape[1]
