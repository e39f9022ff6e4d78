"""Multi-speaker (VCTK-style) conditioning parity vs HF.

The reference leaves every global-conditioning path unimplemented
(ASSERT(false) at vits.cpp:461,472,603,936); these tests pin our implementations
of speaker embedding -> SDP cond / WaveNet cond_layer / HiFiGAN cond."""

import numpy as np
import pytest
import torch

from vits_tpu.io.loader import load_hf_module
from vits_tpu.io.params import ParamView
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.models.hifigan import hifigan
from vits_tpu.models.vits import synthesize

from tests.test_e2e_parity import _noise_from_recorded
from tests.test_modules_parity import _det_randn_patcher


@pytest.fixture(scope="module")
def spk_hf_model():
    from transformers import VitsConfig as HFVitsConfig
    from transformers import VitsModel

    torch.manual_seed(1)
    cfg = HFVitsConfig(
        vocab_size=38,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        ffn_dim=64,
        flow_size=16,
        spectrogram_bins=65,
        upsample_initial_channel=32,
        upsample_rates=[4, 4],
        upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        prior_encoder_num_flows=2,
        prior_encoder_num_wavenet_layers=2,
        posterior_encoder_num_wavenet_layers=2,
        duration_predictor_num_flows=2,
        duration_predictor_flow_bins=6,
        depth_separable_num_layers=2,
        duration_predictor_filter_channels=32,
        num_speakers=4,
        speaker_embedding_size=8,
    )
    model = VitsModel(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def spk_bundle(spk_hf_model):
    config, _, params = load_hf_module(spk_hf_model, keep_training=True)
    return config, params


def test_flow_with_speaker_cond_matches_hf(spk_hf_model, spk_bundle):
    config, params = spk_bundle
    rng = np.random.default_rng(0)
    B, T = 1, 9
    x = rng.standard_normal((B, T, config.flow_size)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    emb = rng.standard_normal((B, 1, config.speaker_embedding_size)).astype(np.float32)

    with torch.no_grad():
        hf_out = spk_hf_model.flow(
            torch.tensor(x).transpose(1, 2),
            torch.tensor(mask)[:, None, :],
            global_conditioning=torch.tensor(emb).transpose(1, 2),
            reverse=True,
        )
    got, _ = residual_coupling_block(
        ParamView(params), config, x, mask[..., None],
        global_conditioning=emb, reverse=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), hf_out.numpy().transpose(0, 2, 1), atol=1e-5
    )


def test_hifigan_with_speaker_cond_matches_hf(spk_hf_model, spk_bundle):
    config, params = spk_bundle
    rng = np.random.default_rng(1)
    spec = rng.standard_normal((1, 11, config.flow_size)).astype(np.float32)
    emb = rng.standard_normal((1, 1, config.speaker_embedding_size)).astype(np.float32)

    with torch.no_grad():
        hf_wave = spk_hf_model.decoder(
            torch.tensor(spec).transpose(1, 2),
            global_conditioning=torch.tensor(emb).transpose(1, 2),
        )
    got = hifigan(ParamView(params), config, spec, None, emb)
    np.testing.assert_allclose(np.asarray(got), hf_wave.numpy()[:, 0, :], atol=1e-5)


def test_e2e_multispeaker_matches_hf(spk_hf_model, spk_bundle, monkeypatch):
    config, params = spk_bundle
    rng_np = np.random.default_rng(2)
    ids = rng_np.integers(0, config.vocab_size, size=(1, 11)).astype(np.int32)
    mask = np.ones((1, 11), np.float32)

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        hf_out = spk_hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            speaker_id=2,
            return_dict=True,
        )
    num_frames = hf_out.spectrogram.shape[2] + 8
    noise = _noise_from_recorded(recorded, num_frames, config.flow_size)
    out = synthesize(
        params, config, ids, mask, num_frames,
        noise=noise, speaker_id=np.array([2], np.int32),
    )
    hf_len = int(hf_out.sequence_lengths[0])
    assert int(out.lengths[0]) == hf_len
    np.testing.assert_allclose(
        np.asarray(out.waveform)[0, :hf_len],
        hf_out.waveform.numpy()[0, :hf_len],
        atol=2e-4,
    )


def test_speakers_differ(spk_bundle):
    """Different speaker ids must produce different audio (same noise)."""
    import jax

    config, params = spk_bundle
    ids = np.ones((1, 9), np.int32)
    mask = np.ones((1, 9), np.float32)
    outs = []
    for spk in (0, 3):
        out = synthesize(
            params, config, ids, mask, 32,
            rng=jax.random.PRNGKey(0), speaker_id=np.array([spk], np.int32),
        )
        outs.append(np.asarray(out.waveform))
    assert not np.allclose(outs[0], outs[1])
