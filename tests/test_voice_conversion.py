"""Voice conversion: posterior encode -> flow forward -> flow reverse -> vocoder.

A capability of the VITS architecture the reference engine never exposes: its
flow asserts reverse-only (/root/reference/src/vits.cpp:503 "Non reverse not
implemented"), the posterior encoder is never built, and every speaker
global-conditioning branch is ASSERT(false) (vits.cpp:461,472,603,936).  The
TPU framework implements all of those pieces for training, so conversion is
their composition — pinned here against an HF-module composition oracle plus
the exact-invertibility invariant of the coupling flow.
"""

import numpy as np
import pytest
import torch

from vits_tpu.config import EngineConfig
from vits_tpu.engine.synthesizer import Synthesizer
from vits_tpu.io.params import ParamView
from vits_tpu.models.flow import residual_coupling_block
from vits_tpu.models.vits import voice_convert
from vits_tpu.text.tokenizer import VitsTokenizer

from tests.test_modules_parity import _det_randn_patcher
from tests.test_multispeaker import spk_bundle, spk_hf_model  # noqa: F401 — fixtures


def test_flow_roundtrip_is_identity(spk_bundle):  # noqa: F811
    """forward(reverse(x)) == x: the coupling stack is exactly invertible,
    so same-speaker voice conversion preserves the latent frame."""
    config, params = spk_bundle
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 13, config.flow_size)).astype(np.float32)
    mask = np.ones((2, 13, 1), np.float32)
    mask[1, 9:] = 0.0
    x = x * mask
    emb = rng.standard_normal((2, 1, config.speaker_embedding_size)).astype(np.float32)

    p = ParamView(params)
    fwd, _ = residual_coupling_block(p, config, x, mask, emb, reverse=False)
    back, _ = residual_coupling_block(p, config, fwd, mask, emb, reverse=True)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-5)


def test_voice_convert_matches_hf_composition(spk_hf_model, spk_bundle, monkeypatch):  # noqa: F811
    """Our one-program conversion == the same chain composed from HF modules."""
    config, params = spk_bundle
    rng = np.random.default_rng(5)
    B, F = 1, 12
    spec = rng.standard_normal((B, F, config.spectrogram_bins)).astype(np.float32)
    mask = np.ones((B, F), np.float32)
    src = np.array([1], np.int32)
    tgt = np.array([3], np.int32)

    recorded = _det_randn_patcher(monkeypatch)
    with torch.no_grad():
        g_src = spk_hf_model.embed_speaker(torch.tensor(src, dtype=torch.long))
        g_src = g_src.unsqueeze(-1)  # (B, emb, 1)
        g_tgt = spk_hf_model.embed_speaker(torch.tensor(tgt, dtype=torch.long))
        g_tgt = g_tgt.unsqueeze(-1)
        mask_t = torch.tensor(mask)[:, None, :]
        z, _, _ = spk_hf_model.posterior_encoder(
            torch.tensor(spec).transpose(1, 2), mask_t, g_src
        )
        z_p = spk_hf_model.flow(z, mask_t, g_src)  # training direction
        z_hat = spk_hf_model.flow(z_p, mask_t, g_tgt, reverse=True)
        hf_wave = spk_hf_model.decoder(z_hat, g_tgt)

    noise = recorded[0].numpy().transpose(0, 2, 1)  # (B,flow,F) -> (B,F,flow)
    out = voice_convert(
        params, config, spec, mask,
        source_speaker_id=src, target_speaker_id=tgt, noise=noise,
    )
    np.testing.assert_allclose(
        np.asarray(out.waveform), hf_wave.numpy()[:, 0, :], atol=5e-5
    )


def test_voice_convert_same_speaker_reconstructs_latents(spk_bundle):  # noqa: F811
    """With src == tgt and zero noise the flow roundtrip cancels exactly:
    the vocoder latents equal the posterior mean."""
    config, params = spk_bundle
    rng = np.random.default_rng(7)
    spec = rng.standard_normal((1, 10, config.spectrogram_bins)).astype(np.float32)
    mask = np.ones((1, 10), np.float32)
    spk = np.array([2], np.int32)

    out = voice_convert(
        params, config, spec, mask,
        source_speaker_id=spk, target_speaker_id=spk, noise_scale=0.0,
    )
    np.testing.assert_allclose(
        np.asarray(out.latents), np.asarray(out.posterior_mean), atol=1e-5
    )


@pytest.fixture(scope="module")
def spk_engine(spk_bundle):  # noqa: F811
    config, params = spk_bundle
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(32, 64), frames_per_token=2.0)
    return Synthesizer(config, tok, params, eng)


def test_engine_convert_voice_roundtrip(spk_engine):
    hop = spk_engine.config.total_upsample
    audio = np.sin(np.linspace(0, 80 * np.pi, 40 * hop)).astype(np.float32) * 0.3

    converted = spk_engine.convert_voice(
        audio, source_speaker=0, target_speaker=3
    )
    assert converted.ndim == 1 and converted.dtype == np.float32
    assert len(converted) == 40 * hop  # 1:1 frame alignment, trimmed
    assert np.isfinite(converted).all()

    again = spk_engine.convert_voice(audio, source_speaker=0, target_speaker=3)
    np.testing.assert_array_equal(converted, again)  # noise_scale=0 default

    other = spk_engine.convert_voice(audio, source_speaker=0, target_speaker=1)
    assert not np.array_equal(converted, other)  # target voice matters


def test_engine_convert_voice_batch_and_sampling(spk_engine):
    hop = spk_engine.config.total_upsample
    rng = np.random.default_rng(11)
    auds = [
        rng.standard_normal(17 * hop).astype(np.float32) * 0.1,
        rng.standard_normal(9 * hop).astype(np.float32) * 0.1,
    ]
    outs = spk_engine.convert_voice(
        auds, source_speaker=[0, 1], target_speaker=[2, 3]
    )
    assert isinstance(outs, list) and len(outs) == 2
    assert len(outs[0]) == 17 * hop and len(outs[1]) == 9 * hop

    # sampled conversions: seed changes audio when noise_scale > 0
    a = spk_engine.convert_voice(auds[0], target_speaker=2, seed=1, noise_scale=1.0)
    b = spk_engine.convert_voice(auds[0], target_speaker=2, seed=2, noise_scale=1.0)
    assert not np.array_equal(a, b)


def test_cli_convert(tmp_path, tiny_bundle):
    from vits_tpu.cli import main
    from vits_tpu.io.loader import export_to_ggml
    from vits_tpu.utils.wav import read_wav, write_wav

    config, params = tiny_bundle
    tok = VitsTokenizer(
        vocab={c: i for i, c in enumerate("kzyuvdheswm' ablc.")},
        pad_token="k", unk_token="z",
    )
    ckpt = str(tmp_path / "m.ggml")
    export_to_ggml(ckpt, config, tok, params, fp16_convs=False)

    hop = config.total_upsample
    src = str(tmp_path / "in.wav")
    write_wav(src, np.sin(np.linspace(0, 40 * np.pi, 10 * hop)).astype(np.float32) * 0.3,
              config.sampling_rate)
    out = str(tmp_path / "converted.wav")
    assert main(["--model", ckpt, "--convert", src, "--out", out]) == 0
    audio, rate = read_wav(out)
    assert len(audio) == 10 * hop and rate == config.sampling_rate


def test_engine_convert_voice_single_speaker_model(tiny_bundle):
    """Single-speaker checkpoints convert too (resynthesis through the flow)."""
    config, params = tiny_bundle
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    engine = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))
    hop = config.total_upsample
    audio = np.sin(np.linspace(0, 40 * np.pi, 12 * hop)).astype(np.float32) * 0.3
    out = engine.convert_voice(audio)
    assert out.shape == (12 * hop,) and np.isfinite(out).all()
