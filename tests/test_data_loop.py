"""Data pipeline + training-loop driver tests on a synthetic mini-corpus."""

import os

import numpy as np
import pytest

from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.train.data import Prefetcher, VitsDataset, linear_spectrogram
from vits_tpu.utils.wav import write_wav

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, tiny_bundle):
    config, _ = tiny_bundle
    root = tmp_path_factory.mktemp("corpus")
    (root / "wavs").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    texts = ["hello sad dame", "my sweet valley", "be well and hum", "ask less"]
    for i, text in enumerate(texts):
        n = config.total_upsample * (20 + 8 * i)
        audio = np.clip(rng.standard_normal(n) * 0.2, -1, 1).astype(np.float32)
        write_wav(str(root / "wavs" / f"utt{i}.wav"), audio, config.sampling_rate)
        lines.append(f"utt{i}|RAW|{text}")
    (root / "metadata.csv").write_text("\n".join(lines))
    return str(root)


@pytest.fixture(scope="module")
def dataset(corpus, tiny_bundle):
    config, _ = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    return VitsDataset(corpus, tok, config, max_frames=64)


def test_dataset_loads_all(dataset):
    assert len(dataset) == 4
    loaded = dataset.load(dataset.utterances[0])
    assert loaded is not None
    ids, spec, audio = loaded
    assert spec.shape[1] == dataset.config.spectrogram_bins
    assert len(audio) == spec.shape[0] * dataset.hop


def test_linear_spectrogram_shape():
    audio = np.random.default_rng(0).standard_normal(16 * 256).astype(np.float32)
    spec = linear_spectrogram(audio, n_fft=512, hop=256)
    assert spec.shape == (16, 257)  # exactly T/hop frames (VITS framing)


def test_batches_shapes_and_masks(dataset):
    rng = np.random.default_rng(1)
    batch = next(iter(dataset.batches(batch_size=3, rng=rng, epochs=1)))
    B, T = batch.input_ids.shape
    _, S, bins = batch.spectrogram.shape
    assert B <= 3 and bins == dataset.config.spectrogram_bins
    assert T % 32 == 0 and S % 32 == 0
    assert batch.audio.shape == (B, S * dataset.hop)
    # masks are prefixes
    for b in range(B):
        tm = batch.token_mask[b]
        assert (np.diff(tm) <= 0).all()
        fm = batch.frame_mask[b]
        assert (np.diff(fm) <= 0).all()
        # audio is zero beyond the frame mask
        n_valid = int(fm.sum()) * dataset.hop
        assert np.abs(batch.audio[b, n_valid:]).max() == 0.0


def test_prefetcher_drains():
    items = list(Prefetcher(iter(range(7)), depth=2))
    assert items == list(range(7))


def test_prefetcher_close_releases_thread_on_early_stop():
    """An early-stopping consumer (the train loop takes exactly `steps`
    batches of an infinite iterator) must not leak a producer thread blocked
    on the full queue — close() aborts the pending put."""
    import itertools

    pf = Prefetcher(iter(itertools.count()), depth=2)
    assert next(pf) == 0 and next(pf) == 1  # producer now blocked on put
    pf.close()
    assert not pf._thread.is_alive()
    pf.close()  # idempotent


def test_prefetcher_close_after_exhaustion():
    pf = Prefetcher(iter(range(3)), depth=2)
    assert list(pf) == [0, 1, 2]
    pf.close()
    assert not pf._thread.is_alive()


def test_train_loop_smoke(corpus, tmp_path, tiny_hf_model, monkeypatch):
    """Two real (non-GAN) steps end-to-end through the loop driver + resume."""
    from vits_tpu.io.loader import export_to_ggml, load_hf_module
    from vits_tpu.train import loop as train_loop

    config, _, params = load_hf_module(tiny_hf_model, keep_training=True)
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    ckpt = str(tmp_path / "model.ggml")
    export_to_ggml(ckpt, config, tok, params, fp16_convs=False)

    out_dir = str(tmp_path / "run")
    logs = []
    train_loop.train(
        corpus, ckpt, out_dir,
        steps=2, batch_size=2, checkpoint_every=2, log_every=1,
        adversarial=False, segment_frames=8, log=logs.append,
    )
    assert any("step 2" in l for l in logs)
    assert os.path.isdir(os.path.join(out_dir, "step_00000002"))
    # liveness: the loop beat the watchdog (train/watchdog.py)
    from vits_tpu.train.watchdog import read_heartbeats
    hb = read_heartbeats(out_dir)
    assert 0 in hb and hb[0]["step"] == 2

    # resume continues from step 2
    logs2 = []
    train_loop.train(
        corpus, ckpt, out_dir,
        steps=3, batch_size=2, checkpoint_every=10, log_every=1,
        adversarial=False, segment_frames=8, log=logs2.append,
    )
    assert any("resumed from step 2" in l for l in logs2)
    assert any("restored EMA weights" in l for l in logs2)
    assert any("step 3" in l for l in logs2)
