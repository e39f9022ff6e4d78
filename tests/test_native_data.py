"""Native corpus loader (vt_utt_*) vs the numpy data pipeline.

Skipped when the library isn't built (cmake -S native -B native/build &&
cmake --build native/build).
"""

import numpy as np
import pytest

from vits_tpu.io import native
from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.train.data import VitsDataset, linear_spectrogram
from vits_tpu.utils.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.loader_available(), reason="native corpus loader not built"
)

VOCAB = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, tiny_bundle):
    config, _ = tiny_bundle
    root = tmp_path_factory.mktemp("native_corpus")
    (root / "wavs").mkdir()
    rng = np.random.default_rng(7)
    lines = []
    texts = ["hello sad dame", "my sweet valley", "be well and hum", "ask less"]
    for i, text in enumerate(texts):
        n = config.total_upsample * (20 + 8 * i) + i * 3  # ragged tails
        audio = np.clip(rng.standard_normal(n) * 0.2, -1, 1).astype(np.float32)
        write_wav(str(root / "wavs" / f"utt{i}.wav"), audio, config.sampling_rate)
        lines.append(f"utt{i}|RAW|{text}")
    (root / "metadata.csv").write_text("\n".join(lines))
    return str(root)


def _datasets(corpus, tiny_bundle, **kwargs):
    config, _ = tiny_bundle
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    nat = VitsDataset(corpus, tok, config, max_frames=64, use_native=True, **kwargs)
    ref = VitsDataset(corpus, tok, config, max_frames=64, use_native=False, **kwargs)
    assert nat.use_native and not ref.use_native
    return nat, ref


def test_load_parity(corpus, tiny_bundle):
    nat, ref = _datasets(corpus, tiny_bundle)
    for utt in nat.utterances:
        a = nat.load(utt)
        b = ref.load(utt)
        assert (a is None) == (b is None)
        if a is None:
            continue
        np.testing.assert_array_equal(a[0], b[0])        # token ids
        np.testing.assert_array_equal(a[2], b[2])        # audio bit-identical
        assert a[1].shape == b[1].shape
        np.testing.assert_allclose(a[1], b[1], atol=1e-5)  # |STFT| (double FFT both sides)


def test_batches_parity_and_workers(corpus, tiny_bundle):
    nat, ref = _datasets(corpus, tiny_bundle, num_workers=4)
    ref.num_workers = 0
    b0 = list(nat.batches(batch_size=2, rng=np.random.default_rng(3), epochs=1))
    b1 = list(ref.batches(batch_size=2, rng=np.random.default_rng(3), epochs=1))
    assert len(b0) == len(b1)
    for x, y in zip(b0, b1):
        np.testing.assert_array_equal(x.input_ids, y.input_ids)
        np.testing.assert_array_equal(x.audio, y.audio)
        np.testing.assert_array_equal(x.frame_mask, y.frame_mask)
        np.testing.assert_allclose(x.spectrogram, y.spectrogram, atol=1e-5)


def test_spectrogram_parity_sweep(tmp_path):
    """Direct load_utterance vs linear_spectrogram across framings."""
    rng = np.random.default_rng(0)
    for n_fft, hop, n in [(1024, 256, 16000), (512, 512, 8192), (256, 64, 5000)]:
        audio = np.clip(rng.standard_normal(n) * 0.3, -1, 1).astype(np.float32)
        p = str(tmp_path / f"s{n_fft}_{hop}.wav")
        write_wav(p, audio, 16000)
        got_audio, got_spec, rate = native.load_utterance(p, n_fft, hop, 10_000)
        assert rate == 16000
        want_audio, _ = read_wav(p)
        frames = len(want_audio) // hop
        want_audio = want_audio[: frames * hop]
        want = linear_spectrogram(want_audio, n_fft, hop)[:frames]
        np.testing.assert_array_equal(got_audio, want_audio)
        assert got_spec.shape == want.shape == (frames, n_fft // 2 + 1)
        np.testing.assert_allclose(got_spec, want, atol=1e-5)


def test_max_frames_cap(tmp_path):
    audio = np.zeros(256 * 50, np.float32)
    p = str(tmp_path / "cap.wav")
    write_wav(p, audio, 16000)
    got_audio, got_spec, _ = native.load_utterance(p, 1024, 256, 10)
    assert got_spec.shape[0] == 10 and len(got_audio) == 10 * 256


def test_short_audio_zero_frames(tmp_path):
    p = str(tmp_path / "short.wav")
    write_wav(p, np.zeros(100, np.float32), 16000)
    audio, spec, rate = native.load_utterance(p, 1024, 256, 400)
    assert len(audio) == 0 and spec.shape == (0, 513) and rate == 16000


def test_error_paths(tmp_path):
    with pytest.raises(ValueError, match="cannot open"):
        native.load_utterance(str(tmp_path / "missing.wav"), 1024, 256, 400)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not a riff file")
    with pytest.raises(ValueError, match="RIFF"):
        native.load_utterance(str(bad), 1024, 256, 400)
    ok = tmp_path / "ok.wav"
    write_wav(str(ok), np.zeros(4096, np.float32), 16000)
    with pytest.raises(ValueError, match="power of two"):
        native.load_utterance(str(ok), 1000, 256, 400)  # non-pow2 n_fft
    with pytest.raises(ValueError, match="power of two"):
        native.load_utterance(str(ok), 256, 512, 400)  # hop > n_fft


def test_rate_mismatch_raises(tmp_path, tiny_bundle):
    config, _ = tiny_bundle
    root = tmp_path / "badrate"
    (root / "wavs").mkdir(parents=True)
    write_wav(str(root / "wavs" / "u0.wav"),
              np.zeros(config.total_upsample * 32, np.float32),
              config.sampling_rate + 1)
    (root / "metadata.csv").write_text("u0|x|hello")
    tok = VitsTokenizer(vocab=dict(VOCAB), pad_token="k", unk_token="z")
    ds = VitsDataset(str(root), tok, config, use_native=True)
    with pytest.raises(ValueError, match="rate"):
        ds.load(ds.utterances[0])
