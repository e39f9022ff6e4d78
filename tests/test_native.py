"""Native C++ runtime layer (libvitstpu) vs the pure-Python implementations.

Skipped when the library isn't built (cmake -S native -B native/build &&
cmake --build native/build)."""

import io

import numpy as np
import pytest

from vits_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def sample_ggml(tmp_path_factory, rng):
    from vits_tpu.io.ggml import write_ggml

    path = tmp_path_factory.mktemp("ck") / "sample.ggml"
    tensors = {
        "a.weight": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "b.weight": rng.standard_normal((2, 6)).astype(np.float16),
        "c.bias": rng.standard_normal((7,)).astype(np.float32),
    }
    write_ggml(
        str(path),
        vocab={"a": 1, "b": 2, "<pad>": 0, "ch": 3},
        add_blank=True, normalize=True, pad_token="<pad>", unk_token="<unk>",
        config_kv={"hidden_size": "192", "upsample_rates": "[8, 8, 2, 2]"},
        tensors=tensors,
    )
    return str(path), tensors


def test_native_parse_matches_python(sample_ggml):
    from vits_tpu.io.ggml import read_ggml

    path, tensors = sample_ggml
    ck = native.NativeCheckpoint(path)
    py = read_ggml(path)
    assert ck.vocab == py.vocab
    assert ck.config_kv == py.config_kv
    meta = ck.tokenizer_meta
    assert meta["add_blank"] == py.add_blank
    assert meta["pad_token"] == py.pad_token
    native_tensors = ck.tensors()
    for name, arr in tensors.items():
        np.testing.assert_array_equal(native_tensors[name], arr)
        assert native_tensors[name].dtype == arr.dtype


def test_native_parse_from_bytes(sample_ggml):
    path, tensors = sample_ggml
    with open(path, "rb") as f:
        blob = f.read()
    ck = native.NativeCheckpoint(blob)
    got = ck.tensors(copy=True)
    np.testing.assert_array_equal(got["a.weight"], tensors["a.weight"])


def test_native_parse_truncated_errors(sample_ggml):
    path, _ = sample_ggml
    with open(path, "rb") as f:
        blob = f.read()
    with pytest.raises(ValueError, match="truncated"):
        native.NativeCheckpoint(blob[: len(blob) // 2])


def test_native_tokenizer_matches_python():
    from vits_tpu.text.tokenizer import VitsTokenizer

    vocab = {"a": 1, "b": 2, "c": 3, " ": 4, "ch": 5, "k": 0}
    py = VitsTokenizer(vocab=dict(vocab), pad_token="k", unk_token="a", normalize=False)
    nat = native.NativeTokenizer(vocab, add_blank=True, blank_id=0)
    for text in ["abc chab", "ccchhh", "", "xyz", "a b c"]:
        assert nat.encode(text) == py.encode(text), text


def test_native_wav_matches_python(rng):
    from vits_tpu.utils.wav import write_wav

    audio = np.clip(rng.standard_normal(500) * 0.5, -1, 1).astype(np.float32)
    buf = io.BytesIO()
    write_wav(buf, audio, 16000)
    assert native.wav_encode(audio, 16000) == buf.getvalue()


def test_native_full_loader_matches_python(tiny_hf_model, tmp_path):
    from vits_tpu.io.loader import export_to_ggml, load_ggml, load_hf_module
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, _, params = load_hf_module(tiny_hf_model)
    tok = VitsTokenizer(vocab={"a": 1, "<pad>": 0}, pad_token="<pad>", unk_token="<unk>")
    path = str(tmp_path / "tiny.ggml")
    export_to_ggml(path, config, tok, params, fp16_convs=True)

    c_py, t_py, p_py = load_ggml(path)
    c_nat, t_nat, p_nat = native.load_ggml_native(path)
    assert c_nat == c_py
    assert t_nat.vocab == t_py.vocab
    assert set(p_nat) == set(p_py)
    for k in p_py:
        np.testing.assert_array_equal(p_nat[k], p_py[k])


def test_native_loader_int8_checkpoint(tiny_hf_model, tmp_path):
    """The mmap parser accepts dtype code 2 (int8 extension, io/ggml.py) and
    yields the same int8 weights + f32 scales as the Python reader."""
    from vits_tpu.io.loader import export_to_ggml, load_ggml, load_hf_module
    from vits_tpu.io.quantize import quantize_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, _, params = load_hf_module(tiny_hf_model)
    tok = VitsTokenizer(vocab={"a": 1, "<pad>": 0}, pad_token="<pad>", unk_token="<unk>")
    path = str(tmp_path / "tiny-int8.ggml")
    export_to_ggml(path, config, tok, quantize_params(params), fp16_convs=False)

    _, _, p_py = load_ggml(path)
    _, _, p_nat = native.load_ggml_native(path)
    assert any(np.asarray(v).dtype == np.int8 for v in p_py.values())
    assert set(p_nat) == set(p_py)
    for k in p_py:
        assert np.asarray(p_nat[k]).dtype == np.asarray(p_py[k]).dtype, k
        np.testing.assert_array_equal(p_nat[k], p_py[k])


@pytest.mark.skipif(
    not native.available() or not hasattr(native.load_library(), "vt_engine_connect"),
    reason="native library with vt_synthesize not built",
)
def test_vt_synthesize_matches_python_engine(tiny_bundle):
    """The embeddable C ABI synthesis client must return the same audio the
    Python engine produces (modulo the WAV int16 quantization)."""
    import threading

    from vits_tpu.config import EngineConfig
    from vits_tpu.engine.server import serve
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, params = tiny_bundle
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))
    server, worker = serve(model, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        with native.NativeEngineClient(port=port) as client:
            pcm, rate = client.synthesize("hello dame", seed=3)
        assert rate == config.sampling_rate
        # the server folds per-request seeds into per-row keys, so compare
        # against the per-row-seed engine path
        expected = model.synthesize(["hello dame"], seed=[3])[0]
        assert pcm.shape == expected.shape
        np.testing.assert_allclose(pcm, expected, atol=2.0 / 32767)

        # controls reach the engine through the C ABI too
        with native.NativeEngineClient(port=port) as client:
            fast, _ = client.synthesize("hello dame", seed=3, speaking_rate=2.0)
        assert len(fast) < len(pcm)
    finally:
        worker.stop()
        server.shutdown()


@pytest.mark.skipif(
    not native.available() or not hasattr(native.load_library(), "vt_engine_connect"),
    reason="native library with vt_synthesize not built",
)
def test_vt_engine_connect_refused():
    with pytest.raises(ConnectionError):
        native.NativeEngineClient(port=1)  # nothing listens there


@pytest.mark.skipif(
    not native.available() or not hasattr(native.load_library(), "vt_convert"),
    reason="native library with vt_convert not built",
)
def test_vt_convert_matches_python_engine(tiny_bundle):
    """vt_convert through the C ABI == Synthesizer.convert_voice (modulo the
    two WAV int16 quantizations on the round trip)."""
    import threading

    from vits_tpu.config import EngineConfig
    from vits_tpu.engine.server import serve
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, params = tiny_bundle
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    model = Synthesizer(config, tok, params, EngineConfig(token_buckets=(32,)))
    server, worker = serve(model, port=0, streaming=False)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        hop = config.total_upsample
        rate = config.sampling_rate
        audio = np.sin(np.linspace(0, 30 * np.pi, 13 * hop)).astype(np.float32) * 0.3

        with native.NativeEngineClient(port=port) as client:
            pcm, out_rate = client.convert(audio, rate)
        assert out_rate == rate and len(pcm) == 13 * hop

        # the request body is int16 WAV: quantize exactly like vt_wav_encode
        # does (truncation, matching utils.wav.pcm16)
        sent = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        expected = model.convert_voice(sent.astype(np.float32) / 32767.0)
        np.testing.assert_allclose(pcm, expected, atol=2.0 / 32767)

        # a wrong sample rate is rejected with a readable error
        with native.NativeEngineClient(port=port) as client:
            with pytest.raises(RuntimeError, match="Hz"):
                client.convert(audio, rate * 2)
    finally:
        worker.stop()
        server.shutdown()
