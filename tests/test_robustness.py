"""Robustness: malformed checkpoints, tokenizer fuzz vs HF, CLI flags."""

import json

import numpy as np
import pytest

from vits_tpu.io.ggml import read_ggml
from vits_tpu.text.tokenizer import VitsTokenizer

from tests.test_tokenizer import MMS_ENG_VOCAB


def test_garbage_bytes_clean_error():
    with pytest.raises((ValueError, EOFError)):
        read_ggml(b"\xff" * 64)
    with pytest.raises((ValueError, EOFError)):
        read_ggml(b"RIFF" + b"\x00" * 100)


def test_implausible_length_rejected():
    import struct

    blob = struct.pack("<I", 5) + struct.pack("<I", 1 << 30)  # absurd key length
    with pytest.raises(ValueError, match="implausible|truncated"):
        read_ggml(blob)


def test_tokenizer_fuzz_matches_hf(tmp_path):
    from transformers import VitsTokenizer as HFVitsTokenizer

    path = tmp_path / "vocab.json"
    path.write_text(json.dumps(MMS_ENG_VOCAB))
    hf = HFVitsTokenizer(str(path), phonemize=False, add_blank=True, normalize=True)
    mine = VitsTokenizer(vocab=dict(MMS_ENG_VOCAB), pad_token="k", unk_token="<unk>")

    rng = np.random.default_rng(0)
    alphabet = list("abcdefghijklmnopqrstuvwxyz ABCDEFX0123456789-'–!?.@#\t")
    for _ in range(50):
        n = int(rng.integers(0, 40))
        text = "".join(rng.choice(alphabet) for _ in range(n))
        expected = list(hf(text)["input_ids"])
        got = mine.encode(text)
        assert got == expected, repr(text)


def test_cli_stream_and_long_flags(tmp_path, tiny_bundle):
    from vits_tpu.cli import main
    from vits_tpu.io.loader import export_to_ggml

    config, params = tiny_bundle
    tok = VitsTokenizer(
        vocab={c: i for i, c in enumerate("kzyuvdheswm' ablc.")},
        pad_token="k", unk_token="z",
    )
    ckpt = str(tmp_path / "m.ggml")
    export_to_ggml(ckpt, config, tok,
                   {k: v for k, v in params.items()
                    if not k.startswith("posterior_encoder.")
                    and "duration_predictor.post_" not in k},
                   fp16_convs=False)

    out1 = str(tmp_path / "s.wav")
    assert main(["--model", ckpt, "--text", "hello sad dame well", "--out", out1,
                 "--stream"]) == 0
    out2 = str(tmp_path / "l.wav")
    assert main(["--model", ckpt, "--text", "hello dame. well hum.", "--out", out2,
                 "--long"]) == 0
    from vits_tpu.utils.wav import read_wav

    for path in (out1, out2):
        audio, rate = read_wav(path)
        assert len(audio) > 0 and rate == config.sampling_rate
