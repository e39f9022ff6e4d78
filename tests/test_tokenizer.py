"""Tokenizer parity vs HF VitsTokenizer (the reference's oracle,
/root/reference/scripts/test_tokenizer.py)."""

import json

import numpy as np
import pytest

from vits_tpu.text.tokenizer import VitsTokenizer

# facebook/mms-tts-eng vocabulary (tokenizer_config add_blank=True, normalize=True).
MMS_ENG_VOCAB = {
    " ": 19, "'": 1, "-": 14, "0": 23, "1": 15, "2": 28, "3": 11, "4": 27, "5": 35,
    "6": 36, "_": 30, "a": 26, "b": 24, "c": 12, "d": 5, "e": 7, "f": 20, "g": 37,
    "h": 6, "i": 18, "j": 16, "k": 0, "l": 21, "m": 17, "n": 29, "o": 22, "p": 13,
    "q": 34, "r": 25, "s": 8, "t": 33, "u": 4, "v": 32, "w": 9, "x": 31, "y": 3,
    "z": 2, "–": 10,
}


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    from transformers import VitsTokenizer as HFVitsTokenizer

    path = tmp_path_factory.mktemp("tok") / "vocab.json"
    path.write_text(json.dumps(MMS_ENG_VOCAB))
    return HFVitsTokenizer(str(path), phonemize=False, add_blank=True, normalize=True)


@pytest.fixture(scope="module")
def tok():
    return VitsTokenizer(vocab=dict(MMS_ENG_VOCAB), add_blank=True, normalize=True,
                         pad_token="k", unk_token="<unk>")


PHRASES = [
    "Hello world",
    "The quick brown fox jumps over the lazy dog!",
    "I'm 25 years old, and -- weirdly -- I like 6 a.m.",
    "UPPER case And MiXeD",
    "symbols @#$%^&*() vanish",
    "",
]


@pytest.mark.parametrize("text", PHRASES)
def test_ids_match_hf(tok, hf_tok, text):
    expected = hf_tok(text)["input_ids"]
    got = tok.encode(text)
    assert got == list(expected), (text, got, expected)


def test_blank_interspersal_structure(tok):
    ids = tok.encode("abc")
    # 2n+1 pattern with blank id 0 in even slots (vits_tokenizer.cpp:201-207)
    assert len(ids) == 7
    assert ids[::2] == [0, 0, 0, 0]
    assert ids[1::2] == [tok.vocab["a"], tok.vocab["b"], tok.vocab["c"]]


def test_batch_call_padding(tok):
    ids, mask = tok(["abc", "a"], pad_to=16)
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert mask[0].sum() == 7 and mask[1].sum() == 3
    assert ids[1, 3:].sum() == 0


def test_pad_to_too_small_raises(tok):
    with pytest.raises(ValueError):
        tok(["abcdefgh"], pad_to=4)
