"""Tokenizer fuzz parity vs HF + phonemizer-chunker property tests.

Round-4 verdict item 7: the tokenizer was parity-tested on curated goldens
only, yet it is the one user-input-facing component where silent divergence
produces WRONG SPEECH rather than an error.  This fuzzes the non-phonetic
path against the HF ``VitsTokenizer`` oracle (the same oracle the reference
was validated against, /root/reference/scripts/test_tokenizer.py) over random
unicode/casing/unknown-char traffic, covers the ``normalize`` flag the
reference also honors (/root/reference/src/vits_tokenizer.cpp:195-197 via
config), and property-tests the espeak punctuation chunker
(/root/reference/src/vits_tokenizer.cpp:123-158) without needing espeak.
"""

import json

import numpy as np
import pytest

from vits_tpu.text.tokenizer import VitsTokenizer

MMS_ENG_VOCAB = {
    " ": 19, "'": 1, "-": 14, "0": 23, "1": 15, "2": 28, "3": 11, "4": 27,
    "5": 35, "6": 36, "_": 30, "a": 26, "b": 24, "c": 12, "d": 5, "e": 7,
    "f": 20, "g": 37, "h": 6, "i": 18, "j": 16, "k": 0, "l": 21, "m": 17,
    "n": 29, "o": 22, "p": 13, "q": 34, "r": 25, "s": 8, "t": 33, "u": 4,
    "v": 32, "w": 9, "x": 31, "y": 3, "z": 2, "–": 10,
}

# Character pools chosen to hit the interesting paths: greedy vocab matching,
# lowercase fallback, multi-byte unicode, combining marks, control whitespace,
# and vocab/unknown boundaries.
_POOLS = [
    [chr(c) for c in range(0x20, 0x7F)],                 # printable ascii
    list("ABCDEFGhijklmnop  ''--–––09"),                 # casing + vocab heavy
    None,                                                # wide unicode (seeded below)
    list("áéíóüñçßœÆǾ̈\t\n\r"),      # accents/combining/ws
]


def _pools(rng):
    pools = list(_POOLS)
    pools[2] = [chr(int(c)) for c in rng.integers(0x20, 0x3000, 200)]
    return pools


def _rand_text(rng, pools):
    pool = pools[int(rng.integers(len(pools)))]
    n = int(rng.integers(0, 48))
    return "".join(pool[int(i)] for i in rng.integers(0, len(pool), n))


@pytest.fixture(scope="module")
def hf_factory(tmp_path_factory):
    from transformers import VitsTokenizer as HFVitsTokenizer

    path = tmp_path_factory.mktemp("tok") / "vocab.json"
    path.write_text(json.dumps(MMS_ENG_VOCAB))

    def make(normalize):
        return HFVitsTokenizer(str(path), phonemize=False, add_blank=True,
                               normalize=normalize)

    return make


def test_fuzz_parity_normalized(hf_factory):
    """normalize=True (every shipped MMS checkpoint): EXACT id parity with
    HF over 400 random strings — casing, unknown symbols, wide unicode."""
    hf = hf_factory(True)
    tok = VitsTokenizer(vocab=dict(MMS_ENG_VOCAB), add_blank=True,
                        normalize=True, pad_token="k", unk_token="<unk>")
    rng = np.random.default_rng(0)
    pools = _pools(rng)
    for _ in range(400):
        text = _rand_text(rng, pools)
        expected = list(hf(text)["input_ids"])
        got = tok.encode(text)
        assert got == expected, (text, got, expected)


def test_fuzz_parity_unnormalized_modulo_unknowns(hf_factory):
    """normalize=False: HF emits un-embeddable ``None`` ids for out-of-vocab
    characters (no unk fallback in the MMS vocab) — undefined model input.
    We follow the reference instead (drop unknowns,
    /root/reference/src/vits_tokenizer.cpp:71-74).  Where HF IS well-defined
    the ids must agree: our non-blank tokens equal HF's with the Nones
    dropped, and the blank-interspersal structure holds."""
    hf = hf_factory(False)
    tok = VitsTokenizer(vocab=dict(MMS_ENG_VOCAB), add_blank=True,
                        normalize=False, pad_token="k", unk_token="<unk>")
    rng = np.random.default_rng(1)
    pools = _pools(rng)
    for _ in range(400):
        text = _rand_text(rng, pools)
        expected = list(hf(text)["input_ids"])
        got = tok.encode(text)
        exp_tokens = [t for t in expected[1::2] if t is not None]
        if got:
            assert got[1::2] == exp_tokens, (text, got, expected)
            assert got[::2] == [0] * (len(exp_tokens) + 1)
        else:  # nothing tokenizable
            assert exp_tokens == [], (text, expected)


def test_fuzz_parity_no_blank(hf_factory):
    """add_blank=False variant (a real HF config axis): raw greedy ids."""
    hf = hf_factory(True)
    tok = VitsTokenizer(vocab=dict(MMS_ENG_VOCAB), add_blank=False,
                        normalize=True, pad_token="k", unk_token="<unk>")
    rng = np.random.default_rng(2)
    pools = _pools(rng)
    for _ in range(200):
        text = _rand_text(rng, pools)
        expected = list(hf(text)["input_ids"])
        got = tok.encode(text)
        # HF with add_blank interleaves blanks; stripping its even slots
        # yields the no-blank encoding
        assert got == expected[1::2], (text, got, expected)


# --------------------- phonemizer chunker properties ---------------------- #


def _chunker(monkeypatch):
    """A Phonemizer whose espeak call is replaced by a tagging stub —
    exercises ONLY the punctuation-aware chunking logic."""
    from vits_tpu.text import phonemizer as pm

    p = pm.Phonemizer.__new__(pm.Phonemizer)
    p.language = "en-us"
    p._lib = None
    p._binary = "/bin/false"  # never invoked: _phonemize_chunk is stubbed
    calls = []

    def stub(chunk):
        calls.append(chunk)
        return f"[{chunk}]" if chunk else ""

    monkeypatch.setattr(p, "_phonemize_chunk", stub)
    return p, calls


PUNCT = "!,.:;?"


def test_chunker_splits_on_punctuation(monkeypatch):
    p, calls = _chunker(monkeypatch)
    out = p.phonemize("hello, world. done")
    assert out == "[hello], [ world]. [ done]"
    assert calls == ["hello", " world", " done"]


def test_chunker_properties_random(monkeypatch):
    """Properties over random punctuation-laced text:
    (1) no chunk handed to espeak contains punctuation;
    (2) chunks concatenate (in order) to the original text minus punctuation;
    (3) every punctuation mark survives to the output, in order;
    (4) ellipsis runs stay intact ('...' is not split into three chunks)."""
    from vits_tpu.text import phonemizer as pm

    rng = np.random.default_rng(3)
    letters = list("abc def")
    for _ in range(200):
        n = int(rng.integers(0, 30))
        text = "".join(
            (PUNCT[int(rng.integers(len(PUNCT)))] if rng.random() < 0.3
             else letters[int(rng.integers(len(letters)))])
            for _ in range(n)
        )
        ph = pm.Phonemizer.__new__(pm.Phonemizer)
        ph.language = "en-us"
        ph._lib = None
        ph._binary = "/bin/false"  # never invoked: stubbed below
        chunks = []
        ph._phonemize_chunk = lambda c: (chunks.append(c), c)[1]
        out = ph.phonemize(text)
        # (1) espeak never sees punctuation
        assert all(not set(c) & set(PUNCT) for c in chunks), (text, chunks)
        # (2) chunk content preserves the non-punctuation text in order
        stripped = "".join(ch for ch in text if ch not in PUNCT)
        assert "".join(chunks) == stripped, (text, chunks)
        # (3) punctuation survives in order
        out_punct = "".join(ch for ch in out if ch in PUNCT)
        in_punct = "".join(ch for ch in text if ch in PUNCT)
        assert out_punct == in_punct, (text, out)


def test_chunker_ellipsis_intact(monkeypatch):
    p, calls = _chunker(monkeypatch)
    out = p.phonemize("wait... what")
    assert calls == ["wait", " what"]  # '...' did not produce empty chunks
    assert "..." in out
