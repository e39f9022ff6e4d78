"""Phonemizer chunking logic (stubbed backend) + optional espeak integration.

The chunking mirrors the reference's convert_to_phonetic
(/root/reference/src/vits_tokenizer.cpp:123-158): split at punctuation,
phonemize each chunk, re-insert the mark plus a space, with the ellipsis
special case.  These tests pin that logic without espeak installed by
stubbing the per-chunk backend.
"""

import pytest

from vits_tpu.text.phonemizer import Phonemizer, PhonemizerUnavailable


def make_stub_phonemizer():
    """Phonemizer with the backend stubbed: chunk -> '<stripped chunk>'."""
    p = Phonemizer.__new__(Phonemizer)
    p.language = "en-us"
    p._lib = None
    p._binary = None
    p._phonemize_chunk = lambda chunk: f"<{chunk.strip()}>" if chunk.strip() else ""
    return p


def test_plain_text_single_chunk():
    p = make_stub_phonemizer()
    assert p.phonemize("hello world") == "<hello world>"


def test_punctuation_reinserted_with_space():
    p = make_stub_phonemizer()
    assert p.phonemize("hello, world.") == "<hello>, <world>."


def test_multiple_sentence_marks():
    p = make_stub_phonemizer()
    assert p.phonemize("one! two? three;") == "<one>! <two>? <three>;"


def test_ellipsis_preserved():
    p = make_stub_phonemizer()
    assert p.phonemize("wait... ok") == "<wait>... <ok>"


def test_trailing_ellipsis():
    p = make_stub_phonemizer()
    assert p.phonemize("wait...") == "<wait>..."


def test_empty_between_punctuation():
    p = make_stub_phonemizer()
    assert p.phonemize("a,,b") == "<a>, , <b>"


def test_empty_string():
    p = make_stub_phonemizer()
    assert p.phonemize("") == ""


def test_unavailable_raises():
    import shutil
    import ctypes.util

    if ctypes.util.find_library("espeak-ng") or ctypes.util.find_library("espeak") \
            or shutil.which("espeak-ng") or shutil.which("espeak"):
        pytest.skip("espeak present on this machine")
    with pytest.raises(PhonemizerUnavailable):
        Phonemizer()


def _espeak_available():
    import shutil

    return shutil.which("espeak-ng") or shutil.which("espeak")


@pytest.mark.skipif(not _espeak_available(), reason="espeak-ng not installed")
def test_real_espeak_integration():
    """When espeak-ng exists, the bridge must produce non-empty IPA and keep
    punctuation placement (reference behavior, vits_tokenizer.cpp:123-158)."""
    p = Phonemizer("en-us")
    out = p.phonemize("hello, world.")
    assert "," in out and out.endswith(".")
    ipa = out.replace(",", "").replace(".", "").strip()
    assert len(ipa) > 3
