"""Smoke-test scripts/validate_real.py offline.

The script's purpose is real-checkpoint validation in a networked env; here we
substitute the tiny random HF model for the download so the entire flow
(recorded-noise HF forward -> NoiseOverride JAX forward -> .ggml round-trip ->
deterministic golden) is proven runnable before it ever meets real weights.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest
import torch


def _load_script():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "validate_real.py")
    spec = importlib.util.spec_from_file_location("validate_real", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _FakeHFTokenizer:
    """Minimal stand-in for transformers.VitsTokenizer on the tiny model."""

    def __init__(self, vocab_size):
        chars = "abcdefghijklmnopqrstuvwxyz '"
        self.vocab = {c: i + 1 for i, c in enumerate(chars[: vocab_size - 1])}
        self.vocab["<pad>"] = 0

    # attributes VitsTokenizer.from_hf duck-types on
    def get_vocab(self):
        return dict(self.vocab)

    @property
    def add_blank(self):
        return True

    normalize = True
    pad_token = "<pad>"
    unk_token = "<unk>"

    def __call__(self, text, return_tensors="pt"):
        ids = [0]
        for c in text.lower():
            ids.append(self.vocab.get(c, 1))
            ids.append(0)
        arr = torch.tensor([ids], dtype=torch.long)
        return {"input_ids": arr, "attention_mask": torch.ones_like(arr)}


def test_validate_real_flow_offline(tiny_hf_model, tmp_path, monkeypatch):
    mod = _load_script()

    import transformers

    monkeypatch.setattr(
        transformers.VitsModel, "from_pretrained",
        classmethod(lambda cls, name: tiny_hf_model),
    )
    fake_tok = _FakeHFTokenizer(tiny_hf_model.config.vocab_size)
    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained",
        classmethod(lambda cls, name: fake_tok),
    )

    rc = mod.main([
        "--model", "fake/tiny", "--text", "hello world",
        "--out", str(tmp_path),
        # random weights aren't the real checkpoint; loosen only the mel gate
        "--atol-wave", "1e-2", "--atol-mel", "1.0",
    ])
    assert rc == 0
    with open(tmp_path / "report.json") as fh:
        report = json.load(fh)
    assert report["passed"]
    # recorded-noise parity should be tight even on random weights
    assert report["checks"]["waveform_l1"] < 1e-3
    assert report["checks"]["length_match"]
    assert report["checks"]["demo_phrase_frames_zero_noise"] > 0
    assert (tmp_path / "real.ggml").exists()
    assert (tmp_path / "real_ours.wav").exists()
