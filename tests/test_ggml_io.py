"""Checkpoint format tests: .ggml round-trip, weight-norm merge, layout inverses.

The writer is validated against the reference's serialization layout
(/root/reference/scripts/export_vits.py:5-70) and the reader against the
reference's parser behavior (/root/reference/src/vits_model_data.cpp:29-97).
"""

import io

import numpy as np
import pytest

from vits_tpu.config import VitsConfig
from vits_tpu.io.ggml import read_ggml, write_ggml
from vits_tpu.io.loader import export_to_ggml, load_ggml, load_hf_module, merge_weight_norm
from vits_tpu.io.params import classify, from_torch_layout, to_torch_layout


def test_ggml_roundtrip_bytes(rng):
    tensors = {
        "a.weight": rng.standard_normal((3, 4, 5)).astype(np.float32),
        "b.bias": rng.standard_normal((7,)).astype(np.float32),
        "c.weight": rng.standard_normal((2, 6)).astype(np.float16),
    }
    buf = io.BytesIO()
    write_ggml(
        buf, vocab={"a": 1, "<pad>": 0}, add_blank=True, normalize=True,
        pad_token="<pad>", unk_token="<unk>",
        config_kv={"hidden_size": "192", "noise_scale": "0.667"},
        tensors=tensors,
    )
    ckpt = read_ggml(buf.getvalue())
    assert ckpt.vocab == {"a": 1, "<pad>": 0}
    assert ckpt.add_blank and ckpt.normalize
    assert ckpt.pad_token == "<pad>" and ckpt.unk_token == "<unk>"
    assert ckpt.config_kv["hidden_size"] == "192"
    for name, arr in tensors.items():
        np.testing.assert_array_equal(ckpt.tensors[name], arr)
        assert ckpt.tensors[name].dtype == arr.dtype


def test_config_from_kv_partial():
    cfg = VitsConfig.from_kv({
        "hidden_size": "64",
        "upsample_rates": "[8, 8, 2, 2]",
        "resblock_dilation_sizes": "[[1, 3, 5], [1, 3, 5], [1, 3, 5]]",
        "noise_scale": "0.5",
        "use_stochastic_duration_prediction": "True",
        "phonetic": "1",
        "some_unknown_key": "whatever",
    })
    assert cfg.hidden_size == 64
    assert cfg.upsample_rates == (8, 8, 2, 2)
    assert cfg.resblock_dilation_sizes == ((1, 3, 5),) * 3
    assert cfg.noise_scale == 0.5
    assert cfg.phonetic is True
    assert cfg.flow_size == 192  # default preserved


def test_layout_roundtrip(rng):
    cases = {
        "text_encoder.encoder.layers.0.attention.q_proj.weight": (8, 8),
        "decoder.upsampler.0.weight": (16, 8, 4),
        "decoder.resblocks.0.convs1.0.weight": (8, 8, 3),
        "flow.flows.0.conv_pre.weight": (32, 16, 1),
        "text_encoder.embed_tokens.weight": (38, 16),
        "duration_predictor.flows.0.translate": (2, 1),
        "decoder.conv_post.bias": (1,),
    }
    for name, shape in cases.items():
        torch_arr = rng.standard_normal(shape).astype(np.float32)
        canon = from_torch_layout(name, torch_arr)
        back = to_torch_layout(name, canon)
        np.testing.assert_array_equal(back, torch_arr)


def test_classify():
    assert classify("decoder.upsampler.1.weight", 3) == "conv_transpose"
    assert classify("decoder.resblocks.0.convs1.0.weight", 3) == "conv"
    assert classify("text_encoder.encoder.layers.0.attention.k_proj.weight", 2) == "linear"
    assert classify("text_encoder.embed_tokens.weight", 2) == "plain"
    assert classify("duration_predictor.flows.0.log_scale", 2) == "plain"


def test_merge_weight_norm_matches_torch(rng):
    import torch
    from torch.nn.utils.parametrizations import weight_norm

    conv = torch.nn.Conv1d(4, 8, 3)
    conv_wn = weight_norm(conv, name="weight")
    state = {k: v.detach().numpy() for k, v in conv_wn.state_dict().items()}
    state = {f"wavenet.in_layers.0.{k}": v for k, v in state.items()}
    merged = merge_weight_norm(state)
    expected = conv_wn.weight.detach().numpy()
    np.testing.assert_allclose(
        merged["wavenet.in_layers.0.weight"], expected, atol=1e-6
    )


def test_hf_export_ggml_load_roundtrip(tiny_hf_model, tmp_path):
    """HF module -> our params -> .ggml file -> load: identical params/config."""
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, _, params = load_hf_module(tiny_hf_model)
    tok = VitsTokenizer(vocab={"a": 1, "<pad>": 0}, pad_token="<pad>", unk_token="<unk>")
    path = str(tmp_path / "tiny.ggml")
    export_to_ggml(path, config, tok, params, fp16_convs=False)
    config2, tok2, params2 = load_ggml(path)
    assert config2 == config
    assert tok2.vocab == tok.vocab
    assert set(params2) == set(params)
    for name in params:
        np.testing.assert_allclose(params2[name], params[name], atol=0)


def test_fp16_conv_export(tiny_hf_model, tmp_path):
    from vits_tpu.io.ggml import read_ggml
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, _, params = load_hf_module(tiny_hf_model)
    tok = VitsTokenizer(vocab={"<pad>": 0}, pad_token="<pad>", unk_token="<unk>")
    path = str(tmp_path / "tiny16.ggml")
    export_to_ggml(path, config, tok, params, fp16_convs=True)
    ckpt = read_ggml(path)
    # conv weights fp16, linear/norm fp32 (export_vits.py:87 behavior)
    assert ckpt.tensors["decoder.conv_pre.weight"].dtype == np.float16
    assert ckpt.tensors["text_encoder.encoder.layers.0.attention.q_proj.weight"].dtype == np.float32
