"""Int8 weight quantization: round-trip, serving-path fidelity, size."""

import numpy as np
import pytest

from vits_tpu.io.quantize import (
    QuantizedParams,
    dequantize_params,
    load_quantized,
    quantization_error,
    quantize_params,
    save_quantized,
)


def test_quantize_roundtrip_error_bounded(tiny_bundle):
    _, params = tiny_bundle
    q = quantize_params(params)
    # every quantized tensor has a scale and int8 dtype
    quantized_names = [k for k, v in q.items() if v.dtype == np.int8]
    assert quantized_names, "nothing was quantized"
    for name in quantized_names:
        assert name + ".scale" in q
    errs = quantization_error(params)
    for name, err in errs.items():
        absmax = np.abs(np.asarray(params[name])).max()
        assert err <= absmax / 127.0 + 1e-7, name


def test_quantized_file_smaller(tmp_path, tiny_bundle):
    _, params = tiny_bundle
    q = quantize_params(params)
    fp_path = tmp_path / "fp32.npz"
    q_path = tmp_path / "int8.npz"
    np.savez(str(fp_path), **{k: np.asarray(v) for k, v in params.items()})
    save_quantized(str(q_path), q)
    assert q_path.stat().st_size < fp_path.stat().st_size * 0.45
    back = load_quantized(str(q_path))
    d = dequantize_params(back)
    assert set(d) == set(params)


def test_quantized_serving_waveform_close(tiny_bundle):
    """Synthesis through QuantizedParams must stay close to fp32 output."""
    import jax
    import jax.numpy as jnp

    from vits_tpu.models.vits import NoiseOverride, synthesize

    config, params = tiny_bundle
    ids = np.ones((1, 9), np.int32)
    mask = np.ones((1, 9), np.float32)
    rng = np.random.default_rng(0)
    noise = NoiseOverride(
        duration=rng.standard_normal((1, 9, 2)).astype(np.float32),
        prior=rng.standard_normal((1, 32, config.flow_size)).astype(np.float32),
    )

    out_fp = synthesize(params, config, ids, mask, 32, noise=noise)
    qp = QuantizedParams({k: jnp.asarray(v) for k, v in quantize_params(params).items()})
    out_q = synthesize(qp, config, ids, mask, 32, noise=noise)

    w_fp = np.asarray(out_fp.waveform)
    w_q = np.asarray(out_q.waveform)
    # int8 weights perturb the waveform but must stay perceptually close on
    # the stable (non-chaotic) paths; lengths must usually agree for this
    # tiny deterministic input
    assert w_q.shape == w_fp.shape
    assert np.isfinite(w_q).all()
    corr = np.corrcoef(w_fp.ravel(), w_q.ravel())[0, 1]
    assert corr > 0.95, corr


def test_int8_ggml_round_trip(tiny_bundle, tmp_path):
    """Quantized params survive export_to_ggml -> load_ggml bit-exactly.

    dtype code 2 (int8) is this repo's format extension (io/ggml.py):
    before it, int8 weights were silently cast to f32 raw integer LEVELS on
    export and the dtype-keyed dequant never fired on reload — a 127x-scaled
    model.  The engine must also still detect the reloaded dict as quantized."""
    from vits_tpu.config import EngineConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.loader import export_to_ggml, load_ggml
    from vits_tpu.io.quantize import quantize_params
    from vits_tpu.text.tokenizer import VitsTokenizer

    config, params = tiny_bundle
    qparams = quantize_params(params)
    assert any(np.asarray(v).dtype == np.int8 for v in qparams.values())
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    path = str(tmp_path / "int8.ggml")
    # fp16_convs=False: the few convs _should_quantize skips stay fp32 so the
    # round-trip is bit-exact (the default fp16 cast is reference-compat
    # behavior and only adds fp16 rounding on those leftovers)
    export_to_ggml(path, config, tok, qparams, fp16_convs=False)

    config2, tok2, reloaded = load_ggml(path)
    assert set(reloaded) == set(qparams)
    for name, value in qparams.items():
        got = reloaded[name]
        assert got.dtype == np.asarray(value).dtype, name
        np.testing.assert_array_equal(got, np.asarray(value), err_msg=name)

    # identical audio from the in-memory and round-tripped quantized dicts
    eng = EngineConfig(token_buckets=(16,), frames_per_token=2.0,
                       transfer_int16=False)
    w_mem = Synthesizer(config, tok, qparams, eng).synthesize("hello", seed=4)
    w_disk = Synthesizer(config2, tok2, reloaded, eng).synthesize("hello", seed=4)
    np.testing.assert_array_equal(w_mem, w_disk)
