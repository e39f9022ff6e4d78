"""Fused whole-stage kernel (upsample + resblock trio) vs the XLA module math.

Interpret-mode equivalence for the packed transpose-conv + resblock-chain
kernel (ops/pallas/stage.py), including per-row length masking — the same
contract the module path (models/hifigan.py) provides.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vits_tpu.ops.conv import conv1d, conv_transpose1d, leaky_relu
from vits_tpu.ops.pallas.stage import fused_stage

SLOPE = 0.1


def xla_stage(x, up_w, up_b, resblocks, stride, up_padding, mask=None):
    """The exact per-stage math from models/hifigan.py (module path)."""
    h = leaky_relu(jnp.asarray(x), SLOPE)
    h = conv_transpose1d(h, up_w, up_b, stride=stride, padding=up_padding)
    if mask is not None:
        h = h * mask
    out = None
    for rb in resblocks:
        xx = h
        for i, d in enumerate(rb["dilations"]):
            res = xx
            k = rb["kernel_size"]
            y = leaky_relu(xx, SLOPE)
            y = conv1d(y, rb["w1"][i], rb["b1"][i], padding=(k * d - d) // 2, dilation=d)
            if mask is not None:
                y = y * mask
            y = leaky_relu(y, SLOPE)
            y = conv1d(y, rb["w2"][i], rb["b2"][i], padding=(k - 1) // 2)
            if mask is not None:
                y = y * mask
            xx = y + res
        out = xx if out is None else out + xx
    return np.asarray(out / len(resblocks))


def _make_stage(rng, C_in, C_out, k_up, ks):
    up_w = (rng.standard_normal((k_up, C_in, C_out)) * 0.1).astype(np.float32)
    up_b = (rng.standard_normal((C_out,)) * 0.1).astype(np.float32)
    resblocks = []
    for k in ks:
        resblocks.append(dict(
            kernel_size=k, dilations=(1, 3, 5),
            w1=(rng.standard_normal((3, k, C_out, C_out)) * 0.1).astype(np.float32),
            b1=(rng.standard_normal((3, C_out)) * 0.1).astype(np.float32),
            w2=(rng.standard_normal((3, k, C_out, C_out)) * 0.1).astype(np.float32),
            b2=(rng.standard_normal((3, C_out)) * 0.1).astype(np.float32),
        ))
    return up_w, up_b, resblocks


@pytest.mark.parametrize("C_in,C_out,ks,T_in,tile_t", [
    (128, 64, (3, 7, 11), 96, 64),   # MMS stage 3 shape family (g_out=2)
    (64, 32, (3, 7, 11), 96, 64),    # MMS stage 4 (g_out=4, odd residuals)
    (64, 32, (3, 5), 70, 24),        # non-dividing T, small tiles
])
def test_fused_stage_matches_xla(C_in, C_out, ks, T_in, tile_t):
    rng = np.random.default_rng(0)
    stride, k_up = 2, 4
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, ks)
    x = rng.standard_normal((2, T_in, C_in)).astype(np.float32)
    pad = (k_up - stride) // 2

    expected = xla_stage(x, up_w, up_b, resblocks, stride, pad)
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        stride=stride, up_padding=pad, resblocks=resblocks, slope=SLOPE,
        tile_t=tile_t, interpret=True,
    ))
    assert got.shape == (2, T_in * stride, C_out)
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(got / scale, expected / scale, atol=5e-6)


def test_fused_stage_masks_per_row():
    rng = np.random.default_rng(1)
    C_in, C_out, stride, k_up = 64, 32, 2, 4
    T_in = 120
    lengths = np.array([120, 47], np.int32)
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, (3, 7))
    x = rng.standard_normal((2, T_in, C_in)).astype(np.float32)
    x = x * (np.arange(T_in)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    mask = jnp.asarray(
        (np.arange(T_in * stride)[None, :] < lengths[:, None] * stride)
        .astype(np.float32)[..., None]
    )
    pad = (k_up - stride) // 2

    expected = xla_stage(x, up_w, up_b, resblocks, stride, pad, mask=mask)
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        stride=stride, up_padding=pad, resblocks=resblocks, slope=SLOPE,
        tile_t=32, interpret=True, lengths=jnp.asarray(lengths),
    ))
    np.testing.assert_allclose(got, expected, atol=1e-5)
    # the padded tail really is zero
    assert np.abs(got[1, 47 * stride:]).max() == 0.0


def test_fused_stage_rejects_wide_stages():
    rng = np.random.default_rng(2)
    up_w, up_b, resblocks = _make_stage(rng, 512, 256, 16, (3,))
    x = rng.standard_normal((1, 16, 512)).astype(np.float32)
    with pytest.raises(AssertionError):
        fused_stage(
            jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
            stride=8, up_padding=4, resblocks=resblocks, slope=SLOPE,
            interpret=True,
        )


def test_fused_stage_packed_chaining():
    """stage A (packed_out) -> stage B (packed_in) == unpacked chaining."""
    rng = np.random.default_rng(3)
    T_in = 96
    lengths = np.array([96, 41], np.int32)
    up_wA, up_bA, rbA = _make_stage(rng, 128, 64, 4, (3, 7))
    up_wB, up_bB, rbB = _make_stage(rng, 64, 32, 4, (3, 5))
    x = rng.standard_normal((2, T_in, 128)).astype(np.float32)
    x = x * (np.arange(T_in)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    kw = dict(stride=2, up_padding=1, slope=SLOPE, interpret=True, tile_t=48)

    a_ref = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                        resblocks=rbA, lengths=jnp.asarray(lengths), **kw)
    b_ref = np.asarray(fused_stage(
        a_ref, jnp.asarray(up_wB), jnp.asarray(up_bB),
        resblocks=rbB, lengths=jnp.asarray(lengths) * 2, **kw))

    a_pk = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                       resblocks=rbA, lengths=jnp.asarray(lengths),
                       packed_out=True, **kw)
    assert a_pk.shape[-1] == 128
    b_got = np.asarray(fused_stage(
        a_pk, jnp.asarray(up_wB), jnp.asarray(up_bB),
        resblocks=rbB, lengths=jnp.asarray(lengths) * 2,
        packed_in=T_in * 2, **kw))
    np.testing.assert_allclose(b_got, b_ref, atol=1e-6)


def test_fused_stage_final_conv():
    """Terminal stage with fused conv_post+tanh == XLA stage -> conv -> tanh."""
    from vits_tpu.ops.conv import conv1d

    rng = np.random.default_rng(4)
    C_in, C_out, stride, k_up = 64, 32, 2, 4
    T_in = 120
    lengths = np.array([120, 53], np.int32)
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, (3, 7, 11))
    wpost = (rng.standard_normal((7, C_out, 1)) * 0.2).astype(np.float32)
    x = rng.standard_normal((2, T_in, C_in)).astype(np.float32)
    x = x * (np.arange(T_in)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    pad = (k_up - stride) // 2
    mask = jnp.asarray(
        (np.arange(T_in * stride)[None, :] < lengths[:, None] * stride)
        .astype(np.float32)[..., None])

    stage = xla_stage(x, up_w, up_b, resblocks, stride, pad, mask=mask)
    h = jnp.asarray(stage)
    h = jnp.where(h >= 0, h, h * 0.01)
    wave_ref = np.asarray(
        jnp.tanh(conv1d(h, jnp.asarray(wpost), None, padding=3)) * mask)[..., 0]

    wave = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        stride=stride, up_padding=pad, resblocks=resblocks, slope=SLOPE,
        tile_t=64, interpret=True, lengths=jnp.asarray(lengths),
        final_conv=(jnp.asarray(wpost), 3),
    ))
    assert wave.shape == (2, T_in * stride)
    np.testing.assert_allclose(wave, wave_ref, atol=3e-5)
    assert np.abs(wave[1, 53 * stride:]).max() == 0.0


def test_pack_stage_arrays_matches_in_trace():
    """Load-time packed arrays == the in-trace materialization path."""
    from vits_tpu.ops.pallas.stage import pack_stage_arrays

    rng = np.random.default_rng(5)
    up_w, up_b, resblocks = _make_stage(rng, 64, 32, 4, (3, 7))
    wpost = (rng.standard_normal((7, 32, 1)) * 0.2).astype(np.float32)
    lengths = np.array([100], np.int32)
    x = rng.standard_normal((1, 100, 64)).astype(np.float32)
    kw = dict(stride=2, up_padding=1, resblocks=resblocks, slope=SLOPE,
              tile_t=64, interpret=True, lengths=jnp.asarray(lengths),
              final_conv=(jnp.asarray(wpost), 3))

    ref = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b), **kw))
    arrays = pack_stage_arrays(
        jnp.asarray(up_w), jnp.asarray(up_b), resblocks,
        stride=2, up_padding=1, final_conv=(jnp.asarray(wpost), 3))
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        arrays=arrays, **kw))
    np.testing.assert_array_equal(got, ref)


# --------------------------------------------------------------------------- #
# Round-3 serving formats: bf16 VMEM values and int8 packed weights
# --------------------------------------------------------------------------- #


def test_fused_stage_bf16_values_close():
    """value_dtype=bf16 (the TPU serving default) stays within bf16 rounding
    of the fp32 XLA stage; accumulation is fp32 so error does not compound
    catastrophically across the pair chain."""
    rng = np.random.default_rng(11)
    C_in, C_out, stride, k_up = 64, 32, 2, 4
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, (3, 7, 11))
    x = rng.standard_normal((2, 96, C_in)).astype(np.float32)
    pad = (k_up - stride) // 2

    expected = xla_stage(x, up_w, up_b, resblocks, stride, pad)
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        stride=stride, up_padding=pad, resblocks=resblocks, slope=SLOPE,
        tile_t=64, interpret=True, value_dtype=jnp.bfloat16,
    ))
    assert got.dtype == np.float32  # non-chained outputs stay fp32
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(got / scale, expected / scale, atol=0.03)


def test_fused_stage_bf16x3_precision():
    """precision="high" (3-pass bf16x3 kernel dots — Mosaic has no
    Precision.HIGH lowering, so ops/pallas/kernel_dot emulates it with hi/lo
    bf16 splits) lands between single-pass bf16 (~3e-2) and fp32-exact:
    the dropped lo*lo term is O(2^-16) relative, so the stage stays within
    ~1e-4 of the fp32 XLA reference."""
    rng = np.random.default_rng(11)
    C_in, C_out, stride, k_up = 64, 32, 2, 4
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, (3, 7, 11))
    x = rng.standard_normal((2, 96, C_in)).astype(np.float32)
    pad = (k_up - stride) // 2

    expected = xla_stage(x, up_w, up_b, resblocks, stride, pad)
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        stride=stride, up_padding=pad, resblocks=resblocks, slope=SLOPE,
        tile_t=64, interpret=True, precision="high",
    ))
    scale = max(1.0, float(np.abs(expected).max()))
    np.testing.assert_allclose(got / scale, expected / scale, atol=1e-4)


def _chan_dequant(w, axes):
    """Symmetric per-out-channel int8 round-trip (io/quantize.py scheme)."""
    absmax = np.max(np.abs(w), axis=axes, keepdims=True)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0)
    return (np.clip(np.round(w / scale), -127, 127) * scale).astype(np.float32)


def test_fused_stage_int8_packed():
    """int8 packed weights + in-kernel accumulator dequant must match the
    fp32 kernel running per-out-channel DEQUANTIZED weights (the packing
    preserves the raw quantization scheme exactly), and stay loosely within
    quantization error of the unquantized fp32 kernel."""
    from vits_tpu.ops.pallas.stage import pack_stage_arrays

    rng = np.random.default_rng(12)
    C_in, C_out, stride, k_up = 64, 32, 2, 4
    up_w, up_b, resblocks = _make_stage(rng, C_in, C_out, k_up, (3, 7))
    wpost = (rng.standard_normal((7, C_out, 1)) * 0.2).astype(np.float32)
    lengths = np.array([100, 57], np.int32)
    x = rng.standard_normal((2, 100, C_in)).astype(np.float32)
    x = x * (np.arange(100)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    kw = dict(stride=stride, up_padding=1, slope=SLOPE,
              tile_t=64, interpret=True, lengths=jnp.asarray(lengths))

    # exact reference: fp32 kernel over channel-dequantized weights
    rb_deq = [
        {**rb,
         "w1": _chan_dequant(rb["w1"], (1, 2)),
         "w2": _chan_dequant(rb["w2"], (1, 2))}
        for rb in resblocks
    ]
    ref_q = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(_chan_dequant(up_w, (0, 1))),
        jnp.asarray(up_b), resblocks=rb_deq,
        final_conv=(jnp.asarray(_chan_dequant(wpost, (0, 1))), 3), **kw))

    arrays = pack_stage_arrays(
        jnp.asarray(up_w), jnp.asarray(up_b), resblocks,
        stride=stride, up_padding=1, final_conv=(jnp.asarray(wpost), 3),
        weight_format="int8")
    # the big arrays really are 1 byte/entry + fp32 scale rows
    assert arrays["w1_all"].dtype == jnp.int8
    assert arrays["w2_all"].dtype == jnp.int8
    assert arrays["wu"].dtype == jnp.int8
    assert arrays["wq"].dtype == jnp.int8
    assert arrays["s1"].dtype == jnp.float32 and arrays["su"].dtype == jnp.float32
    got = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        resblocks=resblocks, arrays=arrays,
        final_conv=(jnp.asarray(wpost), 3), **kw))
    np.testing.assert_allclose(got, ref_q, atol=2e-5)
    assert np.abs(got[1, 57 * stride:]).max() == 0.0  # masking intact

    # sanity: quantization error vs the unquantized fp32 kernel is bounded
    ref = np.asarray(fused_stage(
        jnp.asarray(x), jnp.asarray(up_w), jnp.asarray(up_b),
        resblocks=resblocks, final_conv=(jnp.asarray(wpost), 3), **kw))
    assert 0 < np.abs(got - ref).max() < 0.25


def test_fused_stage_int8_bf16_values_chain():
    """int8 packs + bf16 values through the packed two-stage chain (the real
    TPU serving configuration for a quantized checkpoint)."""
    from vits_tpu.ops.pallas.stage import pack_stage_arrays

    rng = np.random.default_rng(13)
    T_in = 64
    up_wA, up_bA, rbA = _make_stage(rng, 128, 64, 4, (3, 7))
    up_wB, up_bB, rbB = _make_stage(rng, 64, 32, 4, (3, 5))
    x = rng.standard_normal((1, T_in, 128)).astype(np.float32)
    kw = dict(stride=2, up_padding=1, slope=SLOPE, interpret=True, tile_t=48)

    a_ref = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                        resblocks=rbA, **kw)
    b_ref = np.asarray(fused_stage(
        a_ref, jnp.asarray(up_wB), jnp.asarray(up_bB), resblocks=rbB, **kw))

    packA = pack_stage_arrays(jnp.asarray(up_wA), jnp.asarray(up_bA), rbA,
                              stride=2, up_padding=1, weight_format="int8")
    packB = pack_stage_arrays(jnp.asarray(up_wB), jnp.asarray(up_bB), rbB,
                              stride=2, up_padding=1, weight_format="int8")
    a_q = fused_stage(jnp.asarray(x), jnp.asarray(up_wA), jnp.asarray(up_bA),
                      resblocks=rbA, arrays=packA, packed_out=True,
                      value_dtype=jnp.bfloat16, **kw)
    assert a_q.dtype == jnp.bfloat16  # chained carry rides the value dtype
    b_q = np.asarray(fused_stage(
        a_q, jnp.asarray(up_wB), jnp.asarray(up_bB), resblocks=rbB,
        arrays=packB, packed_in=T_in * 2, value_dtype=jnp.bfloat16, **kw))
    scale = max(1.0, float(np.abs(b_ref).max()))
    np.testing.assert_allclose(b_q / scale, b_ref / scale, atol=0.08)
