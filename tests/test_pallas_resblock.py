"""Fused Pallas resblock vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

from vits_tpu.ops.pallas.resblock import fused_resblock, total_halo, xla_resblock


def _make_weights(rng, pairs, k, C):
    w1 = rng.standard_normal((pairs, k, C, C)).astype(np.float32) * 0.1
    b1 = rng.standard_normal((pairs, C)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((pairs, k, C, C)).astype(np.float32) * 0.1
    b2 = rng.standard_normal((pairs, C)).astype(np.float32) * 0.1
    return w1, b1, w2, b2


@pytest.mark.parametrize("kernel_size,dilations", [(3, (1, 3)), (5, (1, 2))])
def test_fused_resblock_matches_xla(kernel_size, dilations):
    rng = np.random.default_rng(0)
    B, T, C = 2, 96, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w1, b1, w2, b2 = _make_weights(rng, len(dilations), kernel_size, C)

    expected = xla_resblock(
        x, ([w1[i] for i in range(len(dilations))],
            [b1[i] for i in range(len(dilations))],
            [w2[i] for i in range(len(dilations))],
            [b2[i] for i in range(len(dilations))]),
        kernel_size, dilations, 0.1,
    )
    got = fused_resblock(
        x, w1, b1, w2, b2,
        kernel_size=kernel_size, dilations=dilations, slope=0.1,
        tile_t=32, interpret=True, packing=1,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_fused_resblock_tile_not_dividing():
    """T not a multiple of tile_t exercises the tail-padding path."""
    rng = np.random.default_rng(1)
    B, T, C = 1, 50, 8
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w1, b1, w2, b2 = _make_weights(rng, 2, 3, C)
    expected = xla_resblock(
        x, ([w1[0], w1[1]], [b1[0], b1[1]], [w2[0], w2[1]], [b2[0], b2[1]]),
        3, (1, 3), 0.1,
    )
    got = fused_resblock(
        x, w1, b1, w2, b2, kernel_size=3, dilations=(1, 3), slope=0.1,
        tile_t=16, interpret=True, packing=1,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_total_halo():
    # k=11, dilations (1,3,5): pairs halos (5+5, 15+5, 25+5) = 60
    assert total_halo(11, (1, 3, 5)) == 60
    assert total_halo(3, (1, 3, 5)) == 12


# --------------------------------------------------------------------------- #
# Time-packed variant (C < 128): g = 128/C timesteps folded into the lane dim
# --------------------------------------------------------------------------- #


@pytest.mark.parametrize("C,kernel_size,dilations", [
    (64, 3, (1, 3, 5)),   # g=2, residual offsets all even -> slice path
    (64, 11, (1, 3, 5)),  # g=2, widest receptive field
    (32, 7, (1, 3, 5)),   # g=4, residual offsets 6/18/30 -> block-matmul path
    (32, 11, (1, 3, 5)),  # g=4
    (8, 5, (1, 2)),       # g=16, stress slot bookkeeping
])
def test_packed_resblock_matches_xla(C, kernel_size, dilations):
    rng = np.random.default_rng(2)
    B, T = 2, 150
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    w1, b1, w2, b2 = _make_weights(rng, len(dilations), kernel_size, C)

    expected = xla_resblock(
        x, ([w1[i] for i in range(len(dilations))],
            [b1[i] for i in range(len(dilations))],
            [w2[i] for i in range(len(dilations))],
            [b2[i] for i in range(len(dilations))]),
        kernel_size, dilations, 0.1,
    )
    got = fused_resblock(
        x, w1, b1, w2, b2,
        kernel_size=kernel_size, dilations=dilations, slope=0.1,
        tile_t=16, interpret=True,
    )
    scale = max(1.0, float(np.abs(np.asarray(expected)).max()))
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(expected) / scale, atol=5e-6
    )


def test_packed_resblock_masks_like_module():
    """Per-row lengths: padded tail must match the mask-propagating module
    behavior (zeros past each row's valid length at every conv boundary)."""
    import jax.numpy as jnp

    from vits_tpu.ops.conv import conv1d, leaky_relu

    rng = np.random.default_rng(3)
    B, T, C, k, dils = 2, 96, 32, 3, (1, 3)
    lengths = np.array([96, 41], np.int32)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    x = x * mask
    w1, b1, w2, b2 = _make_weights(rng, len(dils), k, C)

    # reference: masked XLA path exactly as models/hifigan._resblock
    def masked_ref(x):
        x = jnp.asarray(x)
        m = jnp.asarray(mask)
        for i, d in enumerate(dils):
            res = x
            h = leaky_relu(x, 0.1)
            h = conv1d(h, jnp.asarray(w1[i]), jnp.asarray(b1[i]),
                       padding=(k * d - d) // 2, dilation=d) * m
            h = leaky_relu(h, 0.1)
            h = conv1d(h, jnp.asarray(w2[i]), jnp.asarray(b2[i]),
                       padding=(k - 1) // 2) * m
            x = h + res
        return np.asarray(x)

    expected = masked_ref(x)
    got = fused_resblock(
        x, w1, b1, w2, b2, kernel_size=k, dilations=dils, slope=0.1,
        tile_t=16, lengths=jnp.asarray(lengths), interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_fused_resblock_trio_matches_mean():
    """One-kernel trio (+mean) == mean of three fused_resblock calls.

    fused_resblock itself is pinned against the XLA module math above, so
    the mean of its outputs (with identical per-row length masking) is the
    module-equivalent reference.
    """
    import jax.numpy as jnp

    from vits_tpu.ops.pallas.resblock import fused_resblock, fused_resblock_trio

    rng = np.random.default_rng(7)
    C, T = 128, 96
    lengths = np.array([96, 37], np.int32)
    x = rng.standard_normal((2, T, C)).astype(np.float32)
    x = x * (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)[..., None]
    blocks = []
    for k in (3, 7, 11):
        blocks.append(dict(
            kernel_size=k, dilations=(1, 3, 5),
            w1=jnp.asarray(rng.standard_normal((3, k, C, C)) * 0.05, jnp.float32),
            b1=jnp.asarray(rng.standard_normal((3, C)) * 0.05, jnp.float32),
            w2=jnp.asarray(rng.standard_normal((3, k, C, C)) * 0.05, jnp.float32),
            b2=jnp.asarray(rng.standard_normal((3, C)) * 0.05, jnp.float32),
        ))

    lens = jnp.asarray(lengths)
    ref = sum(
        np.asarray(fused_resblock(
            jnp.asarray(x), b["w1"], b["b1"], b["w2"], b["b2"],
            kernel_size=b["kernel_size"], dilations=(1, 3, 5), slope=0.1,
            tile_t=32, lengths=lens, interpret=True))
        for b in blocks
    ) / len(blocks)
    got = np.asarray(fused_resblock_trio(
        jnp.asarray(x), blocks, slope=0.1, tile_t=32,
        lengths=lens, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    assert np.abs(got[1, 37:]).max() == 0.0


# --------------------------------------------------------------------------- #
# Round-3 serving formats: bf16 VMEM values and int8 trio weights
# --------------------------------------------------------------------------- #

import jax.numpy as jnp  # noqa: E402


def _make_trio(rng, C, ks):
    blocks = []
    for k in ks:
        blocks.append(dict(
            kernel_size=k, dilations=(1, 3, 5),
            w1=(rng.standard_normal((3, k, C, C)) * 0.1).astype(np.float32),
            b1=(rng.standard_normal((3, C)) * 0.1).astype(np.float32),
            w2=(rng.standard_normal((3, k, C, C)) * 0.1).astype(np.float32),
            b2=(rng.standard_normal((3, C)) * 0.1).astype(np.float32),
        ))
    return blocks


def _trio_ref(x, blocks):
    out = None
    for blk in blocks:
        y = xla_resblock(
            x,
            ([blk["w1"][i] for i in range(3)], [blk["b1"][i] for i in range(3)],
             [blk["w2"][i] for i in range(3)], [blk["b2"][i] for i in range(3)]),
            blk["kernel_size"], blk["dilations"], 0.1)
        out = y if out is None else out + y
    return np.asarray(out) / len(blocks)


def test_trio_bf16_values_close():
    from vits_tpu.ops.pallas.resblock import fused_resblock_trio

    rng = np.random.default_rng(20)
    C = 128
    blocks = _make_trio(rng, C, (3, 7))
    x = rng.standard_normal((1, 64, C)).astype(np.float32)
    ref = _trio_ref(x, blocks)
    got = np.asarray(fused_resblock_trio(
        jnp.asarray(x), blocks, slope=0.1, tile_t=32, interpret=True,
        value_dtype=jnp.bfloat16))
    scale = max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(got / scale, ref / scale, atol=0.03)


def test_trio_int8_weights():
    """int8 trio weights + accumulator dequant == fp32 trio over the SAME
    per-out-channel dequantized weights (tight), and within quantization
    error of the unquantized trio (loose sanity)."""
    from vits_tpu.models.hifigan import _quantize_conv_stack
    from vits_tpu.ops.pallas.resblock import fused_resblock_trio

    rng = np.random.default_rng(21)
    C = 128
    blocks = _make_trio(rng, C, (3, 7))
    x = rng.standard_normal((2, 64, C)).astype(np.float32)
    ref = np.asarray(fused_resblock_trio(
        jnp.asarray(x), blocks, slope=0.1, tile_t=32, interpret=True))

    qblocks, dblocks = [], []
    for blk in blocks:
        w1q, s1 = _quantize_conv_stack(jnp.asarray(blk["w1"]))
        w2q, s2 = _quantize_conv_stack(jnp.asarray(blk["w2"]))
        assert w1q.dtype == jnp.int8 and s1.shape == (3, C)
        qblocks.append({**blk, "w1": w1q, "w2": w2q, "s1": s1, "s2": s2})
        dblocks.append({
            **blk,
            "w1": np.asarray(w1q, np.float32) * np.asarray(s1)[:, None, None, :],
            "w2": np.asarray(w2q, np.float32) * np.asarray(s2)[:, None, None, :],
        })
    got = np.asarray(fused_resblock_trio(
        jnp.asarray(x), qblocks, slope=0.1, tile_t=32, interpret=True))
    ref_q = np.asarray(fused_resblock_trio(
        jnp.asarray(x), dblocks, slope=0.1, tile_t=32, interpret=True))
    np.testing.assert_allclose(got, ref_q, atol=2e-4)
    assert 0 < np.abs(got - ref).max() < 0.5 * max(1.0, float(np.abs(ref).max()))
