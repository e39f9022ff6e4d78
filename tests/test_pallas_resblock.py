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
        tile_t=32, interpret=True,
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
        tile_t=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_total_halo():
    # k=11, dilations (1,3,5): pairs halos (5+5, 15+5, 25+5) = 60
    assert total_halo(11, (1, 3, 5)) == 60
    assert total_halo(3, (1, 3, 5)) == 12
