"""Conv primitive unit tests: torch equivalence for every formulation."""

import numpy as np
import pytest
import torch

from vits_tpu.io.params import from_torch_layout
from vits_tpu.ops.conv import (
    _conv_transpose_matmul,
    conv1d,
    conv_transpose1d,
    depthwise_conv1d,
)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (1, 2, 1), (2, 1, 1), (1, 4, 2)])
def test_conv1d_matches_torch(rng, stride, padding, dilation):
    B, T, Cin, Cout, k = 2, 20, 6, 10, 3
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    conv = torch.nn.Conv1d(Cin, Cout, k, stride=stride, padding=padding, dilation=dilation)
    with torch.no_grad():
        expected = conv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()
    w = from_torch_layout("x.weight", conv.weight.detach().numpy())
    got = conv1d(x, w, conv.bias.detach().numpy(),
                 stride=stride, padding=padding, dilation=dilation)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_depthwise_matches_torch(rng):
    B, T, C, k, dil = 1, 16, 8, 3, 3
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    conv = torch.nn.Conv1d(C, C, k, groups=C, dilation=dil, padding=dil)
    with torch.no_grad():
        expected = conv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()
    w = from_torch_layout("x.weight", conv.weight.detach().numpy())
    got = depthwise_conv1d(x, w, conv.bias.detach().numpy(), padding=dil, dilation=dil)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


@pytest.mark.parametrize("Cin,Cout,k,s,method", [
    (6, 4, 16, 8, "dilated"), (6, 4, 16, 8, "matmul"),
    (8, 4, 4, 2, "matmul"), (6, 4, 5, 2, "dilated"),
    (6, 4, 16, 8, "phases"), (8, 4, 4, 2, "phases"), (5, 3, 8, 4, "phases"),
])
def test_conv_transpose_matches_torch(rng, Cin, Cout, k, s, method):
    """Both formulations pinned against torch."""
    B, T = 1, 12
    p = (k - s) // 2
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    conv = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p)
    with torch.no_grad():
        expected = conv(torch.tensor(x).transpose(1, 2)).transpose(1, 2).numpy()
    w = from_torch_layout("decoder.upsampler.0.weight", conv.weight.detach().numpy())
    got = conv_transpose1d(x, w, conv.bias.detach().numpy(), stride=s, padding=p,
                           method=method)
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_conv_transpose_formulations_agree(rng):
    """matmul overlap-add == dilated-conv formulation on the same kernel."""
    import jax.numpy as jnp
    from jax import lax

    B, T, Cin, Cout, k, s = 2, 10, 8, 6, 8, 4
    p = (k - s) // 2
    x = rng.standard_normal((B, T, Cin)).astype(np.float32)
    kern = rng.standard_normal((k, Cin, Cout)).astype(np.float32)
    dilated = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kern), (1,), ((k - 1 - p,) * 2,),
        lhs_dilation=(s,), dimension_numbers=("NHC", "HIO", "NHC"),
    )
    matmul = _conv_transpose_matmul(jnp.asarray(x), jnp.asarray(kern), None, s, p)
    np.testing.assert_allclose(np.asarray(matmul), np.asarray(dilated), atol=1e-5)
