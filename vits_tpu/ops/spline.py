"""Piecewise rational-quadratic spline flow, fully vectorized and maskable.

The reference implements the unconstrained RQS with data-dependent compaction:
boolean masks select inside-interval elements into a smaller tensor, the spline
runs on the compacted array, and a stateful sequential scatter writes results
back (/root/reference/src/vits.cpp:695-852, custom-ops tensor_masked_get/set
:739-861 — single-threaded by necessity).  On TPU that shape-dynamic compaction
is the wrong program: instead the spline is evaluated at *every* position on
clamped inputs and the identity branch is selected with ``jnp.where`` — all
static shapes, all VPU-parallel, numerically identical on inside-interval
elements to HF ``_rational_quadratic_spline`` / ``_unconstrained_rational_
quadratic_spline`` (modeling_vits.py).

Both the reverse (inference) and forward (training, with log|det J|) directions
are provided; the reference only ever implements reverse (vits.cpp:708,778).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def unconstrained_rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    *,
    reverse: bool,
    tail_bound: float = 5.0,
    min_bin_width: float = 1e-3,
    min_bin_height: float = 1e-3,
    min_derivative: float = 1e-3,
):
    """inputs: (...,); unnormalized_*: (..., num_bins[-1 for derivatives]).

    Returns (outputs, log_abs_det) with identity (log-det 0) outside
    [-tail_bound, tail_bound].
    """
    inside = (inputs >= -tail_bound) & (inputs <= tail_bound)
    constant = math.log(math.exp(1 - min_derivative) - 1)
    unnormalized_derivatives = jnp.pad(
        unnormalized_derivatives,
        [(0, 0)] * (unnormalized_derivatives.ndim - 1) + [(1, 1)],
        constant_values=constant,
    )
    clamped = jnp.clip(inputs, -tail_bound, tail_bound)
    spline_out, spline_logdet = rational_quadratic_spline(
        clamped,
        unnormalized_widths,
        unnormalized_heights,
        unnormalized_derivatives,
        reverse=reverse,
        tail_bound=tail_bound,
        min_bin_width=min_bin_width,
        min_bin_height=min_bin_height,
        min_derivative=min_derivative,
    )
    outputs = jnp.where(inside, spline_out, inputs)
    log_abs_det = jnp.where(inside, spline_logdet, 0.0)
    return outputs, log_abs_det


def rational_quadratic_spline(
    inputs: jax.Array,
    unnormalized_widths: jax.Array,
    unnormalized_heights: jax.Array,
    unnormalized_derivatives: jax.Array,
    *,
    reverse: bool,
    tail_bound: float,
    min_bin_width: float = 1e-3,
    min_bin_height: float = 1e-3,
    min_derivative: float = 1e-3,
):
    upper_bound = tail_bound
    lower_bound = -tail_bound
    num_bins = unnormalized_widths.shape[-1]
    if min_bin_width * num_bins > 1.0:
        raise ValueError(f"min_bin_width {min_bin_width} too large for {num_bins} bins")
    if min_bin_height * num_bins > 1.0:
        raise ValueError(f"min_bin_height {min_bin_height} too large for {num_bins} bins")

    def _cumulative(unnormalized, min_bin):
        fracs = jax.nn.softmax(unnormalized, axis=-1)
        fracs = min_bin + (1 - min_bin * num_bins) * fracs
        cum = jnp.cumsum(fracs, axis=-1)
        cum = jnp.pad(cum, [(0, 0)] * (cum.ndim - 1) + [(1, 0)])
        cum = (upper_bound - lower_bound) * cum + lower_bound
        cum = cum.at[..., 0].set(lower_bound)
        cum = cum.at[..., -1].set(upper_bound)
        sizes = cum[..., 1:] - cum[..., :-1]
        return cum, sizes

    cumwidths, widths = _cumulative(unnormalized_widths, min_bin_width)
    cumheights, heights = _cumulative(unnormalized_heights, min_bin_height)
    derivatives = min_derivative + jax.nn.softplus(unnormalized_derivatives)

    bin_locations = cumheights if reverse else cumwidths
    bin_locations = bin_locations.at[..., -1].add(1e-6)
    bin_idx = jnp.sum(inputs[..., None] >= bin_locations, axis=-1) - 1
    bin_idx = jnp.clip(bin_idx, 0, num_bins - 1)[..., None]

    def gather(t):
        return jnp.take_along_axis(t, bin_idx, axis=-1)[..., 0]

    input_cumwidths = gather(cumwidths)
    input_bin_widths = gather(widths)
    input_cumheights = gather(cumheights)
    delta = heights / widths
    input_delta = gather(delta)
    input_derivatives = gather(derivatives)
    input_derivatives_plus_one = gather(derivatives[..., 1:])
    input_heights = gather(heights)

    intermediate1 = input_derivatives + input_derivatives_plus_one - 2 * input_delta
    if not reverse:
        theta = (inputs - input_cumwidths) / input_bin_widths
        theta_one_minus_theta = theta * (1 - theta)
        numerator = input_heights * (
            input_delta * theta**2 + input_derivatives * theta_one_minus_theta
        )
        denominator = input_delta + intermediate1 * theta_one_minus_theta
        outputs = input_cumheights + numerator / denominator
        derivative_numerator = input_delta**2 * (
            input_derivatives_plus_one * theta**2
            + 2 * input_delta * theta_one_minus_theta
            + input_derivatives * (1 - theta) ** 2
        )
        log_abs_det = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
        return outputs, log_abs_det

    intermediate2 = inputs - input_cumheights
    intermediate3 = intermediate2 * intermediate1
    a = input_heights * (input_delta - input_derivatives) + intermediate3
    b = input_heights * input_derivatives - intermediate3
    c = -input_delta * intermediate2
    discriminant = jnp.maximum(b**2 - 4 * a * c, 0.0)
    root = (2 * c) / (-b - jnp.sqrt(discriminant))
    outputs = root * input_bin_widths + input_cumwidths
    theta_one_minus_theta = root * (1 - root)
    denominator = input_delta + intermediate1 * theta_one_minus_theta
    derivative_numerator = input_delta**2 * (
        input_derivatives_plus_one * root**2
        + 2 * input_delta * theta_one_minus_theta
        + input_derivatives * (1 - root) ** 2
    )
    log_abs_det = jnp.log(derivative_numerator) - 2 * jnp.log(denominator)
    return outputs, -log_abs_det
