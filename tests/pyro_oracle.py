"""Pure-numpy oracle of pyro 1.7.0's linear-rational-spline stack.

A from-scratch numpy transcription of the exact semantics the reference
depends on (pyro-ppl 1.7.0, the version pinned by
`/root/reference/requirements.txt`), used to pin parity of the JAX flow
library without pyro installed:

* `_monotonic_rational_spline` (order='linear') — pyro
  `pyro/distributions/transforms/spline.py`: softmax/softplus/sigmoid
  normalisation happens in the caller, the min-floors happen inside, knot
  derivatives are padded on both sides with the constant
  ``1.0 - min_derivative``, bin search adds ``eps`` to the knots, and the
  identity function (zero log-det) applies outside [-bound, bound].
* `SplineCoupling.spline_op` — pyro
  `pyro/distributions/transforms/spline_coupling.py`: hypernet outputs are
  reshaped to (event, K) row-major, then softmax (widths/heights over K),
  softplus (derivatives), sigmoid (lambdas).
* `ConditionalDenseNN` — pyro `pyro/nn/dense_nn.py`: ReLU MLP over
  ``concat([context, x], -1)`` (context FIRST), final layer split into
  param_dims slices.

The reference wires these together in
`models/norm_flows/transforms/conditional_spline_coupling_transform.py:51-78`
(split_dim = input_dim // 2, count_bins=8, order='linear', identity=True).

Everything here is float64 numpy; no torch, no jax.
"""

import numpy as np


def _softmax(x, axis=-1):
    x = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(x)
    return e / np.sum(e, axis=axis, keepdims=True)


def _softplus(x):
    return np.logaddexp(0.0, x)


def _sigmoid(x):
    return 0.5 * (np.tanh(0.5 * x) + 1.0)


def _searchsorted(sorted_sequence, input_values):
    """pyro spline.py _searchsorted: index of the bin each input falls in."""
    return np.sum(input_values[..., None] >= sorted_sequence, axis=-1) - 1


def _select_bins(x, idx):
    """pyro spline.py _select_bins: batched gather along the bin axis with
    per-tensor index clamping."""
    idx = np.clip(idx, 0, x.shape[-1] - 1)
    x = np.broadcast_to(x, idx.shape[:-1] + x.shape[-1:])
    return np.take_along_axis(x, idx, axis=-1)[..., 0]


def _calculate_knots(lengths, lower, upper):
    """pyro spline.py _calculate_knots: normalised bin lengths → scaled
    lengths + cumulative knot positions with exact endpoints."""
    knots = np.cumsum(lengths, axis=-1)
    knots = np.concatenate([np.zeros_like(knots[..., :1]), knots], axis=-1)
    knots = (upper - lower) * knots + lower
    knots[..., 0] = lower
    knots[..., -1] = upper
    lengths = knots[..., 1:] - knots[..., :-1]
    return lengths, knots


def monotonic_rational_spline(
    inputs,
    widths,
    heights,
    derivatives,
    lambdas=None,
    inverse=False,
    bound=3.0,
    min_bin_width=1e-3,
    min_bin_height=1e-3,
    min_derivative=1e-3,
    min_lambda=0.025,
    eps=1e-6,
):
    """pyro 1.7 `_monotonic_rational_spline`, order='linear' branch.

    Takes NORMALISED params (widths/heights already softmaxed to sum 1,
    derivatives already softplus'd, lambdas already sigmoided — as the pyro
    callers supply them) and applies the internal min-floors.
    """
    assert bound > 0.0
    num_bins = widths.shape[-1]
    left, right = -bound, bound
    bottom, top = -bound, bound
    inside_interval = (inputs >= left) & (inputs <= right)

    outputs = np.array(inputs, np.float64, copy=True)
    logabsdet = np.zeros_like(outputs)

    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights
    derivatives = min_derivative + derivatives

    widths, cumwidths = _calculate_knots(widths, left, right)
    heights, cumheights = _calculate_knots(heights, bottom, top)

    # Boundary knot derivatives: constant 1.0 - min_derivative on both sides
    # (pyro copies this from the original LRS implementation).
    pad = np.full(derivatives.shape[:-1] + (1,), 1.0 - min_derivative)
    derivatives = np.concatenate([pad, derivatives, pad], axis=-1)

    bin_idx = _searchsorted(
        (cumheights if inverse else cumwidths) + eps, inputs
    )[..., None]

    input_widths = _select_bins(widths, bin_idx)
    input_cumwidths = _select_bins(cumwidths, bin_idx)
    input_cumheights = _select_bins(cumheights, bin_idx)
    input_delta = _select_bins(heights / widths, bin_idx)
    input_derivatives = _select_bins(derivatives, bin_idx)
    input_derivatives_plus_one = _select_bins(derivatives[..., 1:], bin_idx)
    input_heights = _select_bins(heights, bin_idx)

    assert lambdas is not None, "oracle transcribes the order='linear' branch"
    lambdas = (1.0 - 2.0 * min_lambda) * lambdas + min_lambda
    input_lambdas = _select_bins(lambdas, bin_idx)

    wa = 1.0
    wb = np.sqrt(input_derivatives / input_derivatives_plus_one) * wa
    wc = (
        input_lambdas * wa * input_derivatives
        + (1.0 - input_lambdas) * wb * input_derivatives_plus_one
    ) / input_delta

    ya = input_cumheights
    yb = input_heights + input_cumheights
    yc = ((1.0 - input_lambdas) * wa * ya + input_lambdas * wb * yb) / (
        (1.0 - input_lambdas) * wa + input_lambdas * wb
    )

    if inverse:
        lo = (inputs <= yc).astype(np.float64)
        hi = 1.0 - lo
        numerator = (input_lambdas * wa * (ya - inputs)) * lo + (
            (wc - input_lambdas * wb) * inputs + input_lambdas * wb * yb - wc * yc
        ) * hi
        denominator = ((wc - wa) * inputs + wa * ya - wc * yc) * lo + (
            (wc - wb) * inputs + wb * yb - wc * yc
        ) * hi
        theta = numerator / denominator
        spline_out = theta * input_widths + input_cumwidths
        derivative_numerator = (
            wa * wc * input_lambdas * (yc - ya) * lo
            + wb * wc * (1.0 - input_lambdas) * (yb - yc) * hi
        ) * input_widths
        with np.errstate(divide="ignore", invalid="ignore"):
            spline_lad = np.log(derivative_numerator) - 2.0 * np.log(
                np.abs(denominator)
            )
    else:
        theta = (inputs - input_cumwidths) / input_widths
        lo = (theta <= input_lambdas).astype(np.float64)
        hi = 1.0 - lo
        numerator = (wa * ya * (input_lambdas - theta) + wc * yc * theta) * lo + (
            wc * yc * (1.0 - theta) + wb * yb * (theta - input_lambdas)
        ) * hi
        denominator = (wa * (input_lambdas - theta) + wc * theta) * lo + (
            wc * (1.0 - theta) + wb * (theta - input_lambdas)
        ) * hi
        spline_out = numerator / denominator
        derivative_numerator = (
            wa * wc * input_lambdas * (yc - ya) * lo
            + wb * wc * (1.0 - input_lambdas) * (yb - yc) * hi
        ) / input_widths
        with np.errstate(divide="ignore", invalid="ignore"):
            spline_lad = np.log(derivative_numerator) - 2.0 * np.log(
                np.abs(denominator)
            )

    outputs = np.where(inside_interval, spline_out, outputs)
    logabsdet = np.where(inside_interval, spline_lad, logabsdet)
    return outputs, logabsdet


def spline_coupling_op(
    x, w_raw, h_raw, d_raw, l_raw, event_dim, count_bins, bound=3.0, inverse=False
):
    """pyro SplineCoupling.spline_op: reshape raw hypernet outputs row-major
    to (event_dim, K), normalise, and run the linear spline."""
    shape = w_raw.shape[:-1]
    w = _softmax(w_raw.reshape(shape + (event_dim, count_bins)), axis=-1)
    h = _softmax(h_raw.reshape(shape + (event_dim, count_bins)), axis=-1)
    d = _softplus(d_raw.reshape(shape + (event_dim, count_bins - 1)))
    lam = _sigmoid(l_raw.reshape(shape + (event_dim, count_bins)))
    return monotonic_rational_spline(
        x, w, h, d, lam, inverse=inverse, bound=bound
    )


def conditional_dense_nn(layers, x, context, param_dims):
    """pyro ConditionalDenseNN.forward: ReLU MLP over concat([context, x])
    (context FIRST), final layer split into param_dims slices.

    :param layers: list of (weight (out, in), bias (out,)) numpy pairs in
        torch layout (same layout as the reference state dicts).
    """
    context = np.broadcast_to(context, x.shape[:-1] + context.shape[-1:])
    h = np.concatenate([context, x], axis=-1)
    for i, (w, b) in enumerate(layers):
        h = h @ w.T + b
        if i < len(layers) - 1:
            h = np.maximum(h, 0.0)
    if len(param_dims) == 1:
        return h
    out, start = [], 0
    for d in param_dims:
        out.append(h[..., start : start + d])
        start += d
    return tuple(out)


def spline_coupling_call(x, context, layers, split_dim, count_bins, bound=3.0, inverse=False):
    """Full pyro SplineCoupling._call / ._inverse with identity=True
    (the reference configuration, conditional_spline_coupling_transform.py:78):
    the first split_dim dims pass through unchanged and, together with the
    context, parameterise the spline on the remaining dims.

    Returns (y, log_det_per_upper_dim) where log_det is log|dy2/dx2|
    elementwise over the transformed dims (pyro caches exactly this and
    sums it in log_abs_det_jacobian).
    """
    x1, x2 = x[..., :split_dim], x[..., split_dim:]
    event_dim = x.shape[-1] - split_dim
    param_dims = [
        event_dim * count_bins,
        event_dim * count_bins,
        event_dim * (count_bins - 1),
        event_dim * count_bins,
    ]
    w_raw, h_raw, d_raw, l_raw = conditional_dense_nn(layers, x1, context, param_dims)
    y2, lad = spline_coupling_op(
        x2, w_raw, h_raw, d_raw, l_raw, event_dim, count_bins, bound, inverse=inverse
    )
    return np.concatenate([x1, y2], axis=-1), lad
