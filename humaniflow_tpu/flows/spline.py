"""Monotonic linear-rational spline (LRS) bijection, forward + inverse + logdet.

Semantics match pyro 1.7's `_monotonic_rational_spline` with order='linear'
(the reference's default pose transform, via
models/norm_flows/transforms/conditional_spline_coupling_transform.py:51 →
pyro SplineCoupling), re-derived from the linear-rational-spline construction
(Dolatabadi et al., AISTATS 2020):

* bin widths/heights: softmax → floor at min_bin fraction → cumulative knots
  rescaled to [-bound, bound] with exact endpoints;
* knot derivatives: count_bins-1 free params, softplus + min_derivative, with
  boundary derivatives padded with pyro's constant 1 - min_derivative;
* per-bin division point lambda: sigmoid squashed to [min_lambda, 1-min_lambda];
* outside [-bound, bound]: identity with zero log-det.

Pure jnp, fully batched and branch-free (masked `where`s instead of the
reference's in-place index assignment) so it vectorises across
batch × samples × body-parts × preimage-branches in one fused XLA program.
"""

import jax
import jax.numpy as jnp

MIN_BIN_WIDTH = 1e-3
MIN_BIN_HEIGHT = 1e-3
MIN_DERIVATIVE = 1e-3
MIN_LAMBDA = 0.025
EPS = 1e-6

# Boundary-knot derivative: pyro pads with the CONSTANT 1.0 - min_derivative
# (spline.py, copied there from the original LRS code) — NOT exactly 1.  Kept
# bit-faithful so densities match the reference checkpoint; pinned against
# the numpy transcription in tests/pyro_oracle.py.
_BOUNDARY_DERIV = 1.0 - MIN_DERIVATIVE


def _make_knots(unnormalized, bound, min_frac):
    """softmax-normalised bin sizes → (bin_sizes, cumulative_knots).

    knots shape (..., K+1) spanning [-bound, bound] exactly.
    """
    num_bins = unnormalized.shape[-1]
    sizes = jax.nn.softmax(unnormalized, axis=-1)
    sizes = min_frac + (1.0 - min_frac * num_bins) * sizes
    cum = jnp.cumsum(sizes, axis=-1)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1]), cum], axis=-1)
    cum = 2.0 * bound * cum - bound
    cum = cum.at[..., 0].set(-bound)
    cum = cum.at[..., -1].set(bound)
    sizes = cum[..., 1:] - cum[..., :-1]
    return sizes, cum


def _search_bins_onehot(knots, x):
    """One-hot indicator of the bin containing each x.

    Gather-free: TPU XLA lowers take_along_axis to a slow generic gather at
    these shapes (measured ~0.15 ms per gather — the former hot spot of the
    whole flow); a (K,)-wide one-hot contraction is a fused VPU op instead.

    :return: (..., K) float one-hot over bins (clamped to the valid range).
    """
    idx = jnp.sum(x[..., None] >= (knots + EPS), axis=-1) - 1
    idx = jnp.clip(idx, 0, knots.shape[-1] - 2)
    k = knots.shape[-1] - 1
    return (idx[..., None] == jnp.arange(k)).astype(x.dtype)


def _gather(params, onehot):
    """Select per-element bin parameters via one-hot contraction."""
    return jnp.sum(params * onehot, axis=-1)


def monotonic_rational_spline(
    inputs,
    w_unnorm,
    h_unnorm,
    d_unnorm,
    l_unnorm,
    inverse: bool = False,
    bound: float = 3.0,
):
    """Elementwise monotonic linear-rational spline.

    :param inputs: (..., D)
    :param w_unnorm/h_unnorm/l_unnorm: (..., D, K) unnormalised widths,
        heights, lambdas; :param d_unnorm: (..., D, K-1) interior derivatives.
    :param inverse: if True, treat inputs as y and return x.
    :return: (outputs (..., D), logabsdet (..., D)) where logabsdet is
        log|dy/dx| if forward, log|dx/dy| if inverse (pyro convention: the
        caller negates for the inverse direction).
    """
    dtype = inputs.dtype
    inside = (inputs >= -bound) & (inputs <= bound)
    x = jnp.clip(inputs, -bound, bound)  # keep the spline math NaN-free

    widths, cumwidths = _make_knots(w_unnorm, bound, MIN_BIN_WIDTH)
    heights, cumheights = _make_knots(h_unnorm, bound, MIN_BIN_HEIGHT)

    pad = jnp.full_like(d_unnorm[..., :1], _BOUNDARY_DERIV)
    interior = MIN_DERIVATIVE + jax.nn.softplus(d_unnorm)
    derivatives = jnp.concatenate([pad, interior, pad], axis=-1)  # (..., K+1)

    lambdas = (1.0 - 2.0 * MIN_LAMBDA) * jax.nn.sigmoid(l_unnorm) + MIN_LAMBDA

    onehot = _search_bins_onehot(cumheights if inverse else cumwidths, x)

    in_w = _gather(widths, onehot)
    in_cw = _gather(cumwidths[..., :-1], onehot)
    in_ch = _gather(cumheights[..., :-1], onehot)
    in_h = _gather(heights, onehot)
    in_delta = _gather(heights / widths, onehot)
    in_d = _gather(derivatives[..., :-1], onehot)
    in_d1 = _gather(derivatives[..., 1:], onehot)
    lam = _gather(lambdas, onehot)

    # LRS weights: wa at the left knot (free; set 1), wb at the right knot,
    # wc at the interior division point.
    wa = jnp.ones_like(in_d)
    wb = jnp.sqrt(in_d / in_d1) * wa
    wc = (lam * wa * in_d + (1.0 - lam) * wb * in_d1) / in_delta

    ya = in_ch
    yb = in_h + in_ch
    yc = ((1.0 - lam) * wa * ya + lam * wb * yb) / ((1.0 - lam) * wa + lam * wb)

    if inverse:
        y = x
        lo = y <= yc
        numerator = jnp.where(
            lo,
            lam * wa * (ya - y),
            (wc - lam * wb) * y + lam * wb * yb - wc * yc,
        )
        denominator = jnp.where(
            lo,
            (wc - wa) * y + wa * ya - wc * yc,
            (wc - wb) * y + wb * yb - wc * yc,
        )
        theta = numerator / denominator
        outputs = theta * in_w + in_cw
        deriv_num = (
            jnp.where(lo, wa * wc * lam * (yc - ya), wb * wc * (1.0 - lam) * (yb - yc))
            * in_w
        )
        logabsdet = jnp.log(jnp.maximum(deriv_num, 1e-38)) - 2.0 * jnp.log(
            jnp.maximum(jnp.abs(denominator), 1e-38)
        )
    else:
        theta = (x - in_cw) / in_w
        lo = theta <= lam
        numerator = jnp.where(
            lo,
            wa * ya * (lam - theta) + wc * yc * theta,
            wc * yc * (1.0 - theta) + wb * yb * (theta - lam),
        )
        denominator = jnp.where(
            lo,
            wa * (lam - theta) + wc * theta,
            wc * (1.0 - theta) + wb * (theta - lam),
        )
        outputs = numerator / denominator
        deriv_num = (
            jnp.where(lo, wa * wc * lam * (yc - ya), wb * wc * (1.0 - lam) * (yb - yc))
            * in_w
        )
        # dy/dx = deriv_num / (denominator² · width²)  ⇒ log|dy/dx|:
        logabsdet = (
            jnp.log(jnp.maximum(deriv_num, 1e-38))
            - 2.0 * jnp.log(jnp.maximum(jnp.abs(denominator), 1e-38))
            - 2.0 * jnp.log(in_w)
        )

    outputs = jnp.where(inside, outputs, inputs)
    logabsdet = jnp.where(inside, logabsdet, jnp.zeros_like(logabsdet))
    return outputs.astype(dtype), logabsdet.astype(dtype)
