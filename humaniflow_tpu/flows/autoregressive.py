"""Masked autoregressive flow transforms + flow BatchNorm.

Completes the reference factory's transform menu
(pyro_conditional_norm_flow.py:35-37: 'affine_masked' via pyro
conditional_affine_autoregressive, 'spline_masked' via
conditional_spline_autoregressive, and the optional trans.BatchNorm layer
:77-78).

MADE-style masking: one hypernet pass computes per-dimension parameters with
a strictly-lower-triangular dependency structure over the (tiny, 3-dim)
event.  The forward (sampling) direction is sequential over event dims by
construction — for event_dim=3 that is an unrolled 3-step loop; the inverse
(density) direction is fully parallel, which is the hot path (training
log-prob).
"""

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from .dense_nn import init_dense_nn
from .spline import monotonic_rational_spline


def _made_masks(event_dim: int, hidden_dims: Tuple[int, ...], context_dim: int):
    """Degree-based MADE masks.  Inputs carry degrees 1..D (context gets
    degree 0 = visible to all); hidden units cycle degrees 1..D-1; output
    parameter block d may depend on degrees < d+1 (strictly causal)."""
    import numpy as np

    in_deg = np.concatenate([np.zeros(context_dim), np.arange(1, event_dim + 1)])
    masks = []
    prev = in_deg
    for h in hidden_dims:
        deg = 1 + (np.arange(h) % max(event_dim - 1, 1))
        masks.append((prev[:, None] <= deg[None, :]).astype(np.float32))
        prev = deg
    # output degree d depends on hidden degrees < d ⇒ strict inequality
    out_deg = np.arange(1, event_dim + 1)
    masks.append((prev[:, None] < out_deg[None, :]).astype(np.float32))
    return [jnp.asarray(m) for m in masks]


def _apply_made(params, masks, x, context, num_param_blocks: int):
    """Masked MLP: returns (..., D, num_param_blocks) parameters with
    parameter block d independent of x[..., d:]."""
    context = jnp.broadcast_to(context, x.shape[:-1] + context.shape[-1:])
    h = jnp.concatenate([context, x], axis=-1)
    n_layers = len(params)
    outs = []
    for block in range(num_param_blocks):
        hb = h
        for i in range(n_layers):
            layer = params[f"layer_{i}"]
            kernel = layer["kernel"][block] if layer["kernel"].ndim >= 3 else layer["kernel"]
            bias = layer["bias"][block] if layer["bias"].ndim >= 2 else layer["bias"]
            mask = masks[i]
            hb = (
                jnp.einsum(
                    "...i,...io->...o", hb, kernel * mask,
                    precision=jax.lax.Precision.HIGHEST,
                )
                + bias
            )
            if i < n_layers - 1:
                hb = jax.nn.relu(hb)
        outs.append(hb)
    return jnp.stack(outs, axis=-1)  # (..., D, num_blocks)


def _init_made(key, event_dim, context_dim, hidden_dims, num_param_blocks):
    """One masked MLP per parameter block, stacked on a leading axis."""
    keys = jax.random.split(key, num_param_blocks)
    subs = [
        init_dense_nn(k, event_dim, context_dim, hidden_dims, (event_dim,))
        for k in keys
    ]
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *subs)


@dataclass(frozen=True)
class ConditionalAffineAutoregressive:
    """IAF/MAF-style conditional affine autoregressive transform (reference
    factory option 'affine_masked')."""

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    log_scale_min_clip: float = -5.0
    log_scale_max_clip: float = 3.0

    @property
    def _masks(self):
        return _made_masks(self.input_dim, self.hidden_dims, self.context_dim)

    def init(self, key):
        return {
            "made": _init_made(key, self.input_dim, self.context_dim,
                               self.hidden_dims, 2)
        }

    def _params_at(self, params, x, context):
        out = _apply_made(params["made"], self._masks, x, context, 2)
        mean = out[..., 0]
        log_scale = jnp.clip(out[..., 1], self.log_scale_min_clip, self.log_scale_max_clip)
        return mean, log_scale

    def forward(self, params, x, context):
        """Sampling direction: y_d = mean_d(y_<d) + exp(s_d(y_<d))·x_d —
        sequential in d (3 unrolled steps)."""
        y = jnp.zeros_like(x)
        log_scale_final = jnp.zeros_like(x)
        for d in range(self.input_dim):
            mean, log_scale = self._params_at(params, y, context)
            y = y.at[..., d].set(
                mean[..., d] + jnp.exp(log_scale[..., d]) * x[..., d]
            )
            log_scale_final = log_scale_final.at[..., d].set(log_scale[..., d])
        return y, jnp.sum(log_scale_final, axis=-1)

    def inverse(self, params, y, context):
        """Density direction: fully parallel (params depend on y_<d only)."""
        mean, log_scale = self._params_at(params, y, context)
        x = (y - mean) * jnp.exp(-log_scale)
        return x, jnp.sum(log_scale, axis=-1)


@dataclass(frozen=True)
class ConditionalSplineAutoregressive:
    """Autoregressive linear-rational-spline transform (reference factory
    option 'spline_masked')."""

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    count_bins: int = 8
    bound: float = 3.0

    @property
    def _masks(self):
        return _made_masks(self.input_dim, self.hidden_dims, self.context_dim)

    @property
    def _num_blocks(self):
        return 3 * self.count_bins + (self.count_bins - 1)

    def init(self, key):
        return {
            "made": _init_made(key, self.input_dim, self.context_dim,
                               self.hidden_dims, self._num_blocks)
        }

    def _spline_params(self, params, x, context):
        k = self.count_bins
        out = _apply_made(params["made"], self._masks, x, context, self._num_blocks)
        w = out[..., :k]
        h = out[..., k : 2 * k]
        d = out[..., 2 * k : 3 * k - 1]
        l = out[..., 3 * k - 1 :]
        return w, h, d, l

    def forward(self, params, x, context):
        y = jnp.zeros_like(x)
        total_ld = jnp.zeros_like(x)
        for dim in range(self.input_dim):
            w, h, d, l = self._spline_params(params, y, context)
            out, ld = monotonic_rational_spline(x, w, h, d, l, bound=self.bound)
            y = y.at[..., dim].set(out[..., dim])
            total_ld = total_ld.at[..., dim].set(ld[..., dim])
        return y, jnp.sum(total_ld, axis=-1)

    def inverse(self, params, y, context):
        w, h, d, l = self._spline_params(params, y, context)
        x, ld_inv = monotonic_rational_spline(y, w, h, d, l, inverse=True, bound=self.bound)
        return x, -jnp.sum(ld_inv, axis=-1)


@dataclass(frozen=True)
class FlowBatchNorm:
    """BatchNorm flow layer (pyro trans.BatchNorm equivalent; reference
    factory :73-78).  Note the pyro convention: `forward` here (base→data)
    applies the *inverse* normalisation x·√(v+ε)·exp(-log γ̂)... in pyro the
    module's _call is inverse-batch-norm because training uses inverse
    transforms.  We implement the standard convention: inverse (density
    direction) normalises with running statistics; forward de-normalises."""

    input_dim: int
    momentum: float = 0.1
    epsilon: float = 1e-5

    def init(self, key):
        return {
            "log_gamma": jnp.zeros(self.input_dim),
            "beta": jnp.zeros(self.input_dim),
            # running stats live in params (updated out-of-band if training
            # with this layer; off by default as in the reference config)
            "moving_mean": jnp.zeros(self.input_dim),
            "moving_var": jnp.ones(self.input_dim),
        }

    def forward(self, params, x, context=None):
        std = jnp.sqrt(params["moving_var"] + self.epsilon)
        y = (x - params["beta"]) * jnp.exp(-params["log_gamma"]) * std + params["moving_mean"]
        ld = jnp.sum(jnp.log(std) - params["log_gamma"])
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def inverse(self, params, y, context=None):
        std = jnp.sqrt(params["moving_var"] + self.epsilon)
        x = (y - params["moving_mean"]) / std * jnp.exp(params["log_gamma"]) + params["beta"]
        ld = jnp.sum(jnp.log(std) - params["log_gamma"])
        return x, jnp.broadcast_to(ld, y.shape[:-1])

    def update_stats(self, params, y):
        """Training-mode inverse (pyro BatchNorm `_inverse` with
        self.training=True): EMA-update the running statistics from the
        batch of density-direction inputs AND normalise `y` with the BATCH
        statistics (unbiased variance — torch `Tensor.var(0)` default), so
        downstream transforms see the same values pyro feeds them.  `y`
        may carry extra leading batch axes beyond the stat shape (e.g. a
        stacked body-part axis kept).  Returns (new_params, x)."""
        extra = y.ndim - params["moving_mean"].ndim
        axes = tuple(range(extra))
        mean = jnp.mean(y, axis=axes)
        var = jnp.var(y, axis=axes, ddof=1)
        m = self.momentum
        new = dict(params)
        new["moving_mean"] = (1.0 - m) * params["moving_mean"] + m * mean
        new["moving_var"] = (1.0 - m) * params["moving_var"] + m * var
        std = jnp.sqrt(var + self.epsilon)
        x = (y - mean) / std * jnp.exp(params["log_gamma"]) + params["beta"]
        return new, x
