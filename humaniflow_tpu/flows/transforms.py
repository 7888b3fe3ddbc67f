"""Flow transform specs: stateless objects with (init, forward, inverse).

Protocol
--------
Each spec is a frozen config object; parameters live in plain dicts so they
stack along a leading body-part axis (see models/humaniflow.py).

* ``init(key) -> params``
* ``forward(params, x, context) -> (y, log_det)``    log_det = log|dy/dx|
* ``inverse(params, y, context) -> (x, log_det)``    log_det = log|dy/dx| at x

log_det is reduced over the event dim (shape = batch shape).  Conventions
follow the reference flow stack (models/norm_flows/): permutation →
conditional coupling per block, then radial-tanh compactification.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .dense_nn import apply_dense_nn, init_dense_nn
from .spline import monotonic_rational_spline


@dataclass(frozen=True)
class Permute:
    """Fixed permutation of event dims (pyro trans.Permute equivalent)."""

    permutation: Tuple[int, ...]

    @property
    def inverse_permutation(self) -> Tuple[int, ...]:
        inv = [0] * len(self.permutation)
        for i, p in enumerate(self.permutation):
            inv[p] = i
        return tuple(inv)

    def init(self, key):
        return {}

    def forward(self, params, x, context=None):
        y = x[..., list(self.permutation)]
        return y, jnp.zeros(x.shape[:-1], x.dtype)

    def inverse(self, params, y, context=None):
        x = y[..., list(self.inverse_permutation)]
        return x, jnp.zeros(y.shape[:-1], y.dtype)


@dataclass(frozen=True)
class ConditionalSplineCoupling:
    """Conditional coupling with a monotonic linear-rational spline.

    Matches the reference's default pose transform
    (conditional_spline_coupling_transform.py:51, identity=True): the first
    split_dim dims pass through unchanged; a hypernet over
    concat([context, x_lower]) emits spline params for the remaining dims.
    """

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    count_bins: int = 8
    bound: float = 3.0
    split_dim: Optional[int] = None

    @property
    def _split(self) -> int:
        return self.input_dim // 2 if self.split_dim is None else self.split_dim

    @property
    def _upper(self) -> int:
        return self.input_dim - self._split

    @property
    def param_dims(self) -> Tuple[int, ...]:
        u, k = self._upper, self.count_bins
        return (u * k, u * k, u * (k - 1), u * k)

    def init(self, key):
        return {
            "hypernet": init_dense_nn(
                key, self._split, self.context_dim, self.hidden_dims, self.param_dims
            )
        }

    def _spline_params(self, params, x1, context):
        w, h, d, l = apply_dense_nn(params["hypernet"], x1, context, self.param_dims)
        u, k = self._upper, self.count_bins
        shape = w.shape[:-1]
        return (
            w.reshape(shape + (u, k)),
            h.reshape(shape + (u, k)),
            d.reshape(shape + (u, k - 1)),
            l.reshape(shape + (u, k)),
        )

    def forward(self, params, x, context):
        s = self._split
        x1, x2 = x[..., :s], x[..., s:]
        w, h, d, l = self._spline_params(params, x1, context)
        y2, ld = monotonic_rational_spline(x2, w, h, d, l, inverse=False, bound=self.bound)
        return jnp.concatenate([x1, y2], axis=-1), jnp.sum(ld, axis=-1)

    def inverse(self, params, y, context):
        s = self._split
        y1, y2 = y[..., :s], y[..., s:]
        w, h, d, l = self._spline_params(params, y1, context)
        x2, ld_inv = monotonic_rational_spline(y2, w, h, d, l, inverse=True, bound=self.bound)
        # spline returns log|dx/dy| when inverse=True; negate → log|dy/dx|
        return jnp.concatenate([y1, x2], axis=-1), -jnp.sum(ld_inv, axis=-1)


@dataclass(frozen=True)
class ConditionalAdditiveCoupling:
    """NICE-style volume-preserving coupling (additive_coupling_transform.py:12)."""

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    split_dim: Optional[int] = None

    @property
    def _split(self) -> int:
        return self.input_dim // 2 if self.split_dim is None else self.split_dim

    @property
    def param_dims(self) -> Tuple[int, ...]:
        return (self.input_dim - self._split,)

    def init(self, key):
        return {
            "hypernet": init_dense_nn(
                key, self._split, self.context_dim, self.hidden_dims, self.param_dims
            )
        }

    def forward(self, params, x, context):
        s = self._split
        x1, x2 = x[..., :s], x[..., s:]
        mean = apply_dense_nn(params["hypernet"], x1, context, self.param_dims)
        y = jnp.concatenate([x1, x2 + mean], axis=-1)
        return y, jnp.zeros(x.shape[:-1], x.dtype)

    def inverse(self, params, y, context):
        s = self._split
        y1, y2 = y[..., :s], y[..., s:]
        mean = apply_dense_nn(params["hypernet"], y1, context, self.param_dims)
        x = jnp.concatenate([y1, y2 - mean], axis=-1)
        return x, jnp.zeros(y.shape[:-1], y.dtype)


@dataclass(frozen=True)
class ConditionalAffineCoupling:
    """RealNVP-style affine coupling (pyro conditional_affine_coupling
    equivalent; reference factory option 'affine_coupling',
    pyro_conditional_norm_flow.py:82)."""

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    split_dim: Optional[int] = None
    log_scale_min_clip: float = -5.0
    log_scale_max_clip: float = 3.0

    @property
    def _split(self) -> int:
        return self.input_dim // 2 if self.split_dim is None else self.split_dim

    @property
    def param_dims(self) -> Tuple[int, ...]:
        u = self.input_dim - self._split
        return (u, u)

    def init(self, key):
        return {
            "hypernet": init_dense_nn(
                key, self._split, self.context_dim, self.hidden_dims, self.param_dims
            )
        }

    def _clamp(self, log_scale):
        # clamp_preserve_gradients: clamp on the forward pass, identity grads
        clamped = jnp.clip(log_scale, self.log_scale_min_clip, self.log_scale_max_clip)
        return log_scale + jax.lax.stop_gradient(clamped - log_scale)

    def forward(self, params, x, context):
        s = self._split
        x1, x2 = x[..., :s], x[..., s:]
        mean, log_scale = apply_dense_nn(params["hypernet"], x1, context, self.param_dims)
        log_scale = self._clamp(log_scale)
        y = jnp.concatenate([x1, mean + jnp.exp(log_scale) * x2], axis=-1)
        return y, jnp.sum(log_scale, axis=-1)

    def inverse(self, params, y, context):
        s = self._split
        y1, y2 = y[..., :s], y[..., s:]
        mean, log_scale = apply_dense_nn(params["hypernet"], y1, context, self.param_dims)
        log_scale = self._clamp(log_scale)
        x = jnp.concatenate([y1, (y2 - mean) * jnp.exp(-log_scale)], axis=-1)
        return x, jnp.sum(log_scale, axis=-1)


@dataclass(frozen=True)
class ConditionalLinearPLU:
    """Invertible linear layer W = P·L·U with LU predicted from context
    (linearPLU_transform.py:123).  U diagonal constrained positive via
    softplus(β=0.75)."""

    input_dim: int
    context_dim: int
    hidden_dims: Tuple[int, ...]
    permutation: Tuple[int, ...] = ()
    softplus_beta: float = 0.75

    @property
    def param_dims(self) -> Tuple[int, ...]:
        return (self.input_dim * self.input_dim,)

    def init(self, key):
        # pyro DenseNN: context-only net
        return {
            "hypernet": init_dense_nn(
                key, 0, self.context_dim, self.hidden_dims, self.param_dims
            )
        }

    def _lu(self, params, context):
        d = self.input_dim
        raw = apply_dense_nn(params["hypernet"], None, context, self.param_dims)
        lu = raw.reshape(raw.shape[:-1] + (d, d))
        eye = jnp.eye(d, dtype=lu.dtype)
        # torch F.softplus(x, beta) = softplus(beta*x)/beta
        u_diag = (
            jax.nn.softplus(self.softplus_beta * jnp.diagonal(lu, axis1=-2, axis2=-1))
            / self.softplus_beta
        )
        l_mat = jnp.tril(lu, k=-1) + eye
        u_mat = jnp.triu(lu, k=1) + u_diag[..., None, :] * eye
        return l_mat, u_mat, u_diag

    @property
    def _perm_matrix(self):
        import numpy as np

        d = self.input_dim
        perm = self.permutation if self.permutation else tuple(range(d))
        return jnp.asarray(np.eye(d, dtype=np.float32)[np.asarray(perm)])

    def forward(self, params, x, context):
        l_mat, u_mat, u_diag = self._lu(params, context)
        p = self._perm_matrix.astype(x.dtype)
        hi = jax.lax.Precision.HIGHEST
        w = jnp.einsum("ij,...jk,...kl->...il", p, l_mat, u_mat, precision=hi)
        y = jnp.einsum("...ij,...j->...i", w, x, precision=hi)
        log_det = jnp.sum(jnp.log(jnp.abs(u_diag)), axis=-1)
        return y, jnp.broadcast_to(log_det, x.shape[:-1])

    def inverse(self, params, y, context):
        l_mat, u_mat, u_diag = self._lu(params, context)
        p = self._perm_matrix.astype(y.dtype)
        # Solve P L U x = y  →  L U x = Pᵀ y, then two triangular solves.
        rhs = jnp.einsum("ji,...j->...i", p, y, precision=jax.lax.Precision.HIGHEST)[..., None]
        ux = jax.scipy.linalg.solve_triangular(l_mat, rhs, lower=True)
        x = jax.scipy.linalg.solve_triangular(u_mat, ux, lower=False)[..., 0]
        log_det = jnp.sum(jnp.log(jnp.abs(u_diag)), axis=-1)
        return x, jnp.broadcast_to(log_det, y.shape[:-1])


@dataclass(frozen=True)
class LinearPLU:
    """Unconditional invertible linear layer W = P·L·U with learnable packed
    LU (reference: linearPLU_transform.py:87, adapted from pyro's
    GeneralizedChannelPermute).  Initialised from the LU factorisation of a
    random orthogonal matrix."""

    input_dim: int
    permutation: Tuple[int, ...] = ()

    @property
    def _perm_matrix(self):
        import numpy as np

        d = self.input_dim
        perm = self.permutation if self.permutation else tuple(range(d))
        return jnp.asarray(np.eye(d, dtype=np.float32)[np.asarray(perm)])

    def init(self, key):
        import numpy as np
        import scipy.linalg

        d = self.input_dim
        w = np.linalg.qr(
            np.asarray(jax.random.normal(key, (d, d)))
        )[0].astype(np.float32)
        # pack P⁻¹W = LU into one matrix (unit L diag implicit)
        perm = self.permutation if self.permutation else tuple(range(d))
        p = np.eye(d, dtype=np.float32)[np.asarray(perm)]
        _, l_mat, u_mat = scipy.linalg.lu(p.T @ w)
        lu = np.tril(l_mat, -1) + np.triu(u_mat)
        return {"LU": jnp.asarray(lu)}

    def _lu(self, params):
        d = self.input_dim
        lu = params["LU"]
        eye = jnp.eye(d, dtype=lu.dtype)
        u_diag = jnp.diagonal(lu)
        l_mat = jnp.tril(lu, k=-1) + eye
        u_mat = jnp.triu(lu, k=1) + u_diag * eye
        return l_mat, u_mat, u_diag

    def forward(self, params, x, context=None):
        l_mat, u_mat, u_diag = self._lu(params)
        hi = jax.lax.Precision.HIGHEST
        w = jnp.einsum("ij,jk,kl->il", self._perm_matrix, l_mat, u_mat, precision=hi)
        y = jnp.einsum("ij,...j->...i", w, x, precision=hi)
        ld = jnp.sum(jnp.log(jnp.abs(u_diag)))
        return y, jnp.broadcast_to(ld, x.shape[:-1])

    def inverse(self, params, y, context=None):
        l_mat, u_mat, u_diag = self._lu(params)
        rhs = jnp.einsum(
            "ji,...j->...i", self._perm_matrix, y, precision=jax.lax.Precision.HIGHEST
        )
        # single unbatched (D, D) solve against all rhs vectors at once
        flat = rhs.reshape(-1, self.input_dim).T  # (D, N)
        ux = jax.scipy.linalg.solve_triangular(l_mat, flat, lower=True)
        x = jax.scipy.linalg.solve_triangular(u_mat, ux, lower=False)
        x = x.T.reshape(y.shape)
        ld = jnp.sum(jnp.log(jnp.abs(u_diag)))
        return x, jnp.broadcast_to(ld, y.shape[:-1])


@dataclass(frozen=True)
class ScaledRadialTanh:
    """Radial compactification y = (x/‖x‖)·R·tanh(‖x‖/R); maps R³ onto the
    open ball of radius R (scaled_radial_tanh_transform.py:5).

    log|dy/dx| = 2(log‖y‖ − log‖x‖) + log1p(−(‖y‖/R)²).
    """

    radius: float

    def init(self, key):
        return {}

    def forward(self, params, x, context=None):
        r = self.radius
        norm_sq = jnp.sum(x * x, axis=-1, keepdims=True)
        small = norm_sq < 1e-14
        norm = jnp.sqrt(jnp.where(small, jnp.ones_like(norm_sq), norm_sq))
        scale = jnp.where(small, jnp.ones_like(norm), jnp.tanh(norm / r) * r / norm)
        y = x * scale
        ratio_sq = jnp.clip(jnp.sum(y * y, axis=-1) / (r * r), 0.0, 1.0 - 1e-7)
        ld = jnp.where(
            small[..., 0],
            jnp.zeros(x.shape[:-1], x.dtype),
            2.0 * jnp.log(jnp.maximum(scale[..., 0], 1e-30)) + jnp.log1p(-ratio_sq),
        )
        return y, ld

    def inverse(self, params, y, context=None):
        r = self.radius
        norm_sq = jnp.sum(y * y, axis=-1, keepdims=True)
        small = norm_sq < 1e-14
        norm = jnp.sqrt(jnp.where(small, jnp.ones_like(norm_sq), norm_sq))
        # atanh blows up at ‖y‖→R: clamp strictly inside the ball.
        ratio = jnp.clip(norm / r, 0.0, 1.0 - 1e-6)
        scale = jnp.where(small, jnp.ones_like(norm), jnp.arctanh(ratio) * r / norm)
        x = y * scale
        ratio_sq = jnp.clip(ratio[..., 0] ** 2, 0.0, 1.0 - 1e-7)
        ld = jnp.where(
            small[..., 0],
            jnp.zeros(y.shape[:-1], y.dtype),
            -2.0 * jnp.log(jnp.maximum(scale[..., 0], 1e-30)) + jnp.log1p(-ratio_sq),
        )
        return x, ld


@dataclass(frozen=True)
class RadialTanh:
    """Unscaled variant y = (x/‖x‖)·R·tanh(‖x‖) with the corrected log-det
    (radial_tanh_transform.py:65; the reference documents the original ReLie
    log-det as buggy and fixes it — we implement the fixed form)."""

    radius: float

    def init(self, key):
        return {}

    def _log_det(self, scale, tanh_sq, r):
        # log|det dy/dx| = log g'(‖x‖) + 2 log(g(‖x‖)/‖x‖)
        #                = log R + log(1-tanh²) + 2 log(scale)
        # with scale = g(‖x‖)/‖x‖ → R as ‖x‖→0, so the limit is 3 log R.
        return (
            math.log(r)
            + jnp.log1p(-tanh_sq)
            + 2.0 * jnp.log(jnp.maximum(scale, 1e-30))
        )

    def forward(self, params, x, context=None):
        r = self.radius
        norm_sq = jnp.sum(x * x, axis=-1, keepdims=True)
        small = norm_sq < 1e-16
        norm = jnp.sqrt(jnp.where(small, jnp.ones_like(norm_sq), norm_sq))
        scale = jnp.where(small, jnp.full_like(norm, r), jnp.tanh(norm) * r / norm)
        y = x * scale
        tanh_sq = jnp.clip(jnp.sum(y * y, axis=-1) / (r * r), 0.0, 1.0 - 1e-7)
        return y, self._log_det(scale[..., 0], tanh_sq, r)

    def inverse(self, params, y, context=None):
        r = self.radius
        norm_sq = jnp.sum(y * y, axis=-1, keepdims=True)
        small = norm_sq < 1e-16
        norm = jnp.sqrt(jnp.where(small, jnp.ones_like(norm_sq), norm_sq))
        ratio = jnp.clip(norm / r, 0.0, 1.0 - 1e-6)
        inv_scale = jnp.where(small, jnp.full_like(norm, 1.0 / r), jnp.arctanh(ratio) / norm)
        x = y * inv_scale
        tanh_sq = jnp.clip(ratio[..., 0] ** 2, 0.0, 1.0 - 1e-7)
        fwd_scale = jnp.where(
            small[..., 0], jnp.full(y.shape[:-1], r, y.dtype), 1.0 / inv_scale[..., 0]
        )
        return x, self._log_det(fwd_scale, tanh_sq, r)
