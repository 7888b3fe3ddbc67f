"""SO(3) Lie-group operations, TPU-first (float32-safe) implementations.

Capability parity with the reference's `utils/rigid_transform_utils.py`
(so3_hat:142, so3_vee:168, so3_exp:182, so3_log:204, so3_log_pi:240,
so3_xset:282, so3_log_abs_det_jacobian:298), re-derived for TPU:

* The reference forces float64 through exp/log because its f32 formulas
  cancel catastrophically (e.g. ``(1-cos θ)/θ²``).  On TPU f64 is emulated and
  slow, so these implementations use cancellation-free forms
  (``(1-cos θ)/θ² = ½·sinc(θ/2)²``) and dtype-aware Taylor guards that are
  accurate in f32.  An f64 path still works when x64 is enabled (used by the
  CPU oracle tests).
* All ops are pure, shape-polymorphic over leading batch dims, and safe to
  differentiate (double-`where` guards so masked branches contribute no NaN
  gradients).
"""

import math

import jax
import jax.numpy as jnp

# Sign-combination table used by the θ≈π branch of the log map: all 8
# combinations of (±1, ±1, ±1).
_SIGNS = jnp.array(
    [[2 * ((i >> (2 - j)) & 1) - 1 for j in range(3)] for i in range(8)],
    dtype=jnp.float32,
)


def _small_angle_eps(dtype) -> float:
    """Threshold below which Taylor expansions replace trig ratios."""
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-10
    return 1e-4


def _pi_branch_eps(dtype) -> float:
    """Width of the θ≈π window where the main log-map branch is replaced.

    The main branch divides the antisymmetric part (∝ sin θ) by sin θ; its
    relative error grows like (acos error)/(π−θ), so the window is wider in
    f32 than the reference's f64 1e-2 window.
    """
    if jnp.dtype(dtype) == jnp.float64:
        return 1e-2
    return 1e-1


def sinc(theta: jax.Array) -> jax.Array:
    """sin(θ)/θ with a Taylor guard at θ≈0 (unnormalised sinc)."""
    eps = _small_angle_eps(theta.dtype)
    small = jnp.abs(theta) < eps
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    return jnp.where(small, 1.0 - theta * theta / 6.0, jnp.sin(safe) / safe)


def _sinc_from_sq(theta_sq: jax.Array) -> jax.Array:
    """sin(√t)/√t as a function of t=θ².  Gradient-safe at t=0 because the
    Taylor branch is polynomial in t (d‖v‖/dv is NaN at v=0; dθ²/dv is not)."""
    eps = _small_angle_eps(theta_sq.dtype)
    small = theta_sq < eps * eps
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(theta_sq), theta_sq))
    return jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe) / safe)


def so3_hat(v: jax.Array) -> jax.Array:
    """R³ → so(3): 3-vectors to skew-symmetric matrices (inverse of so3_vee)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def so3_vee(m: jax.Array) -> jax.Array:
    """so(3) → R³: skew-symmetric matrices to 3-vectors (inverse of so3_hat)."""
    return jnp.stack([-m[..., 1, 2], m[..., 0, 2], -m[..., 0, 1]], axis=-1)


def batch_trace(m: jax.Array) -> jax.Array:
    return jnp.trace(m, axis1=-2, axis2=-1)


def so3_exp(v: jax.Array) -> jax.Array:
    """Exponential map so(3) → SO(3) via the Rodrigues formula.

    Cancellation-free in f32:  α = sinc(θ),  β = ½·sinc(θ/2)².
    """
    theta_sq = jnp.sum(v * v, axis=-1)
    alpha = _sinc_from_sq(theta_sq)
    half_sinc = _sinc_from_sq(theta_sq * 0.25)
    beta = 0.5 * half_sinc * half_sinc
    k = so3_hat(v)
    # 3x3 products are negligible FLOPs but accuracy-critical: force f32
    # accumulation rather than the TPU default bf16 matmul passes.
    k2 = jnp.matmul(k, k, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.eye(3, dtype=v.dtype)
    return eye + alpha[..., None, None] * k + beta[..., None, None] * k2


def _so3_log_pi(r: jax.Array, theta: jax.Array) -> jax.Array:
    """θ≈π branch of the log map (axis recovered up to sign, then sign search).

    Mirrors the reference's candidate-set strategy (rigid_transform_utils.py:240):
    axis magnitudes from the symmetric part, then an argmin over the 8 sign
    combinations of ‖R − exp(x)‖².  Selection is non-differentiable
    (stop_gradient), matching the reference's no_grad selection.
    """
    dtype = r.dtype
    sym = 0.5 * (r + jnp.swapaxes(r, -1, -2))
    eye = jnp.eye(3, dtype=dtype)
    # z = θ²/(1-cos θ) (sym - I); 1-cos θ ≈ 2 near π, no cancellation issue.
    denom = jnp.maximum(1.0 - jnp.cos(theta), 1e-6)
    z = (theta * theta / denom)[..., None, None] * (sym - eye)

    q = jnp.stack([z[..., 0, 0], z[..., 1, 1], z[..., 2, 2]], axis=-1)
    # |x_i| = sqrt((q_i - q_j - q_k)/2); clamp guards tiny negatives.
    mix = jnp.stack(
        [
            q[..., 0] - q[..., 1] - q[..., 2],
            -q[..., 0] + q[..., 1] - q[..., 2],
            -q[..., 0] - q[..., 1] + q[..., 2],
        ],
        axis=-1,
    )
    x_abs = jnp.sqrt(jnp.maximum(mix, 1e-8) * 0.5)

    signs = _SIGNS.astype(dtype)  # (8, 3)
    # (..., 8, 3) candidates
    cands = signs * x_abs[..., None, :]
    r_cands = so3_exp(cands)  # (..., 8, 3, 3)
    diff = jnp.sum((r[..., None, :, :] - r_cands) ** 2, axis=(-1, -2))  # (..., 8)
    sel = jax.lax.stop_gradient(jnp.argmin(diff, axis=-1))
    return jnp.take_along_axis(cands, sel[..., None, None], axis=-2).squeeze(-2)


def so3_log(r: jax.Array) -> jax.Array:
    """Logarithm map SO(3) → so(3), returned as axis-angle 3-vectors.

    Main branch: (θ/sin θ)·vee(antisym(R)); Taylor guard at θ≈0 and a
    candidate-search branch at θ≈π (reference: rigid_transform_utils.py:204).
    """
    dtype = r.dtype
    anti = 0.5 * (r - jnp.swapaxes(r, -1, -2))
    # arccos has infinite gradient at ±1 (θ=0/π are reachable, e.g. exact 180°
    # flips in synthetic training data).  Straight-through: forward value uses
    # the exact clip to [-1,1]; the gradient flows through a strictly interior
    # clip, keeping it finite without biasing θ.
    tiny = 1e-7 if jnp.dtype(dtype) == jnp.float64 else 1e-6
    c = 0.5 * (batch_trace(r) - 1.0)
    theta_val = jnp.arccos(jnp.clip(c, -1.0, 1.0))
    theta_grad = jnp.arccos(jnp.clip(c, -1.0 + tiny, 1.0 - tiny))
    theta = theta_grad + jax.lax.stop_gradient(theta_val - theta_grad)

    near_pi = (math.pi - theta) < _pi_branch_eps(dtype)
    # Safe ratio θ/sinθ: guard both θ≈0 (Taylor) and θ≈π (branch replaced).
    eps0 = _small_angle_eps(dtype)
    small = theta < eps0
    sin_theta = jnp.sin(theta)
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_theta), sin_theta)
    ratio = jnp.where(small, 1.0 + theta * theta / 6.0, theta / safe_sin)
    main = ratio[..., None] * so3_vee(anti)

    pi_branch = _so3_log_pi(r, theta)
    return jnp.where(near_pi[..., None], pi_branch, main)


def so3_xset(x: jax.Array, k_max: int = 1) -> jax.Array:
    """Set of algebra elements with the same image under exp, excluding x.

    Returns shape (2·k_max, ..., 3): x/‖x‖·(‖x‖ + 2πk) for
    k ∈ {-k_max..-1, 1..k_max} (reference: rigid_transform_utils.py:282).
    A zero-norm x is shifted along a fixed axis to stay well-defined.
    """
    dtype = x.dtype
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    tiny = norm < 1e-12
    safe_norm = jnp.where(tiny, jnp.ones_like(norm), norm)
    unit = jnp.where(tiny, jnp.array([1.0, 0.0, 0.0], dtype=dtype), x / safe_norm)
    ks = jnp.concatenate(
        [-jnp.arange(1, k_max + 1, dtype=dtype), jnp.arange(1, k_max + 1, dtype=dtype)]
    )
    ks = ks.reshape((2 * k_max,) + (1,) * x.ndim)
    norm0 = jnp.where(tiny, jnp.zeros_like(norm), norm)
    return unit[None] * (norm0[None] + 2.0 * math.pi * ks)


def so3_log_abs_det_jacobian(x: jax.Array) -> jax.Array:
    """log|det J| of the exp map at x: log((2-2cos‖x‖)/‖x‖²) = log(sinc(‖x‖/2)²).

    Cancellation-free: (2-2cos θ)/θ² = sinc(θ/2)².
    (reference: rigid_transform_utils.py:298)
    """
    theta_sq = jnp.sum(x * x, axis=-1)
    s = _sinc_from_sq(theta_sq * 0.25)
    return 2.0 * jnp.log(jnp.maximum(jnp.abs(s), 1e-30))
