"""Unit tests for SO(3) Lie ops against scipy.spatial.transform oracles.

Covers the test strategy gap called out in SURVEY.md §4: exp/log roundtrip
including θ≈π, xset correctness, log|det J| vs finite differences.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.ops import (
    so3_exp,
    so3_hat,
    so3_log,
    so3_log_abs_det_jacobian,
    so3_vee,
    so3_xset,
)


def random_rotvecs(rng, n, max_angle=math.pi):
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


def test_hat_vee_roundtrip(rng):
    v = rng.normal(size=(17, 3)).astype(np.float32)
    m = so3_hat(jnp.asarray(v))
    assert np.allclose(np.swapaxes(np.asarray(m), -1, -2), -np.asarray(m))
    v2 = so3_vee(m)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-7)


def test_exp_matches_scipy(rng):
    v = random_rotvecs(rng, 64)
    got = np.asarray(so3_exp(jnp.asarray(v)))
    want = R.from_rotvec(v.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_exp_small_angles(rng):
    v = rng.normal(size=(32, 3)).astype(np.float32) * 1e-6
    got = np.asarray(so3_exp(jnp.asarray(v)))
    want = R.from_rotvec(v.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # exactly zero
    got0 = np.asarray(so3_exp(jnp.zeros((1, 3), jnp.float32)))
    np.testing.assert_allclose(got0[0], np.eye(3), atol=0)


def test_log_matches_scipy(rng):
    v = random_rotvecs(rng, 64, max_angle=math.pi - 0.2)
    rot = R.from_rotvec(v.astype(np.float64)).as_matrix().astype(np.float32)
    got = np.asarray(so3_log(jnp.asarray(rot)))
    np.testing.assert_allclose(got, v, atol=5e-5)


@pytest.mark.parametrize("angle", [math.pi - 0.05, math.pi - 1e-3, math.pi])
def test_log_near_pi_roundtrip(rng, angle):
    """Near θ=π the rotvec sign is ambiguous at exactly π; verify via
    exp(log(R)) == R instead of matching rotvecs."""
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    v = (axes * angle).astype(np.float32)
    rot = R.from_rotvec(v.astype(np.float64)).as_matrix().astype(np.float32)
    logv = so3_log(jnp.asarray(rot))
    rot2 = np.asarray(so3_exp(logv))
    np.testing.assert_allclose(rot2, rot, atol=5e-4)
    # angle magnitude preserved
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(logv), axis=-1), angle, atol=5e-3
    )


def test_log_identity():
    got = np.asarray(so3_log(jnp.broadcast_to(jnp.eye(3), (4, 3, 3))))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_exp_log_roundtrip_random(rng):
    v = random_rotvecs(rng, 128, max_angle=1.49 * math.pi)
    v2 = np.asarray(so3_log(so3_exp(jnp.asarray(v))))
    # Roundtrip should recover the vector (all norms < pi stay canonical;
    # norms in (pi, 1.5pi) map to the shifted branch)
    norms = np.linalg.norm(v, axis=-1)
    canonical = norms <= math.pi - 0.15
    np.testing.assert_allclose(v2[canonical], v[canonical], atol=2e-4)
    # Non-canonical: log gives vector with norm 2pi - |v|, opposite direction
    nc = ~canonical & (norms < math.pi + 2.0)
    if nc.any():
        expect = -v[nc] / norms[nc, None] * (2 * math.pi - norms[nc, None])
        close_to_canon = np.abs(norms[nc] - math.pi) < 0.15
        np.testing.assert_allclose(
            v2[nc][~close_to_canon], expect[~close_to_canon], atol=2e-3
        )


def test_xset(rng):
    v = random_rotvecs(rng, 8)
    xs = np.asarray(so3_xset(jnp.asarray(v), 1))
    assert xs.shape == (2, 8, 3)
    base = np.asarray(so3_exp(jnp.asarray(v)))
    for k in range(2):
        same = np.asarray(so3_exp(jnp.asarray(xs[k])))
        np.testing.assert_allclose(same, base, atol=1e-5)
    # norms are |v| -/+ 2pi in magnitude
    n = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(np.linalg.norm(xs[0], axis=-1), 2 * math.pi - n, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(xs[1], axis=-1), 2 * math.pi + n, atol=1e-5)


def test_log_abs_det_jacobian_formula(rng):
    v = random_rotvecs(rng, 32, max_angle=3.0)
    got = np.asarray(so3_log_abs_det_jacobian(jnp.asarray(v)))
    theta = np.linalg.norm(v.astype(np.float64), axis=-1)
    want = np.log((2 - 2 * np.cos(theta)) / theta**2)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # θ→0 limit is 0
    got0 = np.asarray(so3_log_abs_det_jacobian(jnp.zeros((1, 3))))
    np.testing.assert_allclose(got0, 0.0, atol=1e-7)


def test_exp_gradients_finite(rng):
    """No NaN gradients anywhere, including θ=0 and θ near π."""
    v = jnp.concatenate(
        [
            jnp.zeros((1, 3), jnp.float32),
            jnp.asarray(random_rotvecs(rng, 8)),
            jnp.asarray(random_rotvecs(rng, 4, max_angle=math.pi) * (math.pi - 1e-4) / math.pi),
        ]
    )
    g = jax.grad(lambda x: jnp.sum(so3_exp(x)))(v)
    assert np.isfinite(np.asarray(g)).all()


def test_log_gradients_finite(rng):
    v = random_rotvecs(rng, 8, max_angle=math.pi - 0.3)
    rot = so3_exp(jnp.asarray(v))
    g = jax.grad(lambda r: jnp.sum(so3_log(r) ** 2))(rot)
    assert np.isfinite(np.asarray(g)).all()


def test_log_abs_det_vs_autodiff(rng):
    """log|det J_exp| must match the autodiff Jacobian determinant of so3_exp
    seen as a map R^3 → R^9 restricted to the tangent space; easier check:
    det of d(exp)/dv via vee-coordinates around each point using finite
    differences of the left-trivialised derivative.  Use the known identity
    |det J| = (2-2cosθ)/θ² and cross-check autodiff full 9x3 Jacobian's
    volume form: sqrt(det(J^T J)) equals it too (exp is an isometry onto its
    image with this normalisation)."""
    v = random_rotvecs(rng, 6, max_angle=2.5)
    jac = jax.vmap(jax.jacfwd(lambda x: so3_exp(x).reshape(9)))(jnp.asarray(v))
    jtj = jnp.einsum("bki,bkj->bij", jac, jac)
    vol = np.sqrt(np.maximum(np.linalg.det(np.asarray(jtj, np.float64)), 0)) / (2**1.5)
    # The embedded volume of d(exp) in R^9 is 2^{3/2} times the Haar density.
    want = np.exp(np.asarray(so3_log_abs_det_jacobian(jnp.asarray(v)), np.float64))
    np.testing.assert_allclose(vol, want, rtol=1e-2)
