"""Flow library tests: invertibility, log-det correctness vs autodiff, and
SO(3) pushforward density normalisation (SURVEY.md §4 test pyramid)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.flows import (
    ConditionalAdditiveCoupling,
    ConditionalAffineCoupling,
    ConditionalLinearPLU,
    ConditionalSplineCoupling,
    Permute,
    ScaledRadialTanh,
    SO3FlowDistribution,
    create_conditional_norm_flow,
    monotonic_rational_spline,
)

CTX_DIM = 16
EVENT_DIM = 3


def _rand_spline_params(key, shape, k=8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return (
        jax.random.normal(k1, shape + (k,)),
        jax.random.normal(k2, shape + (k,)),
        jax.random.normal(k3, shape + (k - 1,)),
        jax.random.normal(k4, shape + (k,)),
    )


class TestSpline:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        w, h, d, l = _rand_spline_params(key, (64, 2))
        x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=-4.5, maxval=4.5)
        y, ld_f = monotonic_rational_spline(x, w, h, d, l, bound=4.0)
        x2, ld_i = monotonic_rational_spline(y, w, h, d, l, inverse=True, bound=4.0)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3)
        np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-3)

    def test_identity_outside_bound(self):
        key = jax.random.PRNGKey(2)
        w, h, d, l = _rand_spline_params(key, (8, 1))
        x = jnp.linspace(3.1, 10.0, 8)[:, None]
        y, ld = monotonic_rational_spline(x, w, h, d, l, bound=3.0)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)
        np.testing.assert_allclose(np.asarray(ld), 0.0, atol=0)

    def test_logdet_vs_autodiff(self):
        key = jax.random.PRNGKey(3)
        w, h, d, l = _rand_spline_params(key, (32, 1))
        x = jax.random.uniform(jax.random.PRNGKey(4), (32, 1), minval=-2.9, maxval=2.9)

        def f_scalar(xi, wi, hi, di, li):
            y, _ = monotonic_rational_spline(
                xi[None, None], wi[None, None], hi[None, None], di[None, None], li[None, None]
            )
            return y[0, 0]

        grads = jax.vmap(jax.grad(f_scalar))(x[:, 0], w[:, 0], h[:, 0], d[:, 0], l[:, 0])
        _, ld = monotonic_rational_spline(x, w, h, d, l)
        np.testing.assert_allclose(np.asarray(ld[:, 0]), np.log(np.abs(np.asarray(grads))), atol=2e-4)

    def test_monotonic(self):
        key = jax.random.PRNGKey(5)
        w, h, d, l = _rand_spline_params(key, (1, 1))
        xs = jnp.linspace(-3.0, 3.0, 201)[:, None]
        wb = jnp.broadcast_to(w, (201, 1, 8))
        hb = jnp.broadcast_to(h, (201, 1, 8))
        db = jnp.broadcast_to(d, (201, 1, 7))
        lb = jnp.broadcast_to(l, (201, 1, 8))
        ys, _ = monotonic_rational_spline(xs, wb, hb, db, lb)
        assert (np.diff(np.asarray(ys[:, 0])) > 0).all()

    def test_near_identity_init(self):
        """Zero params → uniform bins with knots on the diagonal; interior
        derivatives are softplus(0)+ε ≈ 0.69 (as in pyro), so the zero-init
        map wiggles around — but stays near — the identity."""
        z = jnp.zeros((16, 1, 8))
        d = jnp.zeros((16, 1, 7))
        x = jnp.linspace(-2.5, 2.5, 16)[:, None]
        y, ld = monotonic_rational_spline(x, z, z, d, z)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0.15)
        # knots themselves are exactly on the diagonal
        knots = jnp.asarray([[-3.0, -2.25, -1.5, -0.75, 0.0]]).T
        yk, _ = monotonic_rational_spline(knots, jnp.zeros((5, 1, 8)),
                                          jnp.zeros((5, 1, 8)), jnp.zeros((5, 1, 7)),
                                          jnp.zeros((5, 1, 8)))
        np.testing.assert_allclose(np.asarray(yk), np.asarray(knots), atol=1e-5)


def _check_transform(t, key, batch=16, ctx_dim=CTX_DIM, atol=5e-4):
    """Roundtrip + autodiff log-det for a transform spec."""
    kp, kx, kc = jax.random.split(key, 3)
    params = t.init(kp)
    x = jax.random.normal(kx, (batch, EVENT_DIM))
    ctx = jax.random.normal(kc, (batch, ctx_dim))
    y, ld = t.forward(params, x, ctx)
    x2, ld2 = t.inverse(params, y, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld), atol=atol)

    # autodiff full Jacobian log-det
    def fwd_single(xi, ci):
        yi, _ = t.forward(params, xi[None], ci[None])
        return yi[0]

    jac = jax.vmap(jax.jacfwd(fwd_single))(x, ctx)
    _, logdet = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(logdet), atol=5e-4)


class TestTransforms:
    def test_permute(self):
        _check_transform(Permute((1, 2, 0)), jax.random.PRNGKey(0))

    def test_spline_coupling(self):
        t = ConditionalSplineCoupling(
            input_dim=3, context_dim=CTX_DIM, hidden_dims=(64, 32, 32),
            count_bins=8, bound=1.5 * math.pi,
        )
        _check_transform(t, jax.random.PRNGKey(1))

    def test_additive_coupling(self):
        t = ConditionalAdditiveCoupling(
            input_dim=3, context_dim=CTX_DIM, hidden_dims=(30,)
        )
        _check_transform(t, jax.random.PRNGKey(2))

    def test_affine_coupling(self):
        t = ConditionalAffineCoupling(
            input_dim=3, context_dim=CTX_DIM, hidden_dims=(30, 30)
        )
        _check_transform(t, jax.random.PRNGKey(3))

    def test_linear_plu(self):
        t = ConditionalLinearPLU(
            input_dim=3, context_dim=CTX_DIM, hidden_dims=(30, 30),
            permutation=(1, 2, 0),
        )
        _check_transform(t, jax.random.PRNGKey(4))

    def test_radial_tanh(self):
        t = ScaledRadialTanh(radius=1.5 * math.pi)
        _check_transform(t, jax.random.PRNGKey(5))

    def test_radial_tanh_maps_into_ball(self):
        t = ScaledRadialTanh(radius=2.0)
        x = jax.random.normal(jax.random.PRNGKey(6), (128, 3)) * 10.0
        y, _ = t.forward({}, x, None)
        # tanh saturates to 1.0 exactly in f32 → norms can hit the radius
        assert (np.linalg.norm(np.asarray(y), axis=-1) <= 2.0 + 1e-6).all()


class TestConditionalFlow:
    def _flow(self):
        return create_conditional_norm_flow(
            event_dim=3,
            context_dim=CTX_DIM,
            num_transforms=2,
            transform_type="spline_coupling",
            transform_hidden_dims=(64, 32, 32),
            permute_type="permute",
            radial_tanh_radius=1.5 * math.pi,
            base_dist_std=0.6,
            count_bins=8,
            bound=1.5 * math.pi,
        )

    def test_structure(self):
        flow = self._flow()
        # permute, spline, permute, spline, radial tanh
        assert len(flow.transforms) == 5
        assert isinstance(flow.transforms[0], Permute)
        assert flow.transforms[0].permutation == (0, 1, 2)
        assert flow.transforms[2].permutation == (1, 2, 0)
        assert isinstance(flow.transforms[4], ScaledRadialTanh)

    def test_log_prob_matches_autodiff_density(self):
        """Strongest flow self-check: for y = f(z), log p(y) must equal
        log N(z;0,σ²) − log|det J_f(z)| with J from autodiff."""
        flow = self._flow()
        params = flow.init(jax.random.PRNGKey(0))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (8, CTX_DIM))
        z = jax.random.normal(jax.random.PRNGKey(2), (8, 3)) * 0.6

        def fwd(zi, ci):
            return flow.forward(params, zi[None], ci[None])[0]

        y = jax.vmap(fwd)(z, ctx)
        jac = jax.vmap(jax.jacfwd(fwd))(z, ctx)
        _, logdet = jnp.linalg.slogdet(jac)
        var = 0.6**2
        base_lp = jnp.sum(-0.5 * z * z / var - 0.5 * np.log(2 * np.pi * var), axis=-1)
        want = base_lp - logdet

        got = flow.log_prob(params, y, ctx)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_sample_in_support(self):
        flow = self._flow()
        params = flow.init(jax.random.PRNGKey(3))
        ctx = jax.random.normal(jax.random.PRNGKey(4), (4, CTX_DIM))
        s = flow.sample(params, jax.random.PRNGKey(5), ctx, (100,))
        assert s.shape == (100, 4, 3)
        assert (np.linalg.norm(np.asarray(s), axis=-1) < 1.5 * math.pi).all()

    def test_mode_finite(self):
        flow = self._flow()
        params = flow.init(jax.random.PRNGKey(6))
        ctx = jax.random.normal(jax.random.PRNGKey(7), (4, CTX_DIM))
        m = flow.mode_estimate(params, ctx)
        assert np.isfinite(np.asarray(m)).all()


class TestSO3Flow:
    def _dist(self):
        flow = create_conditional_norm_flow(
            event_dim=3,
            context_dim=CTX_DIM,
            num_transforms=2,
            transform_type="spline_coupling",
            transform_hidden_dims=(64, 32, 32),
            permute_type="permute",
            radial_tanh_radius=1.5 * math.pi,
            base_dist_std=0.6,
            bound=1.5 * math.pi,
        )
        return SO3FlowDistribution(flow=flow, support_radius=1.5 * math.pi)

    def test_sample_shapes_and_validity(self):
        dist = self._dist()
        params = dist.init(jax.random.PRNGKey(0))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (4, CTX_DIM))
        r = dist.sample(params, jax.random.PRNGKey(2), ctx, (7,))
        assert r.shape == (7, 4, 3, 3)
        rr = np.asarray(r)
        eye = np.einsum("...ij,...kj->...ik", rr, rr)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(rr), 1.0, atol=1e-5)

    def test_log_prob_finite_and_gradable(self):
        dist = self._dist()
        params = dist.init(jax.random.PRNGKey(3))
        ctx = jax.random.normal(jax.random.PRNGKey(4), (8, CTX_DIM))
        r = dist.sample(params, jax.random.PRNGKey(5), ctx)
        lp = dist.log_prob(params, r, ctx)
        assert np.isfinite(np.asarray(lp)).all()

        g = jax.grad(lambda p: jnp.sum(dist.log_prob(p, r, ctx)))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)

    def test_density_normalises_over_so3(self):
        """∫ p(R) dμ_Haar = 1: MC with uniform SO(3) samples; the Haar volume
        with the exp-pushforward normalisation is 8π²."""
        from scipy.spatial.transform import Rotation as R

        dist = self._dist()
        params = dist.init(jax.random.PRNGKey(6))
        ctx = jax.random.normal(jax.random.PRNGKey(7), (1, CTX_DIM))

        n = 20000
        rots = R.random(n, random_state=0).as_matrix().astype(np.float32)
        lp = jax.jit(lambda r: dist.log_prob(params, r, jnp.broadcast_to(ctx, (n, CTX_DIM))))(
            jnp.asarray(rots)
        )
        p = np.exp(np.asarray(lp, np.float64))
        integral = p.mean() * 8 * math.pi**2
        assert abs(integral - 1.0) < 0.15, integral

    def test_log_prob_teacher_forced_shapes(self):
        dist = self._dist()
        params = dist.init(jax.random.PRNGKey(8))
        ctx = jax.random.normal(jax.random.PRNGKey(9), (5, CTX_DIM))
        from scipy.spatial.transform import Rotation as R

        rots = jnp.asarray(R.random(5, random_state=1).as_matrix().astype(np.float32))
        lp = dist.log_prob(params, rots, ctx)
        assert lp.shape == (5,)
