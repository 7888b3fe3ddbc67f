"""Autoregressive flow transforms: causality, invertibility, autodiff
log-dets, and full-flow density self-consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.flows import (
    ConditionalAffineAutoregressive,
    ConditionalSplineAutoregressive,
    FlowBatchNorm,
    create_conditional_norm_flow,
)

CTX = 16


def _roundtrip_and_autodiff(t, key, atol=5e-4):
    kp, kx, kc = jax.random.split(key, 3)
    params = t.init(kp)
    x = jax.random.normal(kx, (8, 3))
    ctx = jax.random.normal(kc, (8, CTX))
    y, ld = t.forward(params, x, ctx)
    x2, ld2 = t.inverse(params, y, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld), atol=atol)

    def fwd_single(xi, ci):
        return t.forward(params, xi[None], ci[None])[0][0]

    jac = jax.vmap(jax.jacfwd(fwd_single))(x, ctx)
    _, logdet = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(logdet), atol=1e-3)
    return params, x, ctx, jac


def test_affine_autoregressive():
    t = ConditionalAffineAutoregressive(input_dim=3, context_dim=CTX, hidden_dims=(32, 32))
    params, x, ctx, jac = _roundtrip_and_autodiff(t, jax.random.PRNGKey(0))
    # causality in the density direction: dx_d/dy_e = 0 for e > d ⇒ the
    # forward jacobian dy/dx is lower triangular
    upper = np.triu(np.asarray(jac), k=1)
    np.testing.assert_allclose(upper, 0.0, atol=1e-6)


def test_spline_autoregressive():
    t = ConditionalSplineAutoregressive(
        input_dim=3, context_dim=CTX, hidden_dims=(32,), count_bins=4
    )
    params, x, ctx, jac = _roundtrip_and_autodiff(t, jax.random.PRNGKey(1), atol=1e-3)
    upper = np.triu(np.asarray(jac), k=1)
    np.testing.assert_allclose(upper, 0.0, atol=1e-5)


def test_flow_batch_norm():
    t = FlowBatchNorm(input_dim=3)
    params = t.init(jax.random.PRNGKey(2))
    params["log_gamma"] = jnp.asarray([0.3, -0.2, 0.1])
    params["beta"] = jnp.asarray([1.0, 0.0, -1.0])
    params["moving_mean"] = jnp.asarray([0.5, -0.5, 0.0])
    params["moving_var"] = jnp.asarray([2.0, 1.0, 0.5])
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 3))
    y, ld = t.forward(params, x, None)
    x2, ld2 = t.inverse(params, y, None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld), atol=1e-6)


@pytest.mark.parametrize("ttype", ["affine_masked", "spline_masked"])
def test_factory_masked_variants_density(ttype):
    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=CTX, num_transforms=2, transform_type=ttype,
        transform_hidden_dims=(32,), permute_type="permute",
        radial_tanh_radius=4.0, base_dist_std=0.6, count_bins=4, bound=4.0,
    )
    params = flow.init(jax.random.PRNGKey(4))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (4, CTX))
    z = jax.random.normal(jax.random.PRNGKey(6), (4, 3)) * 0.6

    def fwd(zi, ci):
        return flow.forward(params, zi[None], ci[None])[0]

    y = jax.vmap(fwd)(z, ctx)
    jac = jax.vmap(jax.jacfwd(fwd))(z, ctx)
    _, logdet = jnp.linalg.slogdet(jac)
    base_lp = jnp.sum(-0.5 * z * z / 0.36 - 0.5 * np.log(2 * np.pi * 0.36), axis=-1)
    got = flow.log_prob(params, y, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base_lp - logdet), atol=2e-3)
