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


def test_flow_batch_norm_stats_update():
    """Running statistics EMA-update from training batches (pyro BatchNorm
    training semantics) — repeated updates converge the stats to the data
    distribution, including with a stacked leading part axis."""
    t = FlowBatchNorm(input_dim=3, momentum=0.5)
    params = t.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(loc=2.0, scale=3.0, size=(512, 3)), jnp.float32)
    for _ in range(20):
        params, normed = t.update_stats(params, data)
    np.testing.assert_allclose(np.asarray(params["moving_mean"]), data.mean(0), atol=1e-4)
    # pyro updates with torch's UNBIASED batch variance (y.var(0))
    np.testing.assert_allclose(
        np.asarray(params["moving_var"]),
        np.var(np.asarray(data), axis=0, ddof=1), atol=1e-4,
    )
    # the returned chain value is the batch-normalised input (+β scaled γ)
    assert normed.shape == data.shape
    np.testing.assert_allclose(np.asarray(normed.mean(0)), 0.0, atol=1e-5)

    # stacked (P, D) stats with (B, P, D) inputs reduce over batch only
    stacked = {k: jnp.stack([v, v]) for k, v in t.init(jax.random.PRNGKey(1)).items()}
    y = jnp.asarray(rng.normal(size=(64, 2, 3)), jnp.float32)
    out, _ = t.update_stats(stacked, y)
    assert out["moving_mean"].shape == (2, 3)
    np.testing.assert_allclose(
        np.asarray(out["moving_mean"]), 0.5 * np.asarray(y.mean(0)), atol=1e-6
    )


def test_flow_update_batchnorm_stats_end_to_end():
    """ConditionalFlow.update_batchnorm_stats touches every BN layer and
    leaves a BN-free flow's params untouched."""
    from humaniflow_tpu.flows import create_conditional_norm_flow

    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=CTX, num_transforms=2,
        transform_type="additive_coupling", transform_hidden_dims=(16,),
        permute_type="permute", batch_norm=True,
        radial_tanh_radius=4.0, base_dist_std=0.6,
    )
    assert flow.has_batch_norm
    params = flow.init(jax.random.PRNGKey(2))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (32, CTX))
    y = flow.sample(params, jax.random.PRNGKey(4), ctx)
    new = flow.update_batchnorm_stats(params, y, ctx)
    changed = 0
    for i, t_ in enumerate(flow.transforms):
        if isinstance(t_, FlowBatchNorm):
            old_p = params[f"transform_{i}"]
            new_p = new[f"transform_{i}"]
            assert not np.allclose(new_p["moving_mean"], old_p["moving_mean"])
            changed += 1
    assert changed == 2  # one BN per block
    # log_prob still finite with updated stats
    lp = flow.log_prob(new, y, ctx)
    assert np.isfinite(np.asarray(lp)).all()

    no_bn = create_conditional_norm_flow(
        event_dim=3, context_dim=CTX, num_transforms=1,
        transform_type="additive_coupling", transform_hidden_dims=(16,),
        permute_type="permute", radial_tanh_radius=4.0, base_dist_std=0.6,
    )
    p2 = no_bn.init(jax.random.PRNGKey(5))
    assert no_bn.update_batchnorm_stats(p2, y, ctx) is p2


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
