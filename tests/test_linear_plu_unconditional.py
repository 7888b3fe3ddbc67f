"""Unconditional LinearPLU + factory wiring tests."""

import jax
import jax.numpy as jnp
import numpy as np

from humaniflow_tpu.flows import LinearPLU, create_conditional_norm_flow


def test_linear_plu_roundtrip_and_logdet():
    t = LinearPLU(input_dim=3, permutation=(1, 2, 0))
    params = t.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    y, ld = t.forward(params, x, None)
    x2, ld2 = t.inverse(params, y, None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld2), np.asarray(ld), atol=1e-6)

    def fwd_single(xi):
        return t.forward(params, xi[None], None)[0][0]

    jac = jax.vmap(jax.jacfwd(fwd_single))(x)
    _, logdet = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(logdet), atol=1e-5)


def test_orthogonal_init_near_volume_preserving():
    t = LinearPLU(input_dim=3)
    params = t.init(jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    _, ld = t.forward(params, x, None)
    # LU of an orthogonal matrix → |det| = 1 → log-det ≈ 0
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-4)


def test_factory_linear_plu_option():
    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=16, num_transforms=2,
        transform_type="additive_coupling", transform_hidden_dims=(20,),
        permute_type="linear_plu", radial_tanh_radius=4.0, base_dist_std=0.6,
    )
    params = flow.init(jax.random.PRNGKey(4))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (4, 16))
    s = flow.sample(params, jax.random.PRNGKey(6), ctx, (7,))
    lp = flow.log_prob(params, s.reshape(-1, 3), jnp.tile(ctx, (7, 1)))
    assert np.isfinite(np.asarray(lp)).all()
