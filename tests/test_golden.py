"""Golden-value regression tests (SURVEY.md §4: the reference has no tests;
its 'frozen regression notes' live in comments).  These freeze the v0.1
numerical behaviour of the spline, the default flow, and the model heads /
teacher-forced log-likelihood for fixed PRNG seeds — any refactor of the
flow numerics that silently changes densities fails here."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_v01.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_spline_golden(golden):
    from humaniflow_tpu.flows import monotonic_rational_spline

    key = jax.random.PRNGKey(100)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    w = jax.random.normal(k1, (8, 2, 8))
    h = jax.random.normal(k2, (8, 2, 8))
    d = jax.random.normal(k3, (8, 2, 7))
    l = jax.random.normal(k4, (8, 2, 8))
    x = jax.random.uniform(k5, (8, 2), minval=-4, maxval=4)
    np.testing.assert_allclose(np.asarray(x), golden["spline_in"], atol=1e-7)
    y, ld = monotonic_rational_spline(x, w, h, d, l, bound=4.0)
    np.testing.assert_allclose(np.asarray(y), golden["spline_y"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), golden["spline_ld"], atol=1e-4)


def test_flow_golden(golden):
    from humaniflow_tpu.flows import create_conditional_norm_flow

    flow = create_conditional_norm_flow(
        event_dim=3, context_dim=64, num_transforms=2,
        transform_type="spline_coupling", transform_hidden_dims=(64, 32, 32),
        permute_type="permute", radial_tanh_radius=1.5 * math.pi,
        base_dist_std=0.6, count_bins=8, bound=1.5 * math.pi,
    )
    fp = flow.init(jax.random.PRNGKey(101))
    ctx = jax.random.normal(jax.random.PRNGKey(102), (4, 64))
    z = jax.random.normal(jax.random.PRNGKey(103), (4, 3)) * 0.6
    y = flow.forward(fp, z, ctx)
    lp = flow.log_prob(fp, y, ctx)
    np.testing.assert_allclose(np.asarray(y), golden["flow_y"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp), golden["flow_lp"], atol=1e-4)


def test_model_golden(golden):
    from humaniflow_tpu.configs.defaults import ModelConfig
    from humaniflow_tpu.models import HumaniflowModel

    model = HumaniflowModel(ModelConfig())
    params = model.init(jax.random.PRNGKey(104), input_shape=(1, 32, 32, 18))
    proxy = jax.random.normal(jax.random.PRNGKey(105), (2, 32, 32, 18))
    out = model.apply(params, proxy)
    np.testing.assert_allclose(np.asarray(out["cam_wp"]), golden["model_cam"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["glob_rotmat"]), golden["model_glob"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["shape_mode"]), golden["model_shape"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out["pose_rotmats_point_est"]), golden["model_pose_pe"], atol=1e-4
    )

    tp = jnp.asarray(
        R.random(2 * 23, random_state=7).as_matrix().reshape(2, 23, 3, 3).astype(np.float32)
    )
    tg = jnp.asarray(R.random(2, random_state=8).as_matrix().astype(np.float32))
    ts = jax.random.normal(jax.random.PRNGKey(106), (2, 10))
    out2 = model.apply(
        params, proxy, compute_point_est=False, compute_for_loglik=True,
        shape_for_loglik=ts, pose_R_for_loglik=tp, glob_R_for_loglik=tg,
    )
    lp = model.pose_log_prob(params, tp, out2["pose_flow_contexts_for_loglik"])
    np.testing.assert_allclose(np.asarray(lp), golden["model_pose_lp"], atol=1e-3)
