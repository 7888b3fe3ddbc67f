"""HumaniflowModel forward-pass tests: shapes, AR causality, teacher-forced
log-lik path, gradients, and jit-compilability."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.configs.defaults import ModelConfig, NormFlowConfig
from humaniflow_tpu.models import HumaniflowModel, immediate_parent_to_all_ancestors
from humaniflow_tpu.models.smpl import SMPL_PARENTS

IMG = 32  # tiny spatial size for CPU tests


@pytest.fixture(scope="module")
def model():
    return HumaniflowModel(ModelConfig())


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))


def test_ancestors_match_reference_convention():
    anc = immediate_parent_to_all_ancestors(SMPL_PARENTS)
    assert anc[0] == []
    assert anc[3] == [0]
    assert anc[22] == [20, 18, 16, 13, 8, 5, 2]
    assert max(len(a) for a in anc.values()) == 7
    assert len(anc) == 23


def test_levels_partition(model):
    flat = sorted(p for level in model.levels for p in level)
    assert flat == list(range(23))
    assert len(model.levels) == 8
    assert model.levels[0] == (0, 1, 2)


def test_forward_point_estimate(model, params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 18))
    out = model.apply(params, x)
    assert out["cam_wp"].shape == (2, 3)
    assert out["glob_rotmat"].shape == (2, 3, 3)
    assert out["shape_mode"].shape == (2, 10)
    assert out["pose_rotmats_point_est"].shape == (2, 23, 3, 3)
    rr = np.asarray(out["pose_rotmats_point_est"]).reshape(-1, 3, 3)
    eye = np.einsum("bij,bkj->bik", rr, rr)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


def test_forward_samples(model, params):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, IMG, IMG, 18))
    out = model.apply(
        params, x, key=jax.random.PRNGKey(3), num_samples=5, compute_point_est=False
    )
    assert out["pose_rotmats_samples"].shape == (2, 5, 23, 3, 3)
    assert out["shape_samples"].shape == (2, 5, 10)
    # samples differ across the sample axis
    s = np.asarray(out["pose_rotmats_samples"])
    assert np.abs(s[:, 0] - s[:, 1]).max() > 1e-3


def test_shape_mode_for_samples(model, params):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, IMG, IMG, 18))
    out = model.apply(
        params, x, key=jax.random.PRNGKey(5), num_samples=3,
        use_shape_mode_for_samples=True,
    )
    s = np.asarray(out["shape_samples"])
    np.testing.assert_allclose(s[:, 0], s[:, 1], atol=0)
    np.testing.assert_allclose(s[:, 0], np.asarray(out["shape_mode"]), atol=0)


def test_loglik_path_and_log_prob(model, params):
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(6), (b, IMG, IMG, 18))
    target_pose = jnp.asarray(
        R.random(b * 23, random_state=0).as_matrix().reshape(b, 23, 3, 3).astype(np.float32)
    )
    target_glob = jnp.asarray(R.random(b, random_state=1).as_matrix().astype(np.float32))
    target_shape = jax.random.normal(jax.random.PRNGKey(7), (b, 10))
    out = model.apply(
        params, x, compute_point_est=False, compute_for_loglik=True,
        shape_for_loglik=target_shape, pose_R_for_loglik=target_pose,
        glob_R_for_loglik=target_glob,
    )
    ctx = out["pose_flow_contexts_for_loglik"]
    assert ctx.shape == (b, 23, 64)
    lp = model.pose_log_prob(params, target_pose, ctx)
    assert lp.shape == (b, 23)
    assert np.isfinite(np.asarray(lp)).all()


def test_ar_causality(model, params):
    """Changing an ancestor's sampled rotation must change descendants'
    contexts but not ancestors' own draws: verify part-0 rotation is
    independent of deep-chain parts by construction of levels (structural
    test: level 0 contexts have zero ancestor features)."""
    isgc = jax.random.normal(jax.random.PRNGKey(8), (2, model.isgc_dim))
    buf_a = jnp.zeros((2, 23, 3, 3))
    buf_b = buf_a.at[:, 22].set(jnp.eye(3))  # deep part rotation changed
    ctx_a = model._part_contexts(params, (0, 1, 2), isgc, buf_a)
    ctx_b = model._part_contexts(params, (0, 1, 2), isgc, buf_b)
    np.testing.assert_allclose(np.asarray(ctx_a), np.asarray(ctx_b), atol=0)
    # but part 22's context depends on its ancestor 20
    buf_c = buf_a.at[:, 20].set(jnp.eye(3))
    ctx_c = model._part_contexts(params, (22,), isgc, buf_c)
    ctx_d = model._part_contexts(params, (22,), isgc, buf_a)
    assert np.abs(np.asarray(ctx_c) - np.asarray(ctx_d)).max() > 1e-6


def test_gradients_through_loss_path(model, params):
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(9), (b, IMG, IMG, 18))
    target_pose = jnp.asarray(
        R.random(b * 23, random_state=2).as_matrix().reshape(b, 23, 3, 3).astype(np.float32)
    )
    target_glob = jnp.asarray(R.random(b, random_state=3).as_matrix().astype(np.float32))
    target_shape = jax.random.normal(jax.random.PRNGKey(10), (b, 10))

    def nll(p):
        out = model.apply(
            p, x, compute_point_est=False, compute_for_loglik=True,
            shape_for_loglik=target_shape, pose_R_for_loglik=target_pose,
            glob_R_for_loglik=target_glob,
        )
        lp = model.pose_log_prob(p, target_pose, out["pose_flow_contexts_for_loglik"])
        return -jnp.mean(lp)

    val, g = jax.value_and_grad(nll)(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
    # flow params receive gradient
    gflow = jax.tree_util.tree_leaves(g["flows"])
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in gflow)


def test_jit_full_forward(model, params):
    @jax.jit
    def fwd(p, x, key):
        return model.apply(p, x, key=key, num_samples=2)

    x = jax.random.normal(jax.random.PRNGKey(11), (1, IMG, IMG, 18))
    out = fwd(params, x, jax.random.PRNGKey(12))
    assert np.isfinite(np.asarray(out["pose_rotmats_samples"])).all()


def test_fused_point_est_matches_separate_passes(model, params):
    """The fused (B, N+1) AR pass (point estimate as the zero-noise sample 0)
    must reproduce BOTH the standalone mode-estimate pass and the standalone
    sample pass's RNG stream exactly (models/humaniflow.py _autoregress
    zero_sample0)."""
    x = jax.random.normal(jax.random.PRNGKey(20), (2, IMG, IMG, 18))
    key = jax.random.PRNGKey(21)
    fused = model.apply(params, x, key=key, num_samples=4)
    pe_only = model.apply(params, x, compute_point_est=True, num_samples=0)
    s_only = model.apply(
        params, x, key=key, num_samples=4, compute_point_est=False
    )
    np.testing.assert_allclose(
        np.asarray(fused["pose_rotmats_point_est"]),
        np.asarray(pe_only["pose_rotmats_point_est"]),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fused["pose_rotmats_samples"]),
        np.asarray(s_only["pose_rotmats_samples"]),
        atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(fused["shape_samples"]),
        np.asarray(s_only["shape_samples"]),
        atol=0,
    )
    # also with sampled shapes (use_shape_mode_for_samples=False default) and
    # shape-mode samples
    fused2 = model.apply(
        params, x, key=key, num_samples=3, use_shape_mode_for_samples=True
    )
    s2 = model.apply(
        params, x, key=key, num_samples=3, compute_point_est=False,
        use_shape_mode_for_samples=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused2["pose_rotmats_samples"]),
        np.asarray(s2["pose_rotmats_samples"]),
        atol=2e-6,
    )


def test_input_feats_caching(model, params):
    """The optimise pipeline reruns the heads with cached encoder features
    (reference: optimise_humaniflow.py:96-103)."""
    x = jax.random.normal(jax.random.PRNGKey(13), (1, IMG, IMG, 18))
    out1 = model.apply(params, x, return_input_feats=True)
    out2 = model.apply(params, None, input_feats=out1["input_feats"])
    np.testing.assert_allclose(
        np.asarray(out1["pose_rotmats_point_est"]),
        np.asarray(out2["pose_rotmats_point_est"]),
        atol=0,
    )
