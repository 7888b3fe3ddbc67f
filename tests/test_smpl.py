"""SMPL-in-JAX tests (synthetic model; real pkls are external downloads,
same as the reference repo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.models import smpl_forward, synthetic_smpl


@pytest.fixture(scope="module")
def model():
    return synthetic_smpl(num_verts=64)


def _identity_pose(b):
    eye = jnp.broadcast_to(jnp.eye(3), (b, 23, 3, 3))
    glob = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    return eye, glob


def test_rest_pose_matches_template(model):
    body, glob = _identity_pose(2)
    out = smpl_forward(model, jnp.zeros((2, 10)), body, glob)
    np.testing.assert_allclose(
        np.asarray(out["vertices"][0]), np.asarray(model.v_template), atol=1e-5
    )
    assert out["joints"].shape == (2, 24 + 21 + 9 + 19 + 17, 3)


def test_global_rotation_rotates_mesh(model):
    b = 1
    body, _ = _identity_pose(b)
    rot = R.from_rotvec([0, np.pi / 2, 0]).as_matrix().astype(np.float32)
    out_id = smpl_forward(model, jnp.zeros((b, 10)), body, jnp.broadcast_to(jnp.eye(3), (b, 3, 3)))
    out_rot = smpl_forward(model, jnp.zeros((b, 10)), body, jnp.asarray(rot)[None])
    # Global rotation acts about the root joint
    root = np.asarray(out_id["smpl_joints"][0, 0])
    got = np.asarray(out_rot["vertices"][0])
    want = (np.asarray(out_id["vertices"][0]) - root) @ rot.T + root
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_betas_move_vertices(model):
    body, glob = _identity_pose(1)
    out0 = smpl_forward(model, jnp.zeros((1, 10)), body, glob)
    out1 = smpl_forward(model, jnp.ones((1, 10)), body, glob)
    assert np.abs(np.asarray(out1["vertices"]) - np.asarray(out0["vertices"])).max() > 1e-4


def test_pose2rot_path_consistency(model):
    aa_body = np.random.default_rng(0).normal(scale=0.3, size=(2, 69)).astype(np.float32)
    aa_glob = np.random.default_rng(1).normal(scale=0.3, size=(2, 3)).astype(np.float32)
    out_aa = smpl_forward(
        model, jnp.zeros((2, 10)), jnp.asarray(aa_body), jnp.asarray(aa_glob), pose2rot=True
    )
    body_r = jnp.asarray(
        R.from_rotvec(aa_body.reshape(-1, 3)).as_matrix().reshape(2, 23, 3, 3).astype(np.float32)
    )
    glob_r = jnp.asarray(R.from_rotvec(aa_glob).as_matrix().astype(np.float32))
    out_r = smpl_forward(model, jnp.zeros((2, 10)), body_r, glob_r)
    np.testing.assert_allclose(
        np.asarray(out_aa["vertices"]), np.asarray(out_r["vertices"]), atol=1e-4
    )


def test_jit_and_vmap(model):
    fwd = jax.jit(lambda b, p, g: smpl_forward(model, b, p, g)["vertices"])
    body, glob = _identity_pose(3)
    v = fwd(jnp.zeros((3, 10)), body, glob)
    assert v.shape == (3, 64, 3)
    assert np.isfinite(np.asarray(v)).all()


def test_gradients_flow(model):
    def loss(betas):
        body, glob = _identity_pose(1)
        return jnp.sum(smpl_forward(model, betas, body, glob)["vertices"] ** 2)

    g = jax.grad(loss)(jnp.ones((1, 10)) * 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_vertex_moments_match_naive_reduction(model):
    """smpl_vertex_moments (CPU path: XLA forward + reduce) == per-group
    Σx / Σx² of smpl_forward's vertices.  The TPU Pallas kernel variant is
    pinned in tests/test_pallas_lbs.py."""
    from scipy.spatial.transform import Rotation

    from humaniflow_tpu.models.smpl import smpl_vertex_moments

    g, n = 3, 5
    rng = np.random.default_rng(7)
    betas = jnp.asarray(rng.normal(scale=0.5, size=(g * n, 10)), jnp.float32)
    rots = Rotation.random(g * n * 24, random_state=8).as_matrix()
    rots = jnp.asarray(rots.reshape(g * n, 24, 3, 3), jnp.float32)
    body, glob = rots[:, 1:], rots[:, 0]

    mom = smpl_vertex_moments(model, betas, body, glob, num_groups=g)
    assert mom.shape == (g, 2, 3, 64)

    v = smpl_forward(model, betas, body, glob)["vertices_cm"].reshape(g, n, 3, 64)
    np.testing.assert_allclose(
        np.asarray(mom[:, 0]), np.asarray(v.sum(axis=1)), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mom[:, 1]), np.asarray((v * v).sum(axis=1)), rtol=1e-5, atol=1e-5
    )
