"""Tests for rotation-representation conversions, cameras, and alignment."""

import math

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.ops import (
    aa_rotate_rotmats,
    aa_rotate_translate_points,
    convert_weak_perspective_to_camera_translation,
    orthographic_project,
    perspective_project,
    procrustes_analysis_batch,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_rot6d,
    scale_and_translation_transform_batch,
)


def random_rotmats(rng, n):
    return R.random(n, random_state=np.random.RandomState(rng.integers(1 << 30))).as_matrix().astype(np.float32)


def test_rot6d_roundtrip(rng):
    rot = random_rotmats(rng, 32)
    six = rotmat_to_rot6d(jnp.asarray(rot))
    back = np.asarray(rot6d_to_rotmat(six))
    np.testing.assert_allclose(back, rot, atol=1e-5)


def test_rot6d_is_rotation(rng):
    x = rng.normal(size=(16, 6)).astype(np.float32)
    rot = np.asarray(rot6d_to_rotmat(jnp.asarray(x)))
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)


def test_quat_to_rotmat(rng):
    q = rng.normal(size=(16, 4)).astype(np.float32)
    got = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w) order
    qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
    want = R.from_quat(np.concatenate([qn[:, 1:], qn[:, :1]], axis=-1)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_aa_rotate_rotmats(rng):
    rot = random_rotmats(rng, 8)
    axis = np.array([0.0, 1.0, 0.0], np.float32)
    angle = 0.7
    aa, out = aa_rotate_rotmats(jnp.asarray(rot), jnp.asarray(axis), angle)
    want = rot @ R.from_rotvec(axis * angle).as_matrix().astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)
    back = R.from_rotvec(np.asarray(aa, np.float64)).as_matrix()
    np.testing.assert_allclose(back, want, atol=1e-4)


def test_aa_rotate_translate_points(rng):
    pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
    axis = np.array([1.0, 0.0, 0.0], np.float32)
    t = np.array([0.5, -1.0, 2.0], np.float32)
    out = np.asarray(aa_rotate_translate_points(jnp.asarray(pts), jnp.asarray(axis), np.pi / 2, jnp.asarray(t)))
    rm = R.from_rotvec(axis * np.pi / 2).as_matrix()
    want = pts @ rm.T + t
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_orthographic_project():
    pts = jnp.asarray(np.arange(18, dtype=np.float32).reshape(2, 3, 3))
    cam = jnp.asarray(np.array([[2.0, 0.1, -0.2], [0.5, 0.0, 0.0]], np.float32))
    out = np.asarray(orthographic_project(pts, cam))
    want = np.asarray(cam)[:, None, 0:1] * (np.asarray(pts)[:, :, :2] + np.asarray(cam)[:, None, 1:])
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_perspective_project(rng):
    pts = rng.normal(size=(2, 5, 3)).astype(np.float32)
    pts[..., 2] += 5.0  # in front of camera
    t = np.array([[0.0, 0.0, 0.0], [0.1, 0.2, 1.0]], np.float32)
    out = np.asarray(
        perspective_project(jnp.asarray(pts), translation=jnp.asarray(t), focal_length=300.0, img_wh=256)
    )
    k = np.array([[300, 0, 128], [0, 300, 128], [0, 0, 1]], np.float64)
    p = pts + t[:, None]
    want = np.einsum("ij,bkj->bki", k, p / p[..., 2:3])[..., :2]
    np.testing.assert_allclose(out, want, rtol=1e-4)


def test_wp_to_cam_t():
    cam = jnp.asarray(np.array([[0.9, 0.1, -0.3]], np.float32))
    out = np.asarray(convert_weak_perspective_to_camera_translation(cam, 300.0, 256))
    np.testing.assert_allclose(out[0, 2], 2 * 300.0 / (256 * 0.9 + 1e-9), rtol=1e-5)
    np.testing.assert_allclose(out[0, :2], [0.1, -0.3], atol=1e-6)


def test_procrustes_recovers_similarity(rng):
    src = rng.normal(size=(3, 50, 3)).astype(np.float32)
    rot = random_rotmats(rng, 3)
    scale = np.array([0.5, 2.0, 1.3], np.float32)[:, None, None]
    t = rng.normal(size=(3, 1, 3)).astype(np.float32)
    tgt = scale * np.einsum("bij,bkj->bki", rot, src) + t
    aligned = np.asarray(procrustes_analysis_batch(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(aligned, tgt, atol=1e-3)


def test_scale_and_translation_transform(rng):
    p = rng.normal(size=(2, 30, 3)).astype(np.float32)
    t = 3.0 * rng.normal(size=(2, 30, 3)).astype(np.float32) + 1.0
    out = np.asarray(scale_and_translation_transform_batch(jnp.asarray(p), jnp.asarray(t)))
    # means match
    np.testing.assert_allclose(out.mean(axis=1), t.mean(axis=1), atol=1e-4)
    # RMS matches
    rms = lambda x: np.sqrt(np.sum((x - x.mean(axis=1, keepdims=True)) ** 2, axis=(1, 2)) / x.shape[1])
    np.testing.assert_allclose(rms(out), rms(t), rtol=1e-4)
