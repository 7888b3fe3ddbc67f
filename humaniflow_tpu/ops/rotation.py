"""Rotation-representation conversions (6D, quaternion, axis-angle, matrix).

Capability parity with reference `utils/rigid_transform_utils.py`
(rot6d_to_rotmat:86, rotmat_to_rot6d:103, quat_to_rotmat:119,
aa_rotate_rotmats_*:17,40, aa_rotate_translate_points_pytorch3d:67,
so3_exp_opencv:317, so3_log_opencv:331).  The reference keeps two rotation
backends (pytorch3d, broken near 180°, and a per-element OpenCV loop); here a
single batched JAX implementation built on the f32-safe `so3` ops replaces
both.
"""

import jax
import jax.numpy as jnp

from .so3 import so3_exp, so3_log


def rot6d_to_rotmat(x: jax.Array) -> jax.Array:
    """6D rotation representation → rotation matrices (Zhou et al. CVPR'19).

    :param x: (..., 6) with layout [R11, R12, R21, R22, R31, R32] (row-major
        interleave of the first two columns, as produced by the reference's
        network heads).
    :return: (..., 3, 3)
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1 = m[..., 0]
    a2 = m[..., 1]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    proj = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    u2 = a2 - proj * b1
    b2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_rot6d(r: jax.Array, stack_columns: bool = False) -> jax.Array:
    """Rotation matrices → 6D representation (inverse of rot6d_to_rotmat
    when stack_columns=False)."""
    if stack_columns:
        return jnp.concatenate([r[..., :, 0], r[..., :, 1]], axis=-1)
    return r[..., :, :2].reshape(r.shape[:-2] + (6,))


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Quaternions (w, x, y, z) → rotation matrices. Normalises first."""
    q = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = jnp.stack(
        [
            jnp.stack([w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz], -1),
            jnp.stack([2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx], -1),
            jnp.stack([2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2], -1),
        ],
        axis=-2,
    )
    return rows


def aa_rotate_rotmats(
    rotmats: jax.Array,
    axes: jax.Array,
    angles,
    rot_mult_order: str = "post",
):
    """Rotate a batch of rotation matrices about given axis-angle rotations.

    :param rotmats: (B, 3, 3)
    :param axes: (B, 3) or (3,)
    :param angles: (B, 1) or scalar, radians
    :return: (rotated_axisangle (B, 3), rotated_rotmats (B, 3, 3))
    """
    assert rot_mult_order in ("pre", "post")
    r = jnp.asarray(axes) * jnp.asarray(angles)
    if r.ndim < 2:
        r = jnp.broadcast_to(r[None, :], (rotmats.shape[0], 3))
    rot = so3_exp(r.astype(rotmats.dtype))
    hi = jax.lax.Precision.HIGHEST  # 3x3 rotation composition: keep f32 exact
    if rot_mult_order == "post":
        out = jnp.matmul(rotmats, rot, precision=hi)
    else:
        out = jnp.matmul(rot, rotmats, precision=hi)
    return so3_log(out), out


def aa_rotate_translate_points(
    points: jax.Array,
    axes: jax.Array,
    angles,
    translations: jax.Array,
) -> jax.Array:
    """Rotate and translate batched point sets.

    :param points: (B, N, 3)
    :param axes: (B, 3) or (3,); :param angles: (B, 1) or scalar
    :param translations: (B, 3) or (3,)
    """
    r = jnp.asarray(axes) * jnp.asarray(angles)
    if r.ndim < 2:
        r = jnp.broadcast_to(r[None, :], (points.shape[0], 3))
    rot = so3_exp(r.astype(points.dtype))
    out = jnp.einsum("bij,bkj->bki", rot, points, precision=jax.lax.Precision.HIGHEST)
    return out + jnp.reshape(jnp.asarray(translations), (-1, 1, 3))


def batch_rodrigues(axisangle: jax.Array) -> jax.Array:
    """Axis-angle vectors → rotation matrices (name kept for parity with the
    smplx helper the reference calls, humaniflow_model.py:299)."""
    return so3_exp(axisangle)
