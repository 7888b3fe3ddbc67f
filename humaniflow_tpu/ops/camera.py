"""Camera models: weak-perspective (scaled orthographic) and pinhole
perspective projection.

Capability parity with reference `utils/cam_utils.py`
(orthographic_project_torch:9, get_intrinsics_matrix:19,
perspective_project_torch:30, batch_convert_weak_perspective_to_camera_translation*:69,80).
"""

import jax
import jax.numpy as jnp
import numpy as np


def orthographic_project(points3d: jax.Array, cam_params: jax.Array) -> jax.Array:
    """Scaled orthographic (weak-perspective) projection.

    :param points3d: (B, N, 3)
    :param cam_params: (B, 3) — (scale, trans_x, trans_y)
    :return: (B, N, 2) projected points: s * (xy + t)
    """
    scale = cam_params[..., None, 0:1]
    trans = cam_params[..., None, 1:3]
    return scale * (points3d[..., :2] + trans)


def get_intrinsics_matrix(img_width: int, img_height: int, focal_length: float) -> np.ndarray:
    """Pinhole intrinsics with principal point at the image centre."""
    return np.array(
        [
            [focal_length, 0.0, img_width / 2.0],
            [0.0, focal_length, img_height / 2.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=np.float32,
    )


def perspective_project(
    points: jax.Array,
    rotation=None,
    translation=None,
    cam_K=None,
    focal_length=None,
    img_wh=None,
) -> jax.Array:
    """Perspective projection of 3D point sets.

    :param points: (B, N, 3)
    :param rotation: optional (B, 3, 3) camera rotation
    :param translation: optional (B, 3) camera translation
    :param cam_K: (B, 3, 3) or (3, 3) intrinsics; else built from
        focal_length + img_wh.
    :return: (B, N, 2)
    """
    if cam_K is None:
        cam_K = jnp.asarray(get_intrinsics_matrix(img_wh, img_wh, focal_length))
    cam_K = jnp.asarray(cam_K, dtype=points.dtype)
    if cam_K.ndim == 2:
        cam_K = jnp.broadcast_to(cam_K, points.shape[:-2] + (3, 3))

    hi = jax.lax.Precision.HIGHEST
    if rotation is not None:
        points = jnp.einsum("...ij,...kj->...ki", rotation, points, precision=hi)
    if translation is not None:
        points = points + translation[..., None, :]

    projected = points / points[..., 2:3]
    projected = jnp.einsum("...ij,...kj->...ki", cam_K, projected, precision=hi)
    return projected[..., :2]


def convert_weak_perspective_to_camera_translation(
    cam_wp: jax.Array, focal_length: float, resolution: float
) -> jax.Array:
    """Weak-perspective params (s, tx, ty) → camera translation (tx, ty, tz)
    with tz = 2f / (res * s).  Batched: cam_wp (..., 3) → (..., 3)."""
    cam_wp = jnp.asarray(cam_wp)
    tz = 2.0 * focal_length / (resolution * cam_wp[..., 0] + 1e-9)
    return jnp.stack([cam_wp[..., 1], cam_wp[..., 2], tz], axis=-1)
