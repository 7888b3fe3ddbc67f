"""Sample post-processing: per-vertex uncertainty, J2D-error-sorted sample
selection, uniform SO(3) sampling.

Capability parity with reference `utils/sampling_utils.py:10-74`, fully
batched jnp (the reference operates on single-image sample stacks; these
accept an optional leading batch axis).
"""

import math

import jax
import jax.numpy as jnp

from ..data.label_conversions import (
    ALL_JOINTS_TO_COCO_MAP,
    convert_heatmaps_to_2d_joints_coordinates,
)
from ..metrics.train_metrics import undo_keypoint_normalisation
from ..ops.camera import orthographic_project
from ..ops.rotation import quat_to_rotmat
from ..ops.so3 import so3_exp


def so3_uniform_sampling(key, num_matrices: int) -> jax.Array:
    """Haar-uniform rotation sampling via random unit quaternions
    (reference :10-19)."""
    q = jax.random.normal(key, (num_matrices, 4))
    return quat_to_rotmat(q)


def compute_vertex_variance_from_samples(vertices_samples: jax.Array):
    """Per-vertex uncertainty from mesh samples (reference :22-33).

    :param vertices_samples: (N, V, 3) (or (B, N, V, 3))
    :return: (avg_l2_from_mean (V,), directional_std (V, 3)) — batched if a
        batch axis was given.
    """
    mean = jnp.mean(vertices_samples, axis=-3, keepdims=True)
    diff = vertices_samples - mean
    directional_std = jnp.sqrt(jnp.mean(diff**2, axis=-3))
    avg_l2 = jnp.mean(jnp.linalg.norm(diff, axis=-1), axis=-2)
    return avg_l2, directional_std


def joints2d_error_sorted_verts_sampling(
    pred_vertices_samples: jax.Array,
    pred_joints_samples: jax.Array,
    input_joints2d_heatmaps: jax.Array,
    pred_cam_wp: jax.Array,
) -> jax.Array:
    """Sort vertex-mesh samples by max visible-joint 2D reprojection error
    against the input heatmaps (reference :36-74).

    :param pred_vertices_samples: (N, V, 3); :param pred_joints_samples:
        (N, 90, 3); :param input_joints2d_heatmaps: (1, 17, H, W);
    :param pred_cam_wp: (1, 3).
    """
    img_wh = input_joints2d_heatmaps.shape[-1]
    coco = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)
    joints = pred_joints_samples[:, coco]
    # x-axis 180° flip (camera convention, reference :51-54)
    flip = so3_exp(jnp.asarray([[math.pi, 0.0, 0.0]], jnp.float32))[0]
    joints = jnp.einsum("ij,nkj->nki", flip, joints)
    j2d = orthographic_project(joints, jnp.broadcast_to(pred_cam_wp, (joints.shape[0], 3)))
    j2d = undo_keypoint_normalisation(j2d, img_wh)

    input_j2d, input_vis = convert_heatmaps_to_2d_joints_coordinates(
        input_joints2d_heatmaps, eps=1e-6
    )
    err = jnp.linalg.norm(j2d - input_j2d[0][None], axis=-1)  # (N, 17)
    # max over VISIBLE joints (invisible masked to -inf so they never win)
    err = jnp.where(input_vis[0][None], err, -jnp.inf)
    max_err = jnp.max(err, axis=-1)  # (N,)
    order = jnp.argsort(max_err)
    return pred_vertices_samples[order]
