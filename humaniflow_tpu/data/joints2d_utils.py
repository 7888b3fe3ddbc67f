"""2D-joint visibility utilities (reference: utils/joints2d_utils.py)."""

import jax.numpy as jnp

JOINT_TO_BODYPART_14 = {7: 3, 8: 5, 9: 12, 10: 11, 13: 7, 14: 9, 15: 14, 16: 13}


def check_joints2d_visibility(joints2d, img_wh, visibility=None):
    """Joints outside the image are invisible (reference :14-26)."""
    if visibility is None:
        visibility = jnp.ones(joints2d.shape[:2], bool)
    inside = (
        (joints2d[..., 0] >= 0)
        & (joints2d[..., 0] <= img_wh)
        & (joints2d[..., 1] >= 0)
        & (joints2d[..., 1] <= img_wh)
    )
    return visibility & inside


def check_joints2d_occluded(seg14part, vis, pixel_count_threshold=50):
    """Appendage joints whose body part has (almost) no visible pixels in the
    14-part seg are marked occluded (reference :29-45)."""
    new_vis = vis
    for joint, part in JOINT_TO_BODYPART_14.items():
        count = jnp.sum(seg14part == part, axis=(1, 2))
        flag = count > pixel_count_threshold
        new_vis = new_vis.at[:, joint].set(vis[:, joint] & flag)
    return new_vis
