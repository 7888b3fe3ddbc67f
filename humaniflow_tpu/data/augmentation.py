"""Synthetic-training-data augmentation: SMPL shape, camera, lighting, RGB
and proxy-representation corruption.

Capability parity with reference `utils/augmentation/` (smpl_augmentation.py,
cam_augmentation.py, lighting_augmentation.py, rgb_augmentation.py,
proxy_rep_augmentation.py — ~510 LoC of per-sample Python loops), redesigned
as fully-batched, PRNG-key-driven jnp ops: every "loop over batch and maybe
occlude" becomes a broadcasted mask select, so the whole augmentation stage
fuses into the jitted synthetic-data pipeline.
"""


import jax
import jax.numpy as jnp

from ..configs.defaults import ProxyRepAugment, RgbAugment
from .label_conversions import TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP

# ---------------------------------------------------------------- SMPL shape


def normal_sample_shape(key, batch_size, mean_shape, std_vector):
    """Gaussian shape sampling (reference: smpl_augmentation.py:16-21)."""
    eps = jax.random.normal(key, (batch_size, mean_shape.shape[0]))
    return mean_shape + eps * std_vector


def uniform_sample_shape(key, batch_size, mean_shape, delta_betas_range):
    lo, hi = delta_betas_range
    delta = jax.random.uniform(
        key, (batch_size, mean_shape.shape[0]), minval=lo, maxval=hi
    )
    return mean_shape + delta


# ------------------------------------------------------------------- camera


def augment_cam_t(key, mean_cam_t, xy_std=0.05, delta_z_range=(-0.5, 0.5)):
    """Jitter camera translation (reference: cam_augmentation.py:4-16)."""
    kxy, kz = jax.random.split(key)
    b = mean_cam_t.shape[0]
    dxy = jax.random.normal(kxy, (b, 2)) * xy_std
    dz = jax.random.uniform(kz, (b,), minval=delta_z_range[0], maxval=delta_z_range[1])
    return jnp.concatenate(
        [mean_cam_t[:, :2] + dxy, (mean_cam_t[:, 2] + dz)[:, None]], axis=-1
    )


# ----------------------------------------------------------------- lighting


def augment_light_t(key, batch_size, loc_r_range=(0.05, 3.0)):
    """Random point-light locations: uniform direction on the sphere ×
    uniform radius (reference: lighting_augmentation.py:4-21)."""
    kd, kr = jax.random.split(key)
    direction = jax.random.normal(kd, (batch_size, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    lo, hi = loc_r_range
    r = jax.random.uniform(kr, (batch_size, 1), minval=lo, maxval=hi)
    return direction * r


def augment_light_colour(
    key, batch_size,
    ambient_intensity_range=(0.2, 0.8),
    diffuse_intensity_range=(0.2, 0.8),
    specular_intensity_range=(0.2, 0.8),
):
    """White-light intensity sampling (reference: lighting_augmentation.py:24-50)."""
    ka, kd, ks = jax.random.split(key, 3)

    def u(k, rng):
        v = jax.random.uniform(k, (batch_size, 1), minval=rng[0], maxval=rng[1])
        return jnp.broadcast_to(v, (batch_size, 3))

    return {
        "ambient_color": u(ka, ambient_intensity_range),
        "diffuse_color": u(kd, diffuse_intensity_range),
        "specular_color": u(ks, specular_intensity_range),
    }


# -------------------------------------------------- half/box occlusion masks


def _row_col_ids(b, h, w):
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    return rows, cols


def _half_occlusion(key, b, wh, prob, jitter_div):
    """(apply (B,), cut (B,)) for half-image occlusions."""
    kp, kc = jax.random.split(key)
    apply = jax.random.uniform(kp, (b,)) < prob
    jit = wh // jitter_div
    cut = wh // 2 + jax.random.randint(kc, (b,), -jit, jit)
    return apply, cut


def random_occlude_bottom_half(key, img, joints2d, joints2d_vis, prob):
    """img: (B, H, W) seg or (B, H, W, C) rgb; occludes rows >= cut
    (reference: proxy_rep_augmentation.py:121-138 / rgb_augmentation.py:6-24)."""
    b, h, w = img.shape[:3]
    apply, cut = _half_occlusion(key, b, h, prob, 5)
    rows, _ = _row_col_ids(b, h, w)
    mask = apply[:, None, None] & (rows >= cut[:, None, None])
    if img.ndim == 4:
        mask = mask[..., None]
    img = jnp.where(mask, 0, img)
    if joints2d is not None:
        occl = apply[:, None] & (joints2d[..., 1] > cut[:, None])
        joints2d_vis = jnp.where(occl, False, joints2d_vis)
    return img, joints2d, joints2d_vis


def random_occlude_top_half(key, img, joints2d, joints2d_vis, prob):
    b, h, w = img.shape[:3]
    apply, cut = _half_occlusion(key, b, h, prob, 5)
    rows, _ = _row_col_ids(b, h, w)
    mask = apply[:, None, None] & (rows < cut[:, None, None])
    if img.ndim == 4:
        mask = mask[..., None]
    img = jnp.where(mask, 0, img)
    if joints2d is not None:
        occl = apply[:, None] & (joints2d[..., 1] < cut[:, None])
        joints2d_vis = jnp.where(occl, False, joints2d_vis)
    return img, joints2d, joints2d_vis


def random_occlude_vertical_half(key, img, joints2d, joints2d_vis, prob):
    b, h, w = img.shape[:3]
    k1, k2 = jax.random.split(key)
    apply, cut = _half_occlusion(k1, b, w, prob, 30)
    left_side = jax.random.uniform(k2, (b,)) > 0.5
    _, cols = _row_col_ids(b, h, w)
    occl_cols = jnp.where(
        left_side[:, None, None], cols < cut[:, None, None], cols >= cut[:, None, None]
    )
    mask = apply[:, None, None] & occl_cols
    if img.ndim == 4:
        mask = mask[..., None]
    img = jnp.where(mask, 0, img)
    if joints2d is not None:
        occl_j = jnp.where(
            left_side[:, None], joints2d[..., 0] < cut[:, None], joints2d[..., 0] > cut[:, None]
        )
        joints2d_vis = jnp.where(apply[:, None] & occl_j, False, joints2d_vis)
    return img, joints2d, joints2d_vis


def random_occlude_box(key, seg, prob, box_dim):
    """Zero a box near the image centre (reference:
    proxy_rep_augmentation.py:94-118)."""
    b, h, w = seg.shape
    kp, kx, ky = jax.random.split(key, 3)
    apply = jax.random.uniform(kp, (b,)) < prob
    cx = jax.random.uniform(kx, (b,), minval=h / 2 - 0.15 * h, maxval=h / 2 + 0.15 * h)
    cy = jax.random.uniform(ky, (b,), minval=w / 2 - 0.15 * w, maxval=w / 2 + 0.15 * w)
    rows, cols = _row_col_ids(b, h, w)
    in_box = (
        (rows >= (cx - box_dim / 2)[:, None, None])
        & (rows < (cx + box_dim / 2)[:, None, None])
        & (cols >= (cy - box_dim / 2)[:, None, None])
        & (cols < (cy + box_dim / 2)[:, None, None])
    )
    return jnp.where(apply[:, None, None] & in_box, 0, seg)


# ---------------------------------------------------------- joint corruption


def random_joints2d_deviation(
    key, joints2d, delta_j2d_dev_range=(-5, 5), delta_j2d_hip_dev_range=(-15, 15)
):
    """Per-joint positional noise; hips get a wider range (reference:
    proxy_rep_augmentation.py:7-24)."""
    b, k = joints2d.shape[:2]
    k1, k2 = jax.random.split(key)
    dev = jax.random.uniform(
        k1, (b, k, 2), minval=delta_j2d_dev_range[0], maxval=delta_j2d_dev_range[1]
    )
    hip_dev = jax.random.uniform(
        k2, (b, k, 2), minval=delta_j2d_hip_dev_range[0], maxval=delta_j2d_hip_dev_range[1]
    )
    is_hip = jnp.zeros((k,), bool).at[jnp.asarray([11, 12])].set(True)
    return joints2d + jnp.where(is_hip[None, :, None], hip_dev, dev)


def random_swap_joints2d(key, joints2d, joints_to_swap, swap_probability=0.1):
    """Left/right confusion (reference: proxy_rep_augmentation.py:73-91)."""
    b = joints2d.shape[0]
    keys = jax.random.split(key, len(joints_to_swap))
    for (a, c), k in zip(joints_to_swap, keys):
        apply = jax.random.uniform(k, (b,)) < swap_probability
        ja, jc = joints2d[:, a], joints2d[:, c]
        joints2d = joints2d.at[:, a].set(jnp.where(apply[:, None], jc, ja))
        joints2d = joints2d.at[:, c].set(jnp.where(apply[:, None], ja, jc))
    return joints2d


def random_remove_joints2d(key, joints2d_vis, joints_to_remove, prob=0.1):
    b = joints2d_vis.shape[0]
    keys = jax.random.split(key, len(joints_to_remove))
    for joint, k in zip(joints_to_remove, keys):
        apply = jax.random.uniform(k, (b,)) < prob
        joints2d_vis = joints2d_vis.at[:, joint].set(
            jnp.where(apply, False, joints2d_vis[:, joint])
        )
    return joints2d_vis


def random_remove_bodyparts(
    key, seg, classes_to_remove, probs_to_remove, joints2d_vis,
    prob_to_remove_joints,
):
    """Remove DensePose part classes from the seg; removed appendage parts may
    also hide the matching COCO joint (reference:
    proxy_rep_augmentation.py:27-59)."""
    b = seg.shape[0]
    keys = jax.random.split(key, 2 * len(classes_to_remove))
    for i, (cls, prob) in enumerate(zip(classes_to_remove, probs_to_remove)):
        apply = jax.random.uniform(keys[2 * i], (b,)) < prob
        seg = jnp.where(apply[:, None, None] & (seg == cls), 0, seg)
        if joints2d_vis is not None and cls in TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP:
            joint = TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP[cls]
            apply_j = apply & (
                jax.random.uniform(keys[2 * i + 1], (b,)) < prob_to_remove_joints
            )
            joints2d_vis = joints2d_vis.at[:, joint].set(
                jnp.where(apply_j, False, joints2d_vis[:, joint])
            )
    return seg, joints2d_vis


def random_extreme_crop(key, seg, extreme_crop_probability=0.05):
    """Remove legs (or legs+arms) part classes to simulate extreme crops
    (reference: proxy_rep_augmentation.py:238-275)."""
    legs = jnp.asarray([5, 6, 7, 8, 9, 10, 11, 12, 13, 14])
    legs_arms = jnp.asarray([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 19, 20, 21, 22])
    b = seg.shape[0]
    r = jax.random.uniform(key, (b,))
    do_legs = r < extreme_crop_probability * 0.5
    do_legs_arms = (r > extreme_crop_probability * 0.5) & (r < extreme_crop_probability)
    in_legs = jnp.isin(seg, legs)
    in_legs_arms = jnp.isin(seg, legs_arms)
    seg = jnp.where(do_legs[:, None, None] & in_legs, 0, seg)
    seg = jnp.where(do_legs_arms[:, None, None] & in_legs_arms, 0, seg)
    return seg


# -------------------------------------------------------------------- suites


def augment_proxy_representation(
    key, seg, joints2d, joints2d_vis, cfg: ProxyRepAugment
):
    """Full proxy-representation corruption pipeline (reference:
    proxy_rep_augmentation.py:186-235)."""
    keys = jax.random.split(key, 8)
    seg, joints2d_vis = random_remove_bodyparts(
        keys[0], seg, cfg.REMOVE_PARTS_CLASSES, cfg.REMOVE_PARTS_PROBS,
        joints2d_vis, cfg.REMOVE_APPENDAGE_JOINTS_PROB,
    )
    seg = random_occlude_box(keys[1], seg, cfg.OCCLUDE_BOX_PROB, cfg.OCCLUDE_BOX_DIM)
    joints2d = random_swap_joints2d(keys[2], joints2d, cfg.JOINTS_TO_SWAP, cfg.JOINTS_SWAP_PROB)
    joints2d = random_joints2d_deviation(
        keys[3], joints2d, cfg.DELTA_J2D_DEV_RANGE, cfg.DELTA_J2D_DEV_RANGE
    )
    joints2d_vis = random_remove_joints2d(
        keys[4], joints2d_vis, cfg.REMOVE_JOINTS_INDICES, cfg.REMOVE_JOINTS_PROB
    )
    seg, joints2d, joints2d_vis = random_occlude_bottom_half(
        keys[5], seg, joints2d, joints2d_vis, cfg.OCCLUDE_BOTTOM_PROB
    )
    seg, joints2d, joints2d_vis = random_occlude_top_half(
        keys[6], seg, joints2d, joints2d_vis, cfg.OCCLUDE_TOP_PROB
    )
    seg, joints2d, joints2d_vis = random_occlude_vertical_half(
        keys[7], seg, joints2d, joints2d_vis, cfg.OCCLUDE_VERTICAL_PROB
    )
    return seg, joints2d, joints2d_vis


def random_pixel_noise_per_channel(key, rgb, noise_factor=0.2):
    """rgb: (B, H, W, 3) in [0,1] (reference: rgb_augmentation.py:76-82)."""
    b = rgb.shape[0]
    noise = jax.random.uniform(
        key, (b, 1, 1, 3), minval=1 - noise_factor, maxval=1 + noise_factor
    )
    return jnp.clip(rgb * noise, max=1.0)


def augment_rgb(key, rgb, joints2d, joints2d_vis, cfg: RgbAugment):
    """RGB occlusion halves + per-channel pixel noise (reference:
    rgb_augmentation.py:101-130).  rgb is NHWC."""
    keys = jax.random.split(key, 4)
    rgb, joints2d, joints2d_vis = random_occlude_bottom_half(
        keys[0], rgb, joints2d, joints2d_vis, cfg.OCCLUDE_BOTTOM_PROB
    )
    rgb, joints2d, joints2d_vis = random_occlude_top_half(
        keys[1], rgb, joints2d, joints2d_vis, cfg.OCCLUDE_TOP_PROB
    )
    rgb, joints2d, joints2d_vis = random_occlude_vertical_half(
        keys[2], rgb, joints2d, joints2d_vis, cfg.OCCLUDE_VERTICAL_PROB
    )
    rgb = random_pixel_noise_per_channel(keys[3], rgb, cfg.PIXEL_CHANNEL_NOISE)
    return rgb, joints2d, joints2d_vis
