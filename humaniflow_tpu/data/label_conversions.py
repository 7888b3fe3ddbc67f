"""Joint/segmentation label conventions and converters.

Capability parity with reference `utils/label_conversions.py` (maps :5-36,
seg converters :39-87, heatmap converters :90-163).  Heatmap synthesis is a
fully-batched jnp op that fuses into the proxy-representation pipeline.
"""

import jax.numpy as jnp
import numpy as np

COCO_JOINTS = {
    "Right Ankle": 16, "Right Knee": 14, "Right Hip": 12,
    "Left Hip": 11, "Left Knee": 13, "Left Ankle": 15,
    "Right Wrist": 10, "Right Elbow": 8, "Right Shoulder": 6,
    "Left Shoulder": 5, "Left Elbow": 7, "Left Wrist": 9,
    "Right Ear": 4, "Left Ear": 3, "Right Eye": 2, "Left Eye": 1,
    "Nose": 0,
}

# Subsets of the 90-joint SMPL superset (models/smpl.py joint layout)
ALL_JOINTS_TO_COCO_MAP = [24, 26, 25, 28, 27, 16, 17, 18, 19, 20, 21, 1, 2, 4, 5, 7, 8]
ALL_JOINTS_TO_H36M_MAP = list(range(73, 90))
H36M_TO_J17 = [6, 5, 4, 1, 2, 3, 16, 15, 14, 11, 12, 13, 8, 10, 0, 7, 9]
H36M_TO_J14 = H36M_TO_J17[:14]
PW3D_JOINTS2D_TO_COCO_MAP = [0, 15, 14, 17, 16, 5, 2, 6, 3, 7, 4, 11, 8, 12, 9, 13, 10]

TWENTYFOUR_PART_SEG_TO_COCO_JOINTS_MAP = {
    19: 7, 21: 7, 20: 8, 22: 8, 4: 9, 3: 10,
    12: 13, 14: 13, 11: 14, 13: 14, 5: 15, 6: 16,
}

# DensePose 24-part → 14-part lookup (index = densepose class 0..24)
_DP24_TO_14 = np.zeros(25, np.int32)
for _src, _dst in [
    (1, 1), (2, 1), (3, 11), (4, 12), (5, 14), (6, 13), (7, 8), (8, 6),
    (9, 8), (10, 6), (11, 9), (12, 7), (13, 9), (14, 7), (15, 2), (16, 4),
    (17, 2), (18, 4), (19, 3), (20, 5), (21, 3), (22, 5), (23, 10), (24, 10),
]:
    _DP24_TO_14[_src] = _dst


def convert_densepose_seg_to_14part_labels(densepose_seg):
    """24 DensePose part labels → 14 part labels.

    On device the 25-entry lookup runs as an unrolled select chain instead
    of a per-pixel gather — XLA TPU lowers image-sized gathers to a
    latency-bound path (~35 ms/batch at B=72/256² for this LUT alone),
    while 24 fused vector selects are ~1 ms (docs/DESIGN.md)."""
    if isinstance(densepose_seg, np.ndarray):
        return _DP24_TO_14[densepose_seg.astype(np.int32)]
    seg = densepose_seg.astype(jnp.int32)
    out = jnp.zeros_like(seg)
    for src in range(1, 25):
        out = jnp.where(seg == src, int(_DP24_TO_14[src]), out)
    return out


def convert_multiclass_to_binary_labels(labels):
    if isinstance(labels, np.ndarray):
        return (labels != 0).astype(labels.dtype)
    return (labels != 0).astype(labels.dtype)


def convert_2d_joints_to_gaussian_heatmaps(joints2d, img_wh: int, std: float = 4.0):
    """Batched Gaussian heatmap synthesis.

    :param joints2d: (B, N, 2) (x=col, y=row) coordinates.
    :return: (B, N, img_wh, img_wh) heatmaps (channels-first like the
        reference torch variant, label_conversions.py:106).
    """
    joints2d = jnp.asarray(joints2d, jnp.float32)
    grid = jnp.arange(img_wh, dtype=jnp.float32)
    xx = grid[None, None, None, :]  # columns
    yy = grid[None, None, :, None]  # rows
    u = joints2d[..., 0, None, None]
    v = joints2d[..., 1, None, None]
    return jnp.exp(-(((xx - u) / std) ** 2) / 2 - (((yy - v) / std) ** 2) / 2)


def convert_heatmaps_to_2d_joints_coordinates(heatmaps, eps: float = 1e-6,
                                              gaussian_heatmaps: bool = False):
    """Argmax decode of joint heatmaps → coordinates + visibility
    (reference: label_conversions.py:128)."""
    b, n, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, n, -1)
    max_vals = jnp.max(flat, axis=-1)
    max_idx = jnp.argmax(flat, axis=-1)
    x = (max_idx % w).astype(jnp.float32)
    y = jnp.floor(max_idx.astype(jnp.float32) / w)
    joints2d = jnp.stack([x, y], axis=-1)
    vis = max_vals > eps
    if gaussian_heatmaps:
        vis = vis & (max_vals > (jnp.max(max_vals) - 1e-2))
    joints2d = jnp.where(vis[..., None], joints2d, -1000.0)
    return joints2d, vis
