"""Batched image-space ops: bbox handling, affine crop/uncrop, background
compositing.

Capability parity with reference `utils/image_utils.py`
(bbox converters :7-45, batch_add_rgb_background :48, batch_crop_opencv_affine
:62 and batch_crop_pytorch_affine :234 including uncropping).  TPU-first:

* one gather-based bilinear/nearest affine sampler replaces both the per-image
  cv2.warpAffine loop and torch affine_grid/grid_sample — sampling coordinates
  are derived in pixel space to match torch's align_corners=False semantics
  exactly (half-pixel centres);
* bbox determination from silhouettes/joints is a masked min/max reduction
  (static shapes, jit-able) instead of np.argwhere.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e9


def convert_bbox_corners_to_centre_hw(bbox_corners: jax.Array):
    """(B, 4) [y1, x1, y2, x2] (vertical, horizontal) → centres (B, 2),
    heights (B,), widths (B,)."""
    centres = jnp.stack(
        [
            (bbox_corners[:, 0] + bbox_corners[:, 2]) / 2.0,
            (bbox_corners[:, 1] + bbox_corners[:, 3]) / 2.0,
        ],
        axis=-1,
    )
    heights = bbox_corners[:, 2] - bbox_corners[:, 0]
    widths = bbox_corners[:, 3] - bbox_corners[:, 1]
    return centres, heights, widths


def convert_bbox_centre_hw_to_corners(centre, height, width):
    return jnp.stack(
        [
            centre[..., 0] - height / 2.0,
            centre[..., 1] - width / 2.0,
            centre[..., 0] + height / 2.0,
            centre[..., 1] + width / 2.0,
        ],
        axis=-1,
    )


def bbox_from_silhouette(seg: jax.Array) -> jax.Array:
    """Corners [y1, x1, y2, x2] of the nonzero region per batch element.

    :param seg: (B, H, W); jit-safe masked min/max (no argwhere).
    """
    b, h, w = seg.shape
    mask = seg != 0
    rows = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (b, h, w), 2)
    y1 = jnp.min(jnp.where(mask, rows, BIG), axis=(1, 2))
    x1 = jnp.min(jnp.where(mask, cols, BIG), axis=(1, 2))
    y2 = jnp.max(jnp.where(mask, rows, -BIG), axis=(1, 2))
    x2 = jnp.max(jnp.where(mask, cols, -BIG), axis=(1, 2))
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def bbox_from_joints2d(joints2d: jax.Array, vis: jax.Array) -> jax.Array:
    """Corners [y1, x1, y2, x2] from visible 2D joints (x=cols, y=rows)."""
    v = vis[..., None]
    x1 = jnp.min(jnp.where(v[..., 0], joints2d[..., 0], BIG), axis=-1)
    y1 = jnp.min(jnp.where(v[..., 0], joints2d[..., 1], BIG), axis=-1)
    x2 = jnp.max(jnp.where(v[..., 0], joints2d[..., 0], -BIG), axis=-1)
    y2 = jnp.max(jnp.where(v[..., 0], joints2d[..., 1], -BIG), axis=-1)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def batch_add_rgb_background(backgrounds, rgb, seg):
    """Composite rendered person over background (reference :48; NHWC here).

    :param backgrounds/rgb: (B, H, W, 3); :param seg: (B, H, W).
    """
    body = (seg != 0)[..., None]
    return jnp.where(body, rgb, backgrounds)


def _affine_sample(img, src_x, src_y, mode: str, pad_val: float = 0.0):
    """Sample img (B, H, W, C) at per-pixel source coords (B, OH, OW)."""
    b, h, w, c = img.shape

    def sample_one(im, sx, sy):
        if mode == "nearest":
            ix = jnp.round(sx).astype(jnp.int32)
            iy = jnp.round(sy).astype(jnp.int32)
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            ixc = jnp.clip(ix, 0, w - 1)
            iyc = jnp.clip(iy, 0, h - 1)
            vals = im[iyc, ixc]
            return jnp.where(valid[..., None], vals, pad_val)
        # bilinear with zero padding outside
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        wx = (sx - x0)[..., None]
        wy = (sy - y0)[..., None]
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                ix = x0.astype(jnp.int32) + dx
                iy = y0.astype(jnp.int32) + dy
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                v = im[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
                v = jnp.where(valid[..., None], v, pad_val)
                weight = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
                out = out + v * weight
        return out

    return jax.vmap(sample_one)(img, src_x, src_y)


def _crop_affine_params(
    bbox_centres, bbox_heights, bbox_widths, output_wh, orig_scale_factor,
    key=None, delta_scale_range=None, delta_centre_range=None,
):
    """Aspect-match + scale + jitter → forward affine (dst = s·src + t) in
    (x, y) pixel coords (reference :309-334)."""
    ow, oh = float(output_wh[0]), float(output_wh[1])
    aspect = oh / ow
    widths = jnp.where(bbox_heights > bbox_widths * aspect, bbox_heights / aspect, bbox_widths)
    heights = jnp.where(bbox_heights < bbox_widths * aspect, widths * aspect, bbox_heights)

    scale_factor = orig_scale_factor
    if delta_scale_range is not None:
        lo, hi = delta_scale_range
        key, sub = jax.random.split(key)
        scale_factor = scale_factor + jax.random.uniform(
            sub, bbox_heights.shape, minval=lo, maxval=hi
        )
    heights = heights * scale_factor
    widths = widths * scale_factor
    if delta_centre_range is not None:
        lo, hi = delta_centre_range
        key, sub = jax.random.split(key)
        bbox_centres = bbox_centres + jax.random.uniform(
            sub, bbox_centres.shape, minval=lo, maxval=hi
        )

    scale = jnp.stack([ow / widths, oh / heights], axis=-1)  # (B, 2) x,y
    out_centre = jnp.array([ow * 0.5, oh * 0.5])
    trans = out_centre - scale * bbox_centres[:, [1, 0]]  # centres are (y, x)
    return scale, trans


def batch_crop_affine(
    output_wh: Tuple[int, int],
    iuv=None,
    joints2d=None,
    rgb=None,
    seg=None,
    bbox_determiner=None,
    bbox_centres=None,
    bbox_heights=None,
    bbox_widths=None,
    bbox_whs=None,
    joints2d_vis=None,
    orig_scale_factor: float = 1.2,
    key=None,
    delta_scale_range=None,
    delta_centre_range=None,
    out_of_frame_pad_val: float = 0.0,
) -> dict:
    """Batched crop-and-resize around person bounding boxes.

    Images are NHWC ((B, H, W, C)); seg is (B, H, W); joints2d is (B, K, 2)
    in (x, y).  Returns dict of cropped tensors at output_wh.
    """
    if bbox_centres is None:
        if bbox_determiner is not None:
            corners = bbox_from_silhouette(bbox_determiner)
        elif iuv is not None:
            corners = bbox_from_silhouette(iuv[..., 0])
        elif seg is not None:
            corners = bbox_from_silhouette(seg)
        else:
            corners = bbox_from_joints2d(joints2d, joints2d_vis)
        bbox_centres, bbox_heights, bbox_widths = convert_bbox_corners_to_centre_hw(corners)
    elif bbox_whs is not None:
        bbox_heights = bbox_whs
        bbox_widths = bbox_whs

    scale, trans = _crop_affine_params(
        bbox_centres, bbox_heights, bbox_widths, output_wh, orig_scale_factor,
        key=key, delta_scale_range=delta_scale_range, delta_centre_range=delta_centre_range,
    )

    ow, oh = int(output_wh[0]), int(output_wh[1])
    xs = jnp.arange(ow, dtype=jnp.float32)
    ys = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (OH, OW)
    # src pixel-centre coords (align_corners=False semantics)
    src_x = (gx[None] + 0.5 - trans[:, 0, None, None]) / scale[:, 0, None, None] - 0.5
    src_y = (gy[None] + 0.5 - trans[:, 1, None, None]) / scale[:, 1, None, None] - 0.5

    out = {"crop_scale": scale, "crop_trans": trans}
    if iuv is not None:
        out["iuv"] = _affine_sample(iuv, src_x, src_y, "nearest", out_of_frame_pad_val)
    if rgb is not None:
        out["rgb"] = _affine_sample(rgb, src_x, src_y, "bilinear", 0.0)
    if seg is not None:
        out["seg"] = _affine_sample(seg[..., None], src_x, src_y, "nearest", 0.0)[..., 0]
    if joints2d is not None:
        out["joints2d"] = joints2d * scale[:, None, :] + trans[:, None, :]
    return out


def batch_uncrop_affine(
    cropped,
    uncrop_wh: Tuple[int, int],
    bbox_centres,
    bbox_heights,
    bbox_widths,
    output_wh: Tuple[int, int],
    mode: str = "bilinear",
    pad_val: float = 0.0,
):
    """Inverse of the crop: paste a cropped image back at original-image
    coordinates (reference: batch_crop_opencv_affine uncrop branch :195-201).

    :param cropped: (B, oh, ow, C) crop-space image; returns (B, UH, UW, C).
    """
    ow, oh = float(output_wh[0]), float(output_wh[1])
    # forward (uncrop) affine: dst = s·src + t, s = bwh/owh
    sx = bbox_widths / ow
    sy = bbox_heights / oh
    tx = bbox_centres[:, 1] - sx * (ow * 0.5)
    ty = bbox_centres[:, 0] - sy * (oh * 0.5)

    uw, uh = int(uncrop_wh[0]), int(uncrop_wh[1])
    xs = jnp.arange(uw, dtype=jnp.float32)
    ys = jnp.arange(uh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    src_x = (gx[None] + 0.5 - tx[:, None, None]) / sx[:, None, None] - 0.5
    src_y = (gy[None] + 0.5 - ty[:, None, None]) / sy[:, None, None] - 0.5
    return _affine_sample(cropped, src_x, src_y, mode, pad_val)
