"""Batched image-space ops: bbox handling, affine crop/uncrop, background
compositing.

Capability parity with reference `utils/image_utils.py`
(bbox converters :7-45, batch_add_rgb_background :48, batch_crop_opencv_affine
:62 and batch_crop_pytorch_affine :234 including uncropping).  TPU-first:

* one separable matmul-based bilinear/nearest affine sampler replaces both
  the per-image cv2.warpAffine loop and torch affine_grid/grid_sample —
  sampling coordinates are derived in pixel space to match torch's
  align_corners=False semantics exactly (half-pixel centres), and the
  axis-aligned warp runs as two batched MXU einsums instead of per-pixel
  gathers (docs/DESIGN.md "Crop/uncrop resampling");
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


def _interp_matrix(src, size: int, mode: str):
    """Per-batch 1-D resampling matrix M (B, O, size) with M[b, o, i] the
    weight of source index i for output o, plus the in-range mask (B, O).

    Out-of-range taps get zero rows (== contribute pad 0); nearest keeps
    jnp.round's semantics exactly.
    """
    ar = jnp.arange(size, dtype=jnp.int32)
    if mode == "nearest":
        idx = jnp.round(src).astype(jnp.int32)  # (B, O)
        valid = (idx >= 0) & (idx < size)
        m = (idx[..., None] == ar).astype(jnp.float32)
        return m, valid
    x0f = jnp.floor(src)
    w1 = (src - x0f)[..., None]
    i0 = x0f.astype(jnp.int32)[..., None]
    # equality against the index row drops out-of-range taps for free
    m = (i0 == ar) * (1.0 - w1) + ((i0 + 1) == ar) * w1
    valid = (src >= 0.0) & (src <= size - 1.0)
    return m.astype(jnp.float32), valid


def _separable_sample(img, src_xs, src_ys, mode: str, pad_val: float = 0.0):
    """Axis-aligned affine resample as two batched MXU matmuls.

    The crop/uncrop affines here are scale+translate only, so the 2-D
    interpolation separates into row then column 1-D resampling — two
    einsums instead of 4 gathers per pixel (XLA TPU lowers per-pixel image
    gathers to a latency-bound path: 251 ms/batch at B=72/256² for the
    round-1 gather sampler, vs matmul-fast here; docs/DESIGN.md).

    :param img: (B, H, W, C); :param src_xs: (B, OW); :param src_ys: (B, OH).
    """
    hi = jax.lax.Precision.HIGHEST
    _, h, w, _ = img.shape
    my, vy = _interp_matrix(src_ys, h, mode)  # (B, OH, H)
    mx, vx = _interp_matrix(src_xs, w, mode)  # (B, OW, W)
    tmp = jnp.einsum("boh,bhwc->bowc", my, img, precision=hi)
    out = jnp.einsum("bpw,bowc->bopc", mx, tmp, precision=hi)
    if pad_val != 0.0:
        valid = vy[:, :, None] & vx[:, None, :]
        out = jnp.where(valid[..., None], out, pad_val)
    return out


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
    # src pixel-centre coords (align_corners=False semantics); the affine is
    # axis-aligned so x depends only on the output column and y only on the
    # output row → separable matmul resampling (_separable_sample)
    src_xs = (xs[None] + 0.5 - trans[:, 0, None]) / scale[:, 0, None] - 0.5  # (B, OW)
    src_ys = (ys[None] + 0.5 - trans[:, 1, None]) / scale[:, 1, None] - 0.5  # (B, OH)

    out = {"crop_scale": scale, "crop_trans": trans}
    if iuv is not None:
        out["iuv"] = _separable_sample(iuv, src_xs, src_ys, "nearest", out_of_frame_pad_val)
    if rgb is not None:
        out["rgb"] = _separable_sample(rgb, src_xs, src_ys, "bilinear", 0.0)
    if seg is not None:
        out["seg"] = _separable_sample(seg[..., None], src_xs, src_ys, "nearest", 0.0)[..., 0]
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
    src_xs = (xs[None] + 0.5 - tx[:, None]) / sx[:, None] - 0.5
    src_ys = (ys[None] + 0.5 - ty[:, None]) / sy[:, None] - 0.5
    return _separable_sample(cropped, src_xs, src_ys, mode, pad_val)
