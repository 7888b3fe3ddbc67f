"""Differentiable mesh rasterization on TPU (pure XLA).

The reference's one hard native dependency is pytorch3d's C++/CUDA rasterizer
(utils/renderers/pytorch3d_textured_renderer.py, SURVEY.md §2.5).  This is a
TPU-native replacement: a z-buffered barycentric rasterizer expressed as a
`lax.scan` over fixed-size face chunks with a running per-pixel (depth, face,
barycentrics) minimum — static shapes, no scatter, no atomics, vmapped over
the batch.  faces_per_pixel=1 and no blur, exactly the reference's
rasterization settings (its bin_size heuristics are irrelevant here).

Complexity is O(F·H·W) per image like any brute-force rasterizer; at SMPL
scale (13 774 faces, 256²) one image is ~35 GFLOP of VPU work — fine for
eval/visualisation batches.  A Pallas tile-binned kernel is the planned fast
path for the training-data-generation loop.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG_DEPTH = 1e9


class Fragments(NamedTuple):
    face_idx: jax.Array   # (B, H, W) int32, -1 where no face hit
    bary: jax.Array       # (B, H, W, 3) barycentrics of the hit
    depth: jax.Array      # (B, H, W) hit depth (BIG_DEPTH where empty)

    @property
    def mask(self):
        return self.face_idx >= 0


@partial(jax.jit, static_argnames=("image_size", "chunk"))
def rasterize(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: int,
    chunk: int = 1024,
) -> Fragments:
    """Rasterize batched meshes already projected to screen space.

    :param verts_screen: (B, V, 3) — (x_px, y_px, depth); x=cols, y=rows,
        smaller depth = closer.
    :param faces: (F, 3) int32 vertex indices.
    """
    h = w = image_size
    f = faces.shape[0]
    num_chunks = (f + chunk - 1) // chunk
    pad = num_chunks * chunk - f
    # padding faces are degenerate (vertex 0 thrice) → zero area → rejected
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
    face_ids = jnp.concatenate(
        [jnp.arange(f, dtype=jnp.int32), jnp.full((pad,), -1, jnp.int32)]
    )
    faces_c = faces_p.reshape(num_chunks, chunk, 3)
    ids_c = face_ids.reshape(num_chunks, chunk)

    px = jnp.arange(w, dtype=jnp.float32) + 0.5
    py = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx = px[None, :]  # (1, W)
    gy = py[:, None]  # (H, 1)

    def raster_one(verts):
        def body(state, xs):
            best_depth, best_face, best_bary = state
            face_chunk, id_chunk = xs
            tri = verts[face_chunk]  # (C, 3, 3)
            x0, y0, z0 = tri[:, 0, 0], tri[:, 0, 1], tri[:, 0, 2]
            x1, y1, z1 = tri[:, 1, 0], tri[:, 1, 1], tri[:, 1, 2]
            x2, y2, z2 = tri[:, 2, 0], tri[:, 2, 1], tri[:, 2, 2]

            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)  # (C,)
            valid = (jnp.abs(area) > 1e-9) & (id_chunk >= 0)
            inv_area = jnp.where(valid, 1.0, 0.0) / jnp.where(valid, area, 1.0)

            # edge functions at every pixel → barycentrics: (C, H, W)
            w0 = (
                (x2 - x1)[:, None, None] * (gy - y1[:, None, None])
                - (y2 - y1)[:, None, None] * (gx - x1[:, None, None])
            ) * inv_area[:, None, None]
            w1 = (
                (x0 - x2)[:, None, None] * (gy - y2[:, None, None])
                - (y0 - y2)[:, None, None] * (gx - x2[:, None, None])
            ) * inv_area[:, None, None]
            w2 = 1.0 - w0 - w1
            # double-sided coverage: either all-nonneg or all-nonpos
            # barycentrics after normalisation by the signed area come out
            # non-negative exactly when the pixel is inside
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & valid[:, None, None]
            z = (
                w0 * z0[:, None, None]
                + w1 * z1[:, None, None]
                + w2 * z2[:, None, None]
            )
            z = jnp.where(inside, z, BIG_DEPTH)

            # nearest hit within the chunk (C-axis), then merge with best.
            # Winner extraction via one-hot masked sums: measured 2.8x faster
            # than argmin + take_along_axis gathers inside the fused render
            # pipeline on TPU (172 vs 475 ms for the full B=8 IUV+RGB render).
            zmin = jnp.min(z, axis=0)               # (H, W)
            take = zmin < best_depth
            at_min = (z <= zmin[None]) & inside
            c_iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
            min_idx = jnp.min(jnp.where(at_min, c_iota, z.shape[0]), axis=0)
            first = (at_min & (c_iota == min_idx[None])).astype(z.dtype)
            cand_bary = jnp.stack(
                [jnp.sum(first * w0, 0), jnp.sum(first * w1, 0), jnp.sum(first * w2, 0)],
                axis=-1,
            )
            cand_face = jnp.sum(
                first * id_chunk[:, None, None].astype(z.dtype), axis=0
            ).astype(jnp.int32)
            return (
                jnp.where(take, zmin, best_depth),
                jnp.where(take, cand_face, best_face),
                jnp.where(take[..., None], cand_bary, best_bary),
            ), None

        init = (
            jnp.full((h, w), BIG_DEPTH, jnp.float32),
            jnp.full((h, w), -1, jnp.int32),
            jnp.zeros((h, w, 3), jnp.float32),
        )
        (depth, face_idx, bary), _ = jax.lax.scan(body, init, (faces_c, ids_c))
        return face_idx, bary, depth

    face_idx, bary, depth = jax.vmap(raster_one)(verts_screen)
    return Fragments(face_idx=face_idx, bary=bary, depth=depth)


@partial(jax.jit, static_argnames=("image_size", "chunk"))
def rasterize_coverage(
    verts_screen: jax.Array,
    faces: jax.Array,
    image_size: int,
    chunk: int = 2048,
) -> jax.Array:
    """Coverage-only rasterization: per-pixel any-face-covers mask.

    ~5x cheaper than full z-buffered rasterization (no depth interpolation,
    no winner extraction) — the silhouette hot path for eval IOU, where the
    reference renders full IUV images per sample (evaluate_humaniflow.py:218).

    :return: (B, H, W) bool coverage mask.
    """
    h = w = image_size
    f = faces.shape[0]
    num_chunks = (f + chunk - 1) // chunk
    pad = num_chunks * chunk - f
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
    valid_p = (jnp.arange(num_chunks * chunk) < f).reshape(num_chunks, chunk)
    faces_c = faces_p.reshape(num_chunks, chunk, 3)

    px = jnp.arange(w, dtype=jnp.float32) + 0.5
    py = jnp.arange(h, dtype=jnp.float32) + 0.5
    gx = px[None, :]
    gy = py[:, None]

    def one(verts):
        def body(mask, xs):
            face_chunk, valid = xs
            tri = verts[face_chunk]
            x0, y0 = tri[:, 0, 0], tri[:, 0, 1]
            x1, y1 = tri[:, 1, 0], tri[:, 1, 1]
            x2, y2 = tri[:, 2, 0], tri[:, 2, 1]
            area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
            va = (jnp.abs(area) > 1e-9) & valid
            inv = jnp.where(va, 1.0, 0.0) / jnp.where(va, area, 1.0)
            w0 = (
                (x2 - x1)[:, None, None] * (gy - y1[:, None, None])
                - (y2 - y1)[:, None, None] * (gx - x1[:, None, None])
            ) * inv[:, None, None]
            w1 = (
                (x0 - x2)[:, None, None] * (gy - y2[:, None, None])
                - (y0 - y2)[:, None, None] * (gx - x2[:, None, None])
            ) * inv[:, None, None]
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & va[:, None, None]
            return mask | jnp.any(inside, axis=0), None

        m0 = jnp.zeros((h, w), bool)
        m, _ = jax.lax.scan(body, m0, (faces_c, valid_p))
        return m

    return jax.vmap(one)(verts_screen)


def project_orthographic_screen(
    verts: jax.Array, cam_wp: jax.Array, image_size: int
) -> jax.Array:
    """Weak-perspective camera → screen coords, consistent with the 2D-joint
    projection convention (ops/camera.orthographic_project +
    undo_keypoint_normalisation): px = (s·(X + t) + 1)·wh/2, y down.

    :param verts: (B, V, 3) already in the renderer's frame (callers apply
        the x-axis-π flip, as the reference does before silhouette renders,
        evaluate_humaniflow.py:145-148).
    :param cam_wp: (B, 3) — (scale, tx, ty).
    """
    s = cam_wp[:, None, 0:1]
    t = cam_wp[:, None, 1:3]
    xy = (s * (verts[..., :2] + t) + 1.0) * (image_size / 2.0)
    return jnp.concatenate([xy, verts[..., 2:3]], axis=-1)


def project_perspective_screen(
    verts: jax.Array, cam_t: jax.Array, focal_length: float, image_size: int
) -> jax.Array:
    """Pinhole camera at translation cam_t (reference training renders use
    focal 300, principal point at the image centre)."""
    v = verts + cam_t[:, None, :]
    z = jnp.maximum(v[..., 2:3], 1e-6)
    xy = v[..., :2] / z * focal_length + image_size / 2.0
    return jnp.concatenate([xy, v[..., 2:3]], axis=-1)


def interpolate_face_attributes(
    fragments: Fragments, faces: jax.Array, vert_attrs: jax.Array
) -> jax.Array:
    """Barycentric interpolation of per-vertex attributes at hit pixels.

    :param vert_attrs: (B, V, D) or (V, D) shared attributes.
    :return: (B, H, W, D), zeros where no face.
    """
    fidx = jnp.maximum(fragments.face_idx, 0)  # (B, H, W)
    tri = faces[fidx]  # (B, H, W, 3)
    if vert_attrs.ndim == 2:
        attr = vert_attrs[tri]  # (B, H, W, 3, D)
    else:
        attr = jax.vmap(lambda va, t: va[t])(vert_attrs, tri)
    out = jnp.einsum("...k,...kd->...d", fragments.bary, attr)
    return jnp.where(fragments.mask[..., None], out, 0.0)


def face_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """(B, F, 3) unit face normals."""
    tri = verts[:, faces]  # (B, F, 3, 3)
    n = jnp.cross(tri[:, :, 1] - tri[:, :, 0], tri[:, :, 2] - tri[:, :, 0])
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
