"""Visualisation: multi-panel point-estimate figures, uncropped composites,
sample grids, per-vertex-uncertainty scatter plots.

Capability parity with reference `utils/visualise_utils.py:12-213`
(render_point_est_visualisation :12, uncrop_point_est_visualisation :110,
render_samples_visualisation :136, plot_xyz_vertex_variance :180).  Mesh
renders come from the TPU renderer; figure composition is host-side numpy
(matplotlib only for the variance scatter), outside the jit graph by design.
"""

import math
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ..data.image_ops import batch_uncrop_affine
from ..ops.rotation import aa_rotate_translate_points


def uncertainty_colourmap(values: np.ndarray, vmin=0.0, vmax=0.2) -> np.ndarray:
    """Jet-like colourmap for per-vertex uncertainty (values (V,)) → (V, 3)."""
    t = np.clip((values - vmin) / max(vmax - vmin, 1e-9), 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * t - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * t - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * t - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def rotated_vertex_views(vertices, angles_deg=(90, 180, 270)):
    """Dict of y-axis rotated vertex sets for multi-view renders
    (reference: visualise_utils.py / optimise_humaniflow.py:166-170)."""
    views = {"0": vertices}
    y_axis = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    zero_t = jnp.zeros(3, jnp.float32)
    for rot in angles_deg:
        views[str(rot)] = aa_rotate_translate_points(
            vertices, y_axis, -math.radians(rot), zero_t
        )
    return views


def annotate_joints2d(image: np.ndarray, joints2d: np.ndarray,
                      confs: Optional[np.ndarray] = None,
                      radius: int = 3) -> np.ndarray:
    """Draw keypoints on an image (host-side, cv2 if available)."""
    try:
        import cv2
    except Exception:
        return image
    img = np.ascontiguousarray((image * 255).astype(np.uint8))
    for j, (x, y) in enumerate(np.asarray(joints2d)):
        if confs is not None and confs[j] < 0.3:
            continue
        if 0 <= int(x) < img.shape[1] and 0 <= int(y) < img.shape[0]:
            cv2.circle(img, (int(x), int(y)), radius, (255, 60, 60), -1)
    return img.astype(np.float32) / 255.0


def render_point_est_visualisation(
    renderer,
    vertices_point_est,
    cam_wp,
    input_image: Optional[np.ndarray] = None,
    proxy_image: Optional[np.ndarray] = None,
    joints2d: Optional[np.ndarray] = None,
    joints2d_confs: Optional[np.ndarray] = None,
    tpose_vertices: Optional[np.ndarray] = None,
    vertex_colours: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Multi-panel point-estimate figure: input | annotated proxy | 0/90/180/
    270° renders | T-pose (reference: visualise_utils.py:12-107).

    :return: dict with 'figure' (B, H, W*num_panels, 3) plus the raw renders.
    """
    b = vertices_point_est.shape[0]
    cam_t = jnp.stack(
        [cam_wp[:, 1], cam_wp[:, 2], jnp.full_like(cam_wp[:, 0], 2.5)], axis=-1
    )
    scale = cam_wp[:, [0, 0]]
    views = rotated_vertex_views(vertices_point_est)

    panels: List[np.ndarray] = []
    if input_image is not None:
        panels.append(np.asarray(input_image))
    if proxy_image is not None:
        proxy_rgb = np.repeat(np.asarray(proxy_image)[..., None], 3, axis=-1)
        if joints2d is not None:
            proxy_rgb = np.stack(
                [
                    annotate_joints2d(proxy_rgb[i], joints2d[i],
                                      None if joints2d_confs is None else joints2d_confs[i])
                    for i in range(b)
                ]
            )
        panels.append(proxy_rgb)

    renders = {}
    vf = None if vertex_colours is None else jnp.asarray(vertex_colours)
    for name, verts in views.items():
        out = renderer(verts, cam_t=cam_t, orthographic_scale=scale,
                       verts_features=vf if vf is not None else jnp.ones_like(verts) * 0.75)
        renders[name] = np.asarray(out["rgb_images"])
        panels.append(renders[name])
    if tpose_vertices is not None:
        fixed_cam_t = jnp.tile(jnp.asarray([[0.0, -0.2, 2.5]]), (b, 1))
        fixed_scale = jnp.full((b, 2), 0.95)
        out = renderer(tpose_vertices, cam_t=fixed_cam_t,
                       orthographic_scale=fixed_scale,
                       verts_features=vf if vf is not None else jnp.ones_like(tpose_vertices) * 0.75)
        renders["tpose"] = np.asarray(out["rgb_images"])
        panels.append(renders["tpose"])

    figure = np.concatenate(panels, axis=2)
    return {"figure": figure, "renders": renders}


def uncrop_point_est_visualisation(
    cropped_render_rgb,
    cropped_silhouette,
    bbox_centres,
    bbox_whs,
    orig_image: np.ndarray,
    bbox_scale_factor: float = 1.2,
) -> np.ndarray:
    """Composite a cropped mesh render back onto the original image
    (reference: visualise_utils.py:110-133)."""
    uh, uw = orig_image.shape[1:3]
    whs = jnp.asarray(bbox_whs) * bbox_scale_factor
    rgb_uncrop = batch_uncrop_affine(
        jnp.asarray(cropped_render_rgb), (uw, uh), jnp.asarray(bbox_centres),
        whs, whs, cropped_render_rgb.shape[1:3][::-1],
    )
    sil_uncrop = batch_uncrop_affine(
        jnp.asarray(cropped_silhouette)[..., None], (uw, uh),
        jnp.asarray(bbox_centres), whs, whs,
        cropped_silhouette.shape[1:3][::-1], mode="nearest",
    )
    mask = np.asarray(sil_uncrop) > 0.5
    return np.where(mask, np.asarray(rgb_uncrop), np.asarray(orig_image))


def render_samples_visualisation(
    renderer,
    vertices_samples,
    cam_wp,
    num_rows: int = 3,
    num_cols: int = 6,
) -> np.ndarray:
    """Grid of mesh-sample renders (reference: visualise_utils.py:136-177).

    :param vertices_samples: (N, V, 3) J2D-error-sorted samples.
    :return: (rows*wh, cols*wh, 3)
    """
    n = min(num_rows * num_cols, vertices_samples.shape[0])
    verts = jnp.asarray(vertices_samples[:n])
    cam_t = jnp.tile(
        jnp.asarray([[float(cam_wp[0, 1]), float(cam_wp[0, 2]), 2.5]]), (n, 1)
    )
    scale = jnp.tile(jnp.asarray([[float(cam_wp[0, 0])] * 2]), (n, 1))
    out = renderer(verts, cam_t=cam_t, orthographic_scale=scale,
                   verts_features=jnp.ones_like(verts) * 0.75)
    renders = np.asarray(out["rgb_images"])  # (n, wh, wh, 3)
    wh = renders.shape[1]
    grid = np.zeros((num_rows * wh, num_cols * wh, 3), np.float32)
    for i in range(n):
        r, c = divmod(i, num_cols)
        grid[r * wh : (r + 1) * wh, c * wh : (c + 1) * wh] = renders[i]
    return grid


def plot_xyz_vertex_variance(
    vertices_point_est: np.ndarray,
    directional_variance: np.ndarray,
    save_path: Optional[str] = None,
):
    """Matplotlib scatter of per-vertex directional std in x/y/z panels
    (reference: visualise_utils.py:180-213)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    verts = np.asarray(vertices_point_est)
    var = np.asarray(directional_variance)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for d, name in enumerate("xyz"):
        sc = axes[d].scatter(
            verts[:, 0], -verts[:, 1], c=var[:, d], s=1, cmap="jet"
        )
        axes[d].set_title(f"{name} std")
        axes[d].set_aspect("equal")
        fig.colorbar(sc, ax=axes[d])
    if save_path is not None:
        fig.savefig(save_path, dpi=100, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig
