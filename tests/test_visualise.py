"""Visualisation utility tests (figure composition shapes, colourmap,
uncrop compositing) — uses the tiny-resolution renderer on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.configs import paths
from humaniflow_tpu.utils.visualise import (
    annotate_joints2d,
    plot_xyz_vertex_variance,
    rotated_vertex_views,
    uncertainty_colourmap,
    uncrop_point_est_visualisation,
)

needs_uv = pytest.mark.skipif(
    not os.path.exists(paths.DENSEPOSE_UV), reason="UV_Processed.mat missing"
)


def test_uncertainty_colourmap():
    c = uncertainty_colourmap(np.linspace(0, 0.2, 10))
    assert c.shape == (10, 3)
    assert c.min() >= 0 and c.max() <= 1
    # low uncertainty → blue-ish; high → red-ish
    assert c[0, 2] > c[0, 0]
    assert c[-1, 0] > c[-1, 2]


def test_rotated_views():
    verts = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 3)), jnp.float32)
    views = rotated_vertex_views(verts)
    assert set(views) == {"0", "90", "180", "270"}
    # 180° view flips x and z about the y axis
    v180 = np.asarray(views["180"])
    np.testing.assert_allclose(v180[..., 1], np.asarray(verts)[..., 1], atol=1e-5)
    np.testing.assert_allclose(v180[..., 0], -np.asarray(verts)[..., 0], atol=1e-4)


def test_annotate_joints2d():
    img = np.zeros((32, 32, 3), np.float32)
    out = annotate_joints2d(img, np.array([[16.0, 16.0], [100.0, 100.0]]))
    assert out[16, 16].max() > 0.5  # keypoint drawn
    assert out.shape == img.shape


def test_uncrop_composites_render():
    render = np.zeros((1, 16, 16, 3), np.float32)
    render[0, 4:12, 4:12] = 1.0
    sil = np.zeros((1, 16, 16), np.float32)
    sil[0, 4:12, 4:12] = 1.0
    orig = np.full((1, 64, 64, 3), 0.25, np.float32)
    out = uncrop_point_est_visualisation(
        render, sil, np.array([[32.0, 32.0]]), np.array([32.0]), orig,
        bbox_scale_factor=1.0,
    )
    assert out.shape == (1, 64, 64, 3)
    # centre shows the render, corners keep the original
    assert out[0, 32, 32].max() > 0.9
    np.testing.assert_allclose(out[0, 2, 2], 0.25, atol=1e-6)


def test_plot_xyz_vertex_variance(tmp_path):
    verts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    var = np.abs(np.random.default_rng(1).normal(size=(50, 3))).astype(np.float32)
    p = str(tmp_path / "var.png")
    plot_xyz_vertex_variance(verts, var, save_path=p)
    assert os.path.getsize(p) > 1000


@needs_uv
def test_render_point_est_visualisation_shapes():
    from humaniflow_tpu.render import TexturedIUVRenderer
    from humaniflow_tpu.utils.visualise import render_point_est_visualisation

    renderer = TexturedIUVRenderer(img_wh=32, projection_type="orthographic",
                                   render_rgb=True, chunk=4096)
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(scale=0.3, size=(1, 6890, 3)), jnp.float32)
    cam = jnp.asarray([[0.9, 0.0, 0.0]], jnp.float32)
    out = render_point_est_visualisation(
        renderer, verts, cam,
        input_image=rng.uniform(size=(1, 32, 32, 3)).astype(np.float32),
    )
    # input + 4 rotated views
    assert out["figure"].shape == (1, 32, 32 * 5, 3)
    assert np.isfinite(out["figure"]).all()
