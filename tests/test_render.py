"""Rasterizer + renderer tests: coverage, z-ordering, barycentric interp,
IUV semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.render import (
    TexturedIUVRenderer,
    interpolate_face_attributes,
    project_orthographic_screen,
    rasterize,
)

IMG = 32


def _square_mesh(z=1.0, lo=8.0, hi=24.0):
    """Two triangles covering [lo, hi]² at depth z (screen coords)."""
    verts = jnp.asarray(
        [[lo, lo, z], [hi, lo, z], [hi, hi, z], [lo, hi, z]], jnp.float32
    )[None]
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


class TestRasterize:
    def test_coverage(self):
        verts, faces = _square_mesh()
        frags = rasterize(verts, faces, IMG, chunk=8)
        mask = np.asarray(frags.mask[0])
        assert mask[16, 16]
        assert not mask[2, 2] and not mask[30, 30]
        # covered area ≈ 16x16 square
        assert abs(mask.sum() - 256) < 40

    def test_z_ordering(self):
        # near square (z=1) in front of far square (z=2), offset
        v1, f1 = _square_mesh(z=1.0, lo=8, hi=20)
        v2, _ = _square_mesh(z=2.0, lo=12, hi=28)
        verts = jnp.concatenate([v1, v2], axis=1)
        faces = jnp.concatenate([f1, f1 + 4], axis=0)
        frags = rasterize(verts, faces, IMG, chunk=2)
        fidx = np.asarray(frags.face_idx[0])
        assert fidx[14, 14] in (0, 1)      # near-square region
        assert fidx[25, 25] in (2, 3)      # far-only region
        assert fidx[16, 16] in (0, 1)      # overlap → near square wins
        np.testing.assert_allclose(np.asarray(frags.depth[0])[16, 16], 1.0, atol=1e-5)

    def test_winding_insensitive(self):
        verts, _ = _square_mesh()
        faces_cw = jnp.asarray([[0, 2, 1], [0, 3, 2]], jnp.int32)
        frags = rasterize(verts, faces_cw, IMG, chunk=8)
        assert np.asarray(frags.mask[0])[16, 16]

    def test_barycentric_interpolation(self):
        verts, faces = _square_mesh()
        frags = rasterize(verts, faces, IMG, chunk=8)
        # attribute = x coordinate → interpolation must reproduce pixel x
        attrs = verts[0, :, 0:1]
        interp = interpolate_face_attributes(frags, faces, attrs)
        got = np.asarray(interp[0, 16, 20, 0])
        np.testing.assert_allclose(got, 20.5, atol=0.01)

    def test_empty_scene(self):
        verts = jnp.full((1, 3, 3), -100.0)
        faces = jnp.asarray([[0, 1, 2]], jnp.int32)
        frags = rasterize(verts, faces, IMG, chunk=4)
        assert not np.asarray(frags.mask).any()


class TestOrthographicScreen:
    def test_projection_convention(self):
        verts = jnp.asarray([[[0.0, 0.0, 2.0]]], jnp.float32)
        cam = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        screen = project_orthographic_screen(verts, cam, 64)
        np.testing.assert_allclose(np.asarray(screen[0, 0]), [32.0, 32.0, 2.0], atol=1e-5)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("humaniflow_tpu.configs.paths", fromlist=["DENSEPOSE_UV"]).DENSEPOSE_UV
    ),
    reason="UV_Processed.mat not available",
)
class TestIUVRenderer:
    def test_silhouette_and_iuv(self):
        renderer = TexturedIUVRenderer(img_wh=48, projection_type="orthographic",
                                       render_rgb=False, chunk=4096)
        # a crude body: random blob of vertices near the origin
        rng = np.random.default_rng(0)
        verts = jnp.asarray(rng.normal(scale=0.3, size=(1, 6890, 3)), jnp.float32)
        out = renderer(
            verts,
            cam_t=jnp.asarray([[0.0, 0.0, 2.5]], jnp.float32),
            orthographic_scale=jnp.asarray([[0.9, 0.9]], jnp.float32),
        )
        sil = np.asarray(out["silhouettes"][0])
        assert sil.sum() > 10  # something rendered
        iuv = np.asarray(out["iuv_images"][0])
        parts = np.unique(iuv[..., 0][sil > 0])
        assert parts.min() >= 1 and parts.max() <= 24
        assert (iuv[..., 1:][sil > 0] >= 0).all() and (iuv[..., 1:][sil > 0] <= 1).all()

    def test_rgb_render_with_texture(self):
        renderer = TexturedIUVRenderer(img_wh=32, projection_type="orthographic",
                                       render_rgb=True, chunk=4096)
        rng = np.random.default_rng(1)
        verts = jnp.asarray(rng.normal(scale=0.3, size=(1, 6890, 3)), jnp.float32)
        tex = jnp.asarray(rng.uniform(size=(1, 1200, 800, 3)), jnp.float32)
        out = renderer(
            verts,
            cam_t=jnp.asarray([[0.0, 0.0, 2.5]], jnp.float32),
            orthographic_scale=jnp.asarray([[0.9, 0.9]], jnp.float32),
            textures=tex,
        )
        rgb = np.asarray(out["rgb_images"][0])
        assert rgb.shape == (32, 32, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        mask = np.asarray(out["silhouettes"][0]) > 0
        assert rgb[mask].max() > 0
