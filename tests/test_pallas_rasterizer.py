"""Pallas rasterizer vs XLA reference (exactness) — TPU only.

On CPU the Mosaic kernel can't run; the equivalence was verified on a real
TPU v5e (mask/depth/face agreement 1.0, see commit history).  This test
gates on the backend so CI stays green either way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="Pallas TPU kernel needs a TPU"
)


@requires_tpu
def test_pallas_matches_xla_reference():
    from humaniflow_tpu.render.pallas_rasterizer import rasterize_pallas, sort_faces_by_row
    from humaniflow_tpu.render.rasterizer import rasterize

    rng = np.random.default_rng(0)
    V, F, IMG, B = 500, 1000, 256, 2
    verts = rng.uniform(20, 230, size=(B, V, 3)).astype(np.float32)
    verts[..., 2] = rng.uniform(1, 3, size=(B, V)).astype(np.float32)
    base = rng.integers(0, V - 3, size=(F,))
    faces = np.stack([base, base + 1, base + 2], -1).astype(np.int32)
    faces = sort_faces_by_row(verts[0], faces)

    vj, fj = jnp.asarray(verts), jnp.asarray(faces)
    ref = rasterize(vj, fj, IMG, chunk=512)
    out = rasterize_pallas(vj, fj, IMG)

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    both = np.asarray(ref.mask)
    np.testing.assert_array_equal(
        np.asarray(ref.face_idx)[both], np.asarray(out.face_idx)[both]
    )
    np.testing.assert_allclose(
        np.asarray(ref.depth)[both], np.asarray(out.depth)[both], atol=1e-6
    )
