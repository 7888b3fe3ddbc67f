"""Fused Pallas LBS kernel vs XLA contraction (exactness) — TPU only.

On CPU the Mosaic kernel can't run; smpl_forward takes the equivalent XLA
branch there (covered by tests/test_smpl.py).  Agreement was verified on a
real TPU v5e: max abs diff 0.0 vs the HIGHEST-precision XLA contraction at
B=37, V=6890 (padding exercised on both grid axes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="Pallas TPU kernel needs a TPU"
)


@requires_tpu
def test_pallas_lbs_matches_xla():
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.pallas_lbs import lbs_skin_pallas_cm

    hi = jax.lax.Precision.HIGHEST
    smpl = synthetic_smpl(num_verts=6890)
    # B not a multiple of BATCH_BLOCK, V not of VERT_TILE: exercises padding
    b, v = 37, 6890
    rng = np.random.default_rng(1)
    a12 = jnp.asarray(rng.normal(scale=0.5, size=(b, 24, 12)), jnp.float32)
    posed = jnp.asarray(rng.normal(size=(b, 3, v)), jnp.float32)

    got = lbs_skin_pallas_cm(smpl.lbs_weights, a12, posed)

    t12 = jnp.einsum("vj,bjc->bcv", smpl.lbs_weights, a12, precision=hi)
    want = jnp.stack(
        [
            t12[:, 3 * i] * posed[:, 0]
            + t12[:, 3 * i + 1] * posed[:, 1]
            + t12[:, 3 * i + 2] * posed[:, 2]
            + t12[:, 9 + i]
            for i in range(3)
        ],
        axis=1,
    )
    assert got.shape == (b, 3, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
