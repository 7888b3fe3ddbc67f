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


@requires_tpu
def test_smpl_verts_fused_matches_split_pipeline():
    """Fully-fused blendshapes+skinning kernel vs the split XLA math
    (template + shape/pose blendshapes + skinning as separate HBM tensors).
    Precision study vs an f64 oracle lives in pallas_lbs.py's notes:
    HIGHEST/HIGHEST is 0.0006 mm max vertex error at B·N=3200."""
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.pallas_lbs import smpl_verts_fused

    hi = jax.lax.Precision.HIGHEST
    smpl = synthetic_smpl(num_verts=6890)
    b, v = 150, 6890  # not multiples of the fused block sizes
    rng = np.random.default_rng(2)
    a12 = jnp.asarray(rng.normal(scale=0.5, size=(b, 24, 12)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(b, 10)), jnp.float32)
    pf = jnp.asarray(rng.normal(scale=0.3, size=(b, 207)), jnp.float32)
    sd = jnp.transpose(smpl.shapedirs, (1, 0, 2))
    vt = smpl.v_template.T

    got = smpl_verts_fused(smpl.lbs_weights, a12, betas, pf, vt, sd, smpl.posedirs)

    pd_cm = smpl.posedirs.reshape(-1, v, 3).transpose(0, 2, 1).reshape(-1, 3 * v)
    posed = (
        vt
        + jnp.einsum("bl,cvl->bcv", betas, sd, precision=hi)
        + jnp.matmul(pf, pd_cm, precision=hi).reshape(b, 3, v)
    )
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
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@requires_tpu
def test_smpl_verts_fused_gradients():
    """The custom VJP's XLA adjoints match autodiff of the split math."""
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.pallas_lbs import smpl_verts_fused

    hi = jax.lax.Precision.HIGHEST
    smpl = synthetic_smpl(num_verts=6890)
    b, v = 8, 6890
    rng = np.random.default_rng(3)
    a12 = jnp.asarray(rng.normal(scale=0.5, size=(b, 24, 12)), jnp.float32)
    betas = jnp.asarray(rng.normal(size=(b, 10)), jnp.float32)
    pf = jnp.asarray(rng.normal(scale=0.3, size=(b, 207)), jnp.float32)
    sd = jnp.transpose(smpl.shapedirs, (1, 0, 2))
    vt = smpl.v_template.T
    cot = jnp.asarray(rng.normal(size=(b, 3, v)), jnp.float32)

    def fused(a, be, p):
        return jnp.sum(
            smpl_verts_fused(smpl.lbs_weights, a, be, p, vt, sd, smpl.posedirs) * cot
        )

    pd_cm = smpl.posedirs.reshape(-1, v, 3).transpose(0, 2, 1).reshape(-1, 3 * v)

    def split(a, be, p):
        posed = (
            vt
            + jnp.einsum("bl,cvl->bcv", be, sd, precision=hi)
            + jnp.matmul(p, pd_cm, precision=hi).reshape(b, 3, v)
        )
        t12 = jnp.einsum("vj,bjc->bcv", smpl.lbs_weights, a, precision=hi)
        out = jnp.stack(
            [
                t12[:, 3 * i] * posed[:, 0]
                + t12[:, 3 * i + 1] * posed[:, 1]
                + t12[:, 3 * i + 2] * posed[:, 2]
                + t12[:, 9 + i]
                for i in range(3)
            ],
            axis=1,
        )
        return jnp.sum(out * cot)

    g_fused = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(a12, betas, pf)
    g_split = jax.jit(jax.grad(split, argnums=(0, 1, 2)))(a12, betas, pf)
    for gf, gs in zip(g_fused, g_split):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs), rtol=1e-4, atol=1e-4)


@requires_tpu
def test_smpl_vertex_moments_kernel_matches_xla_reduction():
    """In-kernel sample-axis moment reduction (smpl_verts_moments_fused via
    smpl_vertex_moments) vs reducing the XLA forward's vertices.  Verified
    on TPU v5e at G=32, N=100: rel err ≤ 3e-7, 6.9 ms vs 8.4 ms for
    fused-verts + XLA reduce (the (G·N, 3, V) tensor never hits HBM)."""
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.smpl import smpl_forward, smpl_vertex_moments
    from humaniflow_tpu.ops.so3 import so3_exp

    smpl = synthetic_smpl(num_verts=6890)
    g, n = 5, 37  # N not a multiple of the sublane 8: exercises row padding
    b = g * n
    rng = np.random.default_rng(11)
    betas = jnp.asarray(rng.normal(scale=0.5, size=(b, 10)), jnp.float32)
    aa = jnp.asarray(rng.normal(scale=0.4, size=(b * 24, 3)), jnp.float32)
    rots = so3_exp(aa).reshape(b, 24, 3, 3)
    body, glob = rots[:, 1:], rots[:, 0]

    mom = jax.jit(
        lambda be, bp, gl: smpl_vertex_moments(smpl, be, bp, gl, num_groups=g)
    )(betas, body, glob)

    v = smpl_forward(smpl, betas, body, glob)["vertices_cm"].reshape(g, n, 3, 6890)
    want_s1, want_s2 = v.sum(axis=1), (v * v).sum(axis=1)
    np.testing.assert_allclose(
        np.asarray(mom[:, 0]), np.asarray(want_s1), rtol=1e-5, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(mom[:, 1]), np.asarray(want_s2), rtol=1e-5, atol=5e-5
    )
