"""Fused linear-blend-skinning Pallas kernel (SURVEY.md §7.5 north-star).

The XLA LBS path materialises the per-vertex transform rows
T12 = W @ A : (B, V, 12) — ~1 GB of HBM traffic at B·N=3200 — then reads
them back to apply to the posed vertices.  This kernel keeps the product in
VMEM: per (batch-block, vertex-tile) instance it computes
Mt = A_bᵀ (12, 24) @ Wᵀ (24, VT) on the MXU and applies it to the vertex
tile in registers, writing only the final (3, VT) vertices.  Traffic is
exactly read(posed) + read(A) + write(verts) ≈ 530 MB at B·N=3200 — the
streaming minimum.

Layout notes (Mosaic constraints): vertices travel as (B, 3, V) so the
vertex axis sits on lanes (V tiles of 512, %128); transform rows travel
pre-transposed as (B, 12, 24); all kernel ops are 2-D.
"""


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sizes tuned for grid overhead: ~1 µs/instance means the grid must be
# small; (32, 1024) blocks use ~1.1 MB VMEM and give a ~700-instance grid at
# SMPL scale (B·N=3200, V=6890).
BATCH_BLOCK = 32
VERT_TILE = 1024


def _lbs_kernel(a_ref, w_ref, posed_ref, out_ref):
    """One (batch-block, vertex-tile) instance.

    a_ref:     (BATCH_BLOCK, 12, 24) — per-joint [R|t] rows, transposed
    w_ref:     (24, VERT_TILE)       — skinning weights, transposed
    posed_ref: (BATCH_BLOCK, 4, VERT_TILE) — posed verts (x, y, z, pad)
    out_ref:   (BATCH_BLOCK, 4, VERT_TILE) — skinned verts (x, y, z, pad)
    """
    w = w_ref[:]  # (24, VT)
    for bi in range(BATCH_BLOCK):
        mt = jnp.dot(
            a_ref[bi], w,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # rotations must stay f32
        )  # (12, VT)
        px = posed_ref[bi, 0:1, :]
        py = posed_ref[bi, 1:2, :]
        pz = posed_ref[bi, 2:3, :]
        # row layout of A: [r00 r01 r02 r10 r11 r12 r20 r21 r22 t0 t1 t2]
        out_ref[bi, 0:1, :] = (
            mt[0:1] * px + mt[1:2] * py + mt[2:3] * pz + mt[9:10]
        )
        out_ref[bi, 1:2, :] = (
            mt[3:4] * px + mt[4:5] * py + mt[5:6] * pz + mt[10:11]
        )
        out_ref[bi, 2:3, :] = (
            mt[6:7] * px + mt[7:8] * py + mt[8:9] * pz + mt[11:12]
        )
        out_ref[bi, 3:4, :] = jnp.zeros_like(px)


@jax.custom_vjp
def lbs_skin_pallas_cm(
    lbs_weights: jax.Array,  # (V, 24)
    a12: jax.Array,          # (B, 24, 12) — per-joint [R(9) | t(3)] rows
    v_posed_cm: jax.Array,   # (B, 3, V) channel-major posed vertices
) -> jax.Array:
    """Fused LBS on channel-major vertices: returns (B, 3, V) skinned verts.

    Channel-major avoids any transpose of the large vertex tensors — the
    producers (blend shapes) write (B, 3, V) natively and only the final
    consumer-facing output transposes once.

    The op is bilinear in (a12, v_posed) — the custom VJP below evaluates
    the exact adjoints as XLA einsums (training batches are ~72, where the
    (B, 12, V) intermediates the forward kernel avoids are only ~24 MB;
    the B·N=3200 inference path never differentiates).
    """
    b, _, v = v_posed_cm.shape
    pad_b = (-b) % BATCH_BLOCK
    pad_v = (-v) % VERT_TILE
    bp, vp = b + pad_b, v + pad_v

    w_t = jnp.pad(lbs_weights, ((0, pad_v), (0, 0))).T  # (24, Vp) — small
    a_t = jnp.pad(
        jnp.swapaxes(a12, 1, 2), ((0, pad_b), (0, 0), (0, 0))
    )  # (Bp, 12, 24) — small
    posed_t = jnp.pad(
        v_posed_cm, ((0, pad_b), (0, 1), (0, pad_v))
    )  # (Bp, 4, Vp) — pad row keeps the sublane dim tile-friendly

    grid = (bp // BATCH_BLOCK, vp // VERT_TILE)
    out = pl.pallas_call(
        _lbs_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (BATCH_BLOCK, 12, 24), lambda bi, vi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (24, VERT_TILE), lambda bi, vi: (0, vi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (BATCH_BLOCK, 4, VERT_TILE), lambda bi, vi: (bi, 0, vi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BATCH_BLOCK, 4, VERT_TILE), lambda bi, vi: (bi, 0, vi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, 4, vp), jnp.float32),
    )(a_t, w_t, posed_t)
    return out[:b, :3, :v]


def _lbs_fwd(lbs_weights, a12, v_posed_cm):
    return lbs_skin_pallas_cm(lbs_weights, a12, v_posed_cm), (
        lbs_weights, a12, v_posed_cm,
    )


def _lbs_bwd(res, g):
    """Exact adjoints of out[b,c,v] = Σ_j W[v,j]·(R_j p + t_j) given
    cotangent g (B, 3, V)."""
    w, a12, p = res
    hi = jax.lax.Precision.HIGHEST
    t12 = jnp.einsum("vj,bjr->brv", w, a12, precision=hi)  # (B, 12, V)
    # dL/dp[b,i,v] = Σ_c t12[b, 3c+i, v] · g[b,c,v]
    rot = t12[:, :9].reshape(t12.shape[0], 3, 3, -1)  # (B, c, i, V)
    dp = jnp.einsum("bciv,bcv->biv", rot, g, precision=hi)
    # G12[b,r,v]: r=3c+i → g[b,c,v]·p[b,i,v]; r=9+c → g[b,c,v]
    gp = jnp.einsum("bcv,biv->bciv", g, p, precision=hi).reshape(
        g.shape[0], 9, -1
    )
    g12 = jnp.concatenate([gp, g], axis=1)  # (B, 12, V)
    da = jnp.einsum("brv,vj->bjr", g12, w, precision=hi)  # (B, 24, 12)
    dw = jnp.einsum("brv,bjr->vj", g12, a12, precision=hi)  # (V, 24)
    return dw, da, dp


lbs_skin_pallas_cm.defvjp(_lbs_fwd, _lbs_bwd)
