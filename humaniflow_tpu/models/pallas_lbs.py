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

    All work runs on full (BATCH_BLOCK, VERT_TILE) planes: one MXU dot per
    transform row r gives mt_r = A[:, r, :] @ W (BB, VT), and the apply is
    12 plane FMAs — no per-sample loop (the round-1 kernel looped
    BATCH_BLOCK times over (1, VT) rows, wasting 31/32 sublanes).
    """
    w = w_ref[:]  # (24, VT)
    hi = jax.lax.Precision.HIGHEST  # rotations must stay f32
    mt = [
        jnp.dot(a_ref[:, r, :], w, preferred_element_type=jnp.float32, precision=hi)
        for r in range(12)
    ]  # 12 × (BB, VT)
    px = posed_ref[:, 0, :]
    py = posed_ref[:, 1, :]
    pz = posed_ref[:, 2, :]
    # row layout of A: [r00 r01 r02 r10 r11 r12 r20 r21 r22 t0 t1 t2]
    out_ref[:, 0, :] = mt[0] * px + mt[1] * py + mt[2] * pz + mt[9]
    out_ref[:, 1, :] = mt[3] * px + mt[4] * py + mt[5] * pz + mt[10]
    out_ref[:, 2, :] = mt[6] * px + mt[7] * py + mt[8] * pz + mt[11]
    out_ref[:, 3, :] = jnp.zeros_like(px)


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


# ---------------------------------------------------------------------------
# Fully-fused SMPL vertex kernel: blendshapes + skinning in one pass.
#
# The split pipeline materialises v_shaped, pose_offsets, v_posed and the
# skinned verts as separate (B, 3, V) HBM tensors (265 MB each at B·N=3200)
# — the whole SMPL forward is HBM-bound (~13.5 ms).  This kernel computes
#   verts = LBS(W, A, v_template + shapedirs·β + posedirs·θ)
# per (vertex-tile, batch-block) instance entirely in VMEM and writes ONLY
# the final vertices.  The grid iterates batch innermost so the per-tile
# model weights (posedirs/shapedirs/template/skinning tiles, index depends
# only on the vertex tile) stay resident across batch blocks.

FUSED_BATCH_BLOCK = 128
FUSED_VERT_TILE = 1024  # swept: (128,1024) 7.0 ms; (128,512) 7.4; larger tiles exceed VMEM


# f32 dot precision for the fused kernel, all measured against an f64
# oracle at B·N=3200 (Mosaic exposes DEFAULT = 1 bf16 MXU pass and
# HIGHEST = 6):
#   HIGHEST            7.3 ms   0.0006 mm max vertex error   <- used
#   manual bf16x3      9.2 ms   0.035 mm  (per-dot issue overhead of 3x the
#                                          dot count eats the pass savings)
#   DEFAULT            4.4 ms   0.64 mm from the blendshape dots alone (the
#                               whole <0.5 mm PVE budget); 12 mm with
#                               DEFAULT transform rows - unusable
# The speed lever here is fusion (HBM traffic), not matmul passes.
# Round-3 per-dot split attempts (vs f64 oracle, VT=512):
#   pose-dot-only DEFAULT   -16%    0.25 mm max err (half the <0.5 mm
#                                   parity budget) — rejected
#   pose-dot-only bf16x2    SLOWER  0.0005 mm (3 dots' issue overhead
#                                   exceeds the 3-pass saving) — rejected


def _dot3(a, b):
    """Kernel dot at the validated precision (see table above)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _smpl_verts_kernel(beta_ref, pf_ref, a_ref, w_ref, vt_ref, sd_ref, pd_ref, out_ref):
    """One (vertex-tile, batch-block) instance.

    beta_ref: (BB, NB)        — shape coefficients
    pf_ref:   (BB, 207)       — pose features (R − I, non-root joints)
    a_ref:    (BB, 12, 24)    — per-joint [R|t] rows, transposed
    w_ref:    (24, VT)        — skinning weights, transposed
    vt_ref:   (4, VT)         — template vertices (x, y, z, pad rows)
    sd_ref:   (NB, 4, VT)     — shape blendshape dirs, channel-planes
    pd_ref:   (207, 4, VT)    — pose blendshape dirs, channel-planes
    out_ref:  (BB, 4, VT)     — skinned vertices
    """
    w = w_ref[:]
    p = []
    for c in range(3):
        pc = (
            vt_ref[c, :][None, :]
            + _dot3(beta_ref[:], sd_ref[:, c, :])
            + _dot3(pf_ref[:], pd_ref[:, c, :])
        )
        p.append(pc)
    # per-output-channel dot groups: only 4 mt planes live at a time (the
    # 12-plane variant overflows VMEM at larger vertex tiles)
    for c in range(3):
        out_ref[:, c, :] = (
            _dot3(a_ref[:, 3 * c + 0, :], w) * p[0]
            + _dot3(a_ref[:, 3 * c + 1, :], w) * p[1]
            + _dot3(a_ref[:, 3 * c + 2, :], w) * p[2]
            + _dot3(a_ref[:, 9 + c, :], w)
        )
    out_ref[:, 3, :] = jnp.zeros_like(p[0])


@jax.custom_vjp
def smpl_verts_fused(
    lbs_weights: jax.Array,   # (V, 24)
    a12: jax.Array,           # (B, 24, 12)
    betas: jax.Array,         # (B, NB)
    pose_feature: jax.Array,  # (B, 207)
    v_template_cm: jax.Array,  # (3, V)
    shapedirs_cm: jax.Array,   # (3, V, NB)
    posedirs: jax.Array,       # (207, V*3) with (v, c)-major columns
) -> jax.Array:
    """Fused SMPL vertex computation on TPU: returns (B, 3, V) skinned verts.

    HBM traffic ≈ read(model tiles once) + write(final verts) — the
    streaming minimum; every (B, 3, V) intermediate of the split pipeline
    lives only in VMEM.
    """
    b = betas.shape[0]
    v = v_template_cm.shape[1]
    nb = betas.shape[1]
    pad_b = (-b) % FUSED_BATCH_BLOCK
    pad_v = (-v) % FUSED_VERT_TILE
    bp, vp = b + pad_b, v + pad_v

    w_t = jnp.pad(lbs_weights, ((0, pad_v), (0, 0))).T              # (24, Vp)
    a_t = jnp.pad(jnp.swapaxes(a12, 1, 2), ((0, pad_b), (0, 0), (0, 0)))
    beta_p = jnp.pad(betas, ((0, pad_b), (0, 0)))
    pf_p = jnp.pad(pose_feature, ((0, pad_b), (0, 0)))
    vt4 = jnp.pad(v_template_cm, ((0, 1), (0, pad_v)))              # (4, Vp)
    sd4 = jnp.pad(
        jnp.transpose(shapedirs_cm, (2, 0, 1)), ((0, 0), (0, 1), (0, pad_v))
    )  # (NB, 4, Vp)
    pd4 = jnp.pad(
        posedirs.reshape(-1, v, 3).transpose(0, 2, 1), ((0, 0), (0, 1), (0, pad_v))
    )  # (207, 4, Vp)

    grid = (vp // FUSED_VERT_TILE, bp // FUSED_BATCH_BLOCK)  # batch innermost
    out = pl.pallas_call(
        _smpl_verts_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((FUSED_BATCH_BLOCK, nb), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FUSED_BATCH_BLOCK, 207), lambda vi, bi: (bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FUSED_BATCH_BLOCK, 12, 24), lambda vi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, FUSED_VERT_TILE), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, FUSED_VERT_TILE), lambda vi, bi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 4, FUSED_VERT_TILE), lambda vi, bi: (0, 0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((207, 4, FUSED_VERT_TILE), lambda vi, bi: (0, 0, vi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FUSED_BATCH_BLOCK, 4, FUSED_VERT_TILE),
            lambda vi, bi: (bi, 0, vi), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bp, 4, vp), jnp.float32),
    )(beta_p, pf_p, a_t, w_t, vt4, sd4, pd4)
    return out[:b, :3, :v]


# ---------------------------------------------------------------------------
# Per-group vertex-moment kernel: SMPL vertices for a GROUP of samples plus
# their first two moments (Σx, Σx²) over the sample axis, reduced in-kernel.
#
# The distribution-inference hot path needs only per-vertex variance over the
# N pose/shape samples of each image — materialising all B·N·3·V sample
# vertices to HBM (265 MB at B=32, N=100) just to reduce them is pure wasted
# traffic.  This kernel computes each (image, vertex-tile) block's samples in
# VMEM and writes ONLY the 8-row moment planes [Σx Σy Σz pad Σx² Σy² Σz² pad]
# — the padded sample rows carry a12 = 0, so their skinned vertices are
# exactly 0 and drop out of both sums without any masking.

MOM_VERT_TILE = 1024


def _smpl_moments_kernel(beta_ref, pf_ref, a_ref, w_ref, vt_ref, sd_ref,
                         pd_ref, out_ref):
    """One (vertex-tile, group) instance.  Refs as in _smpl_verts_kernel
    but with a leading singleton group-block dim; the sample dim is the
    group's padded sample count SP.  out_ref is (1, 8, VT) moment rows."""
    w = w_ref[:]
    p = []
    for c in range(3):
        p.append(
            vt_ref[c, :][None, :]
            + _dot3(beta_ref[0], sd_ref[:, c, :])
            + _dot3(pf_ref[0], pd_ref[:, c, :])
        )
    for c in range(3):
        out_c = (
            _dot3(a_ref[0, :, 3 * c + 0, :], w) * p[0]
            + _dot3(a_ref[0, :, 3 * c + 1, :], w) * p[1]
            + _dot3(a_ref[0, :, 3 * c + 2, :], w) * p[2]
            + _dot3(a_ref[0, :, 9 + c, :], w)
        )  # (SP, VT)
        out_ref[0, c, :] = jnp.sum(out_c, axis=0)
        out_ref[0, 4 + c, :] = jnp.sum(out_c * out_c, axis=0)
    out_ref[0, 3, :] = jnp.zeros_like(w[0])
    out_ref[0, 7, :] = jnp.zeros_like(w[0])


def smpl_verts_moments_fused(
    lbs_weights: jax.Array,   # (V, 24)
    a12: jax.Array,           # (G, N, 24, 12)
    betas: jax.Array,         # (G, N, NB)
    pose_feature: jax.Array,  # (G, N, 207)
    v_template_cm: jax.Array,  # (3, V)
    shapedirs_cm: jax.Array,   # (3, V, NB)
    posedirs: jax.Array,       # (207, V*3)
):
    """Fused per-group SMPL vertex moments: (Σ verts, Σ verts²) over the
    sample axis, per group — (G, 2, 3, V), no (G·N, 3, V) HBM tensor."""
    g, n, _, _ = a12.shape
    v = v_template_cm.shape[1]
    nb = betas.shape[-1]
    sp = -(-n // 8) * 8  # sample rows padded to the sublane multiple
    pad_n = sp - n
    pad_v = (-v) % MOM_VERT_TILE
    vp = v + pad_v

    w_t = jnp.pad(lbs_weights, ((0, pad_v), (0, 0))).T              # (24, Vp)
    # pad rows get a12 = 0 -> zero skinned verts -> no effect on the sums
    a_t = jnp.pad(
        jnp.swapaxes(a12, -1, -2), ((0, 0), (0, pad_n), (0, 0), (0, 0))
    )  # (G, SP, 12, 24)
    beta_p = jnp.pad(betas, ((0, 0), (0, pad_n), (0, 0)))
    pf_p = jnp.pad(pose_feature, ((0, 0), (0, pad_n), (0, 0)))
    vt4 = jnp.pad(v_template_cm, ((0, 1), (0, pad_v)))              # (4, Vp)
    sd4 = jnp.pad(
        jnp.transpose(shapedirs_cm, (2, 0, 1)), ((0, 0), (0, 1), (0, pad_v))
    )  # (NB, 4, Vp)
    pd4 = jnp.pad(
        posedirs.reshape(-1, v, 3).transpose(0, 2, 1), ((0, 0), (0, 1), (0, pad_v))
    )  # (207, 4, Vp)

    grid = (vp // MOM_VERT_TILE, g)  # group innermost: weight tiles resident
    out = pl.pallas_call(
        _smpl_moments_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, sp, nb), lambda vi, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, 207), lambda vi, gi: (gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, 12, 24), lambda vi, gi: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((24, MOM_VERT_TILE), lambda vi, gi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, MOM_VERT_TILE), lambda vi, gi: (0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 4, MOM_VERT_TILE), lambda vi, gi: (0, 0, vi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((207, 4, MOM_VERT_TILE), lambda vi, gi: (0, 0, vi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, MOM_VERT_TILE), lambda vi, gi: (gi, 0, vi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g, 8, vp), jnp.float32),
    )(beta_p, pf_p, a_t, w_t, vt4, sd4, pd4)
    s1 = out[:, 0:3, :v]
    s2 = out[:, 4:7, :v]
    return jnp.stack([s1, s2], axis=1)  # (G, 2, 3, V)


def _fused_fwd(w, a12, betas, pf, vt, sd, pd):
    return smpl_verts_fused(w, a12, betas, pf, vt, sd, pd), (
        w, a12, betas, pf, vt, sd, pd,
    )


def _fused_bwd(res, g):
    """Exact adjoints via XLA einsums (training runs at B≈72 where the
    (B, ·, V) intermediates are small; the B·N=3200 inference path never
    differentiates)."""
    w, a12, betas, pf, vt, sd, pd = res
    hi = jax.lax.Precision.HIGHEST
    v = vt.shape[1]
    # recompute the posed vertices (cheap at training batch)
    pd_cm = pd.reshape(-1, v, 3).transpose(0, 2, 1).reshape(-1, 3 * v)
    p = (
        vt
        + jnp.einsum("bl,cvl->bcv", betas, sd, precision=hi)
        + jnp.matmul(pf, pd_cm, precision=hi).reshape(-1, 3, v)
    )
    dw, da, dp = _lbs_bwd((w, a12, p), g)
    dbetas = jnp.einsum("bcv,cvl->bl", dp, sd, precision=hi)
    dpf = jnp.matmul(dp.reshape(dp.shape[0], -1), pd_cm.T, precision=hi)
    dvt = jnp.sum(dp, axis=0)
    dsd = jnp.einsum("bcv,bl->cvl", dp, betas, precision=hi)
    dpd_cm = jnp.einsum("bk,bcv->kcv", pf, dp, precision=hi)
    dpd = dpd_cm.transpose(0, 2, 1).reshape(pd.shape)
    return dw, da, dbetas, dpf, dvt, dsd, dpd


smpl_verts_fused.defvjp(_fused_fwd, _fused_bwd)


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
