"""SMPL body model as pure JAX (blend shapes + pose blendshapes + LBS).

Capability parity with the reference's smplx-based wrapper (models/smpl.py:13,
smplx 0.1.26 SMPL + 3 extra regressor stacks): identical output joint layout —
24 kinematic joints, 21 vertex-picked landmarks (smplx VertexJointSelector
order), then extra(9) + cocoplus(19) + h36m(17) regressed joints → 90 total.

TPU-first: the whole forward is fused einsums over static shapes (blend
shapes, pose-corrective blendshapes, rigid kinematic chain, LBS), jit/vmap
friendly, and runs in f32 (accumulation forced to f32 via HIGHEST precision
where it matters).  Gendered variants are just different parameter pytrees.
"""

import os
import pickle
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.so3 import so3_exp

# Standard SMPL kinematic tree (24 joints).
SMPL_PARENTS = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
    19, 20, 21,
)
NUM_SMPL_JOINTS = 24
NUM_BODYPARTS = 23  # non-root joints, the flow-modelled parts

# smplx VertexJointSelector vertex ids (vertex_ids.py 'smplh'):
# 5 face + 6 feet + 10 fingertips, in this exact order.
_EXTRA_VERTEX_IDS = (
    332, 6260, 2800, 4071, 583,            # nose, reye, leye, rear, lear
    3216, 3226, 3387, 6617, 6624, 6787,    # LBigToe/LSmallToe/LHeel, R...
    2746, 2319, 2445, 2556, 2673,          # left thumb/index/middle/ring/pinky
    6191, 5782, 5905, 6016, 6133,          # right thumb/index/middle/ring/pinky
)


@jax.tree_util.register_pytree_node_class
@dataclass
class SMPLModel:
    """Parameter container (registered pytree so it can cross jit boundaries)."""

    v_template: jax.Array      # (V, 3)
    shapedirs: jax.Array       # (V, 3, num_betas)
    posedirs: jax.Array        # (23*9, V*3) pose-corrective blendshapes
    j_regressor: jax.Array     # (24, V)
    lbs_weights: jax.Array     # (V, 24)
    faces: jax.Array           # (F, 3) int32
    extra_joint_vertex_ids: jax.Array  # (21,) int32
    j_regressor_extra: Optional[jax.Array] = None     # (9, V)
    j_regressor_cocoplus: Optional[jax.Array] = None  # (19, V)
    j_regressor_h36m: Optional[jax.Array] = None      # (17, V)

    def tree_flatten(self):
        children = (
            self.v_template, self.shapedirs, self.posedirs, self.j_regressor,
            self.lbs_weights, self.faces, self.extra_joint_vertex_ids,
            self.j_regressor_extra, self.j_regressor_cocoplus,
            self.j_regressor_h36m,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_verts(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_betas(self) -> int:
        return self.shapedirs.shape[-1]


def load_smpl_npz(path: str, regressor_paths: Optional[dict] = None) -> SMPLModel:
    """Load a converted SMPL .npz (see utils/convert_torch.convert_smpl_pkl)."""
    data = np.load(path)
    extra = {}
    if regressor_paths:
        for name, p in regressor_paths.items():
            if p is not None and os.path.exists(p):
                extra[name] = jnp.asarray(np.load(p).astype(np.float32))
    return SMPLModel(
        v_template=jnp.asarray(data["v_template"].astype(np.float32)),
        shapedirs=jnp.asarray(data["shapedirs"].astype(np.float32)[..., :10]),
        posedirs=jnp.asarray(data["posedirs"].astype(np.float32)),
        j_regressor=jnp.asarray(data["J_regressor"].astype(np.float32)),
        lbs_weights=jnp.asarray(data["weights"].astype(np.float32)),
        faces=jnp.asarray(data["f"].astype(np.int32)),
        extra_joint_vertex_ids=jnp.asarray(np.array(_EXTRA_VERTEX_IDS, np.int32)),
        j_regressor_extra=extra.get("extra"),
        j_regressor_cocoplus=extra.get("cocoplus"),
        j_regressor_h36m=extra.get("h36m"),
    )


def convert_smpl_pkl(pkl_path: str, npz_path: str):
    """One-off converter: SMPL .pkl (chumpy arrays) → plain .npz.

    The posedirs are reshaped to (207, V*3) for a single fused matmul.
    """
    with open(pkl_path, "rb") as f:
        data = pickle.load(f, encoding="latin1")

    def arr(x):
        return np.array(x, dtype=np.float64)

    j_reg = data["J_regressor"]
    if hasattr(j_reg, "toarray"):
        j_reg = j_reg.toarray()
    posedirs = arr(data["posedirs"])  # (V, 3, 207)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T  # (207, V*3)
    np.savez(
        npz_path,
        v_template=arr(data["v_template"]),
        shapedirs=arr(data["shapedirs"]),
        posedirs=posedirs,
        J_regressor=arr(j_reg),
        weights=arr(data["weights"]),
        f=np.array(data["f"], np.int64),
    )


def _dp_coherent_vertices(v: int, rng) -> "np.ndarray | None":
    """Vertex positions that respect the DensePose mesh connectivity.

    The renderer rasterizes the DensePose triangulation (13776 faces over the
    6890 SMPL vertices via a UV vertex map); scattering vertices randomly
    makes those triangles screen-sized, which is wildly unlike the real
    2-6 px SMPL faces and breaks rasterizer realism (e.g. the binned
    kernel's face-extent assumptions).  Here random positions are Laplacian
    -smoothed over the DensePose edge graph onto an ellipsoid, giving a
    smooth body-scale closed surface with realistically small faces."""
    if v != 6890:
        return None
    try:
        # host loader: np.asarray on the device copies costs 30-200 s per
        # call through the tunneled TPU (scripts/profile_cold_start.py)
        from ..render.renderer import load_densepose_uv_host

        dp = load_densepose_uv_host(None)
    except Exception:
        return None
    faces = dp["faces"]
    vmap = dp["vertex_map"]
    tri = vmap[faces]  # (F, 3) smpl-vertex ids
    e0 = np.concatenate([tri[:, 0], tri[:, 1], tri[:, 2], tri[:, 1], tri[:, 2], tri[:, 0]])
    e1 = np.concatenate([tri[:, 1], tri[:, 2], tri[:, 0], tri[:, 0], tri[:, 1], tri[:, 2]])
    deg = np.maximum(np.bincount(e0, minlength=v).astype(np.float64), 1.0)[:, None]
    # edge-sorted segment sums: bincount per column is ~40x faster than
    # np.add.at on this 1-core host (the smoothing loop was the dominant
    # cold-start cost of synthetic_smpl at V=6890, scripts/profile_cold_start.py)
    pos = rng.normal(size=(v, 3))
    for _ in range(80):
        gathered = pos[e1]
        acc = np.stack(
            [np.bincount(e0, weights=gathered[:, c], minlength=v) for c in range(3)],
            axis=1,
        )
        pos = acc / deg
        pos -= pos.mean(0)
        pos /= np.maximum(np.linalg.norm(pos, axis=1, keepdims=True), 1e-9)
    return pos * np.array([0.35, 0.75, 0.25])  # body-ish ellipsoid (metres)


def synthetic_smpl(num_verts: int = 128, num_betas: int = 10, seed: int = 0) -> SMPLModel:
    """Deterministic synthetic SMPL-structured model for tests/benchmarks when
    the real (licensed, externally downloaded) SMPL pkls are absent — same
    situation as the reference repo, which also ships without them.

    At the real vertex count (6890) the template is a smooth ellipsoid
    embedding of the DensePose connectivity (small coherent faces, contiguous
    silhouettes); at test sizes it falls back to scattered vertices."""
    rng = np.random.default_rng(seed)
    v = num_verts
    # joints laid out as a rough skeleton; vertices scattered around them
    joints = rng.normal(scale=0.3, size=(NUM_SMPL_JOINTS, 3))
    verts = _dp_coherent_vertices(v, rng)
    if verts is None:
        verts = joints[rng.integers(0, NUM_SMPL_JOINTS, v)] + rng.normal(
            scale=0.05, size=(v, 3)
        )
    else:
        # pull the joints inside the ellipsoid body so LBS stays sane
        joints = verts[rng.integers(0, v, NUM_SMPL_JOINTS)] * 0.6
    # j_regressor: soft assignment to nearest joints
    d2 = ((verts[:, None] - joints[None]) ** 2).sum(-1)
    w = np.exp(-d2 / 0.01)
    j_reg = (w / w.sum(0, keepdims=True)).T
    lbs_w = w / w.sum(1, keepdims=True)
    faces = rng.integers(0, v, size=(2 * v, 3))
    return SMPLModel(
        v_template=jnp.asarray(verts, jnp.float32),
        shapedirs=jnp.asarray(rng.normal(scale=0.01, size=(v, 3, num_betas)), jnp.float32),
        posedirs=jnp.asarray(rng.normal(scale=0.001, size=(23 * 9, v * 3)), jnp.float32),
        j_regressor=jnp.asarray(j_reg, jnp.float32),
        lbs_weights=jnp.asarray(lbs_w, jnp.float32),
        faces=jnp.asarray(faces, jnp.int32),
        extra_joint_vertex_ids=jnp.asarray(
            np.array(_EXTRA_VERTEX_IDS, np.int64) % v, jnp.int32
        ),
        # convex vertex combinations so regressed joints lie inside the mesh
        j_regressor_extra=jnp.asarray(_convex_rows(rng, 9, v), jnp.float32),
        j_regressor_cocoplus=jnp.asarray(_convex_rows(rng, 19, v), jnp.float32),
        j_regressor_h36m=jnp.asarray(_convex_rows(rng, 17, v), jnp.float32),
    )


def _convex_rows(rng, rows: int, cols: int) -> np.ndarray:
    w = np.exp(rng.normal(scale=2.0, size=(rows, cols)))
    return w / w.sum(axis=1, keepdims=True)


def _mat3mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched 3×3 matmul as fused elementwise ops: (…, 3, 3) × (…, 3, 3).

    einsum/dot on (B, 3, 3) operands hits the MXU with 3-wide dims —
    padding-dominated AND (at the HIGHEST precision rotations need) 6
    passes each; the broadcast-multiply-reduce form stays on the VPU in
    full f32 and fuses into the surrounding graph."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def _mat3vec(a: jax.Array, v: jax.Array) -> jax.Array:
    """(…, 3, 3) × (…, 3) batched matvec, elementwise."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def _rigid_transform_chain(rot_mats: jax.Array, joints: jax.Array):
    """Forward-kinematic chain: per-joint world rotations/translations + the
    LBS-relative transforms as (R (B,24,3,3), t (B,24,3)) pairs (no 4x4
    homogeneous matrices — smplx lbs.batch_rigid_transform equivalent).

    Each joint composes against its (statically known) parent via plain
    axis-1 slices and fused elementwise 3×3 arithmetic — no scatter, no
    gather, no MXU.  (The round-1 version ran ~10 one-hot HIGHEST einsums
    per tree level: 2.3 ms at B·N=3200 for microscopic FLOPs; this form is
    a few fused VPU kernels.)

    :param rot_mats: (B, 24, 3, 3); :param joints: (B, 24, 3) rest joints.
    :return: (posed_joints (B,24,3), rel_R (B,24,3,3), rel_t (B,24,3))
    """
    world_R = [rot_mats[:, 0]]
    world_t = [joints[:, 0]]
    for j in range(1, NUM_SMPL_JOINTS):
        p = int(SMPL_PARENTS[j])
        rel_j = joints[:, j] - joints[:, p]
        world_R.append(_mat3mul(world_R[p], rot_mats[:, j]))
        world_t.append(_mat3vec(world_R[p], rel_j) + world_t[p])
    world_R = jnp.stack(world_R, axis=1)
    world_t = jnp.stack(world_t, axis=1)

    posed_joints = world_t
    # Relative transform: subtract the rest-pose joint contribution.
    rel_t = world_t - _mat3vec(world_R, joints)
    return posed_joints, world_R, rel_t


def smpl_vertex_moments(
    model: SMPLModel,
    betas: jax.Array,
    body_pose: jax.Array,
    global_orient: jax.Array,
    num_groups: int,
):
    """Per-group first/second vertex moments over sample batches.

    Inputs are flat (G·N, …) sample stacks (G = num_groups images, N
    samples each, G·N = batch).  Returns (G, 2, 3, V): moments[:, 0] = Σ
    vertices, moments[:, 1] = Σ vertices² over each group's N samples —
    everything a per-vertex variance / directional-std needs.

    On TPU this runs a dedicated Pallas kernel that reduces the sample
    axis IN VMEM: the (G·N, 3, V) sample-vertex tensor (265 MB at
    B·N=3200) never reaches HBM — the distribution-inference hot path's
    variance stage collapses into the SMPL pass (reference equivalent:
    predict/predict_humaniflow.py per-sample smpl() loop + numpy variance).
    Elsewhere it reduces the XLA forward's vertices.
    """
    hi = jax.lax.Precision.HIGHEST
    gn = betas.shape[0]
    assert gn % num_groups == 0
    n = gn // num_groups
    if jax.default_backend() != "cpu":
        from .pallas_lbs import smpl_verts_moments_fused

        b = betas.shape[0]
        rot_mats = jnp.concatenate(
            [global_orient[:, None], body_pose], axis=1
        )
        shapedirs_cm = jnp.transpose(model.shapedirs, (1, 0, 2))
        v_template_cm = model.v_template.T
        jt = jnp.einsum("jv,cv->jc", model.j_regressor, v_template_cm, precision=hi)
        jsd = jnp.einsum("jv,cvl->jcl", model.j_regressor, shapedirs_cm, precision=hi)
        joints_rest = jt[None] + jnp.einsum("bl,jcl->bjc", betas, jsd, precision=hi)
        eye = jnp.eye(3, dtype=rot_mats.dtype)
        pose_feature = (rot_mats[:, 1:] - eye).reshape(b, -1)
        _, world_R, rel_t = _rigid_transform_chain(rot_mats, joints_rest)
        a12 = jnp.concatenate(
            [world_R.reshape(b, NUM_SMPL_JOINTS, 9), rel_t], axis=-1
        )
        return smpl_verts_moments_fused(
            model.lbs_weights,
            a12.reshape(num_groups, n, NUM_SMPL_JOINTS, 12),
            betas.reshape(num_groups, n, -1),
            pose_feature.reshape(num_groups, n, -1),
            v_template_cm, shapedirs_cm, model.posedirs,
        )
    verts_cm = smpl_forward(model, betas, body_pose, global_orient)[
        "vertices_cm"
    ].reshape(num_groups, n, 3, -1)
    return jnp.stack([verts_cm.sum(axis=1), (verts_cm * verts_cm).sum(axis=1)], axis=1)


def smpl_forward(
    model: SMPLModel,
    betas: jax.Array,
    body_pose: jax.Array,
    global_orient: jax.Array,
    pose2rot: bool = False,
):
    """SMPL forward pass.

    :param betas: (B, num_betas)
    :param body_pose: (B, 23, 3, 3) rotmats, or (B, 69) axis-angle if pose2rot
    :param global_orient: (B, 3, 3) rotmat, or (B, 3) axis-angle if pose2rot
    :return: dict with 'vertices' (B, V, 3) and 'joints' (B, 90, 3) —
        ordering matches the reference wrapper (models/smpl.py:27-41).
    """
    hi = jax.lax.Precision.HIGHEST
    b = betas.shape[0]
    v = model.num_verts
    if pose2rot:
        body_pose = so3_exp(body_pose.reshape(b, 23, 3))
        global_orient = so3_exp(global_orient.reshape(b, 3))
    rot_mats = jnp.concatenate([global_orient[:, None], body_pose], axis=1)  # (B,24,3,3)

    # ----- channel-major internals: all big vertex tensors travel as
    # (B, 3, V) so the fused kernel consumes them with NO transposes of
    # batch-sized data (model arrays are tiny; transposing them per trace is
    # free and constant-folded under jit).
    shapedirs_cm = jnp.transpose(model.shapedirs, (1, 0, 2))      # (3, V, nb)
    v_template_cm = model.v_template.T                            # (3, V)

    # Rest joints WITHOUT materialising v_shaped: fold the joint regressor
    # through the template and the shape dirs (exact contraction reorder —
    # j_reg @ (vt + sd·β) = (j_reg @ vt) + (j_reg @ sd)·β; both factors are
    # model constants).
    jt = jnp.einsum("jv,cv->jc", model.j_regressor, v_template_cm, precision=hi)
    jsd = jnp.einsum(
        "jv,cvl->jcl", model.j_regressor, shapedirs_cm, precision=hi
    )
    joints_rest = jt[None] + jnp.einsum("bl,jcl->bjc", betas, jsd, precision=hi)

    eye = jnp.eye(3, dtype=rot_mats.dtype)
    pose_feature = (rot_mats[:, 1:] - eye).reshape(b, -1)  # (B, 207)

    # Kinematic chain + fused blendshapes+LBS.  Per-joint transforms packed
    # as (B, 24, 12) rows [R | t]; on TPU the entire vertex computation
    # (template + shape/pose blendshapes + skinning) is ONE Pallas kernel —
    # no (B, 3, V) intermediate ever reaches HBM (models/pallas_lbs.py).
    posed_joints, world_R, rel_t = _rigid_transform_chain(rot_mats, joints_rest)
    a12 = jnp.concatenate(
        [world_R.reshape(b, NUM_SMPL_JOINTS, 9), rel_t], axis=-1
    )  # (B, 24, 12)
    if jax.default_backend() != "cpu":
        from .pallas_lbs import smpl_verts_fused

        verts_cm = smpl_verts_fused(
            model.lbs_weights, a12, betas, pose_feature,
            v_template_cm, shapedirs_cm, model.posedirs,
        )
    else:
        posedirs_cm = (
            model.posedirs.reshape(-1, v, 3).transpose(0, 2, 1).reshape(-1, 3 * v)
        )  # (207, 3V) channel-major columns
        v_shaped_cm = v_template_cm + jnp.einsum(
            "bl,cvl->bcv", betas, shapedirs_cm, precision=hi
        )
        v_posed_cm = v_shaped_cm + jnp.matmul(
            pose_feature, posedirs_cm, precision=hi
        ).reshape(b, 3, v)
        t12 = jnp.einsum("vj,bjc->bcv", model.lbs_weights, a12, precision=hi)
        # t12 channels: rows of [R|t] — apply 3x3 + t per channel
        verts_cm = jnp.stack(
            [
                t12[:, 3 * i + 0] * v_posed_cm[:, 0]
                + t12[:, 3 * i + 1] * v_posed_cm[:, 1]
                + t12[:, 3 * i + 2] * v_posed_cm[:, 2]
                + t12[:, 9 + i]
                for i in range(3)
            ],
            axis=1,
        )

    # Joint set: 24 kinematic + 21 vertex landmarks + regressed stacks, all
    # landmark/regressor rows fused into ONE (J, V) matmul over the vertices.
    reg_rows = [
        jnp.zeros((21, v), jnp.float32)
        .at[jnp.arange(21), model.extra_joint_vertex_ids]
        .set(1.0)
    ]
    for reg in (
        model.j_regressor_extra,
        model.j_regressor_cocoplus,
        model.j_regressor_h36m,
    ):
        if reg is not None:
            reg_rows.append(reg)
    combined = jnp.concatenate(reg_rows, axis=0)  # (21+9+19+17, V)
    regressed = jnp.einsum("jv,bcv->bjc", combined, verts_cm, precision=hi)
    return {
        "vertices": jnp.swapaxes(verts_cm, 1, 2),  # (B, V, 3) for consumers
        # channel-major view for reduction-only consumers (per-vertex
        # variance etc.) — skips the 265 MB (B,3,V)→(B,V,3) relayout when
        # "vertices" goes unused (XLA DCEs the transpose)
        "vertices_cm": verts_cm,
        "joints": jnp.concatenate([posed_joints, regressed], axis=1),
        "smpl_joints": posed_joints,
    }
