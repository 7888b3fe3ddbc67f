"""Execution-level parity for the optimise (flow-prior refinement) pipeline.

The reference loop (/root/reference/optimise/optimise_humaniflow.py:72-137)
is SGD over (pose aa, glob aa, shape, cam_wp) with loss = J2D MSE·1.0 −
pose flow log-prob·0.3 − shape log-prob·1.0.  smplx and pyro are not
installed, so:

* the flow/model side runs the REFERENCE'S OWN HumaniflowModel under the
  faithful pyro-1.7 stub (tests/pyro17_stub.py), with its real state_dict
  converted — exactly as in tests/test_reference_flow_parity.py;
* the SMPL side uses a torch mirror of our synthetic SMPL forward, pinned
  against the JAX implementation at 1e-4 (`test_torch_smpl_mirror`) — the
  reference's own smplx stack cannot run here, but its LBS math is the
  same standard formulation (smplx lbs.py), and the real-pkl consumer is
  ORACLE-tested in tests/test_smpl.py;
* the per-iteration loop body is transcribed from the reference using the
  reference's own sub-functions (orthographic_project_torch,
  undo_keypoint_normalisation, boolean-mask J2D loss, per-part
  log_prob(…double()), torch.optim.SGD at optimise_config LR).

The test then asserts our single-jitted-fori_loop optimise pipeline
(pipelines/optimise.py) tracks the reference trajectory: per-iteration
losses and the final optimisation variables.
"""

import math
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import pyro17_stub  # noqa: E402

pyro17_stub.install()

pytest.importorskip("models.norm_flows.pyro_conditional_norm_flow")

from humaniflow_tpu.configs.defaults import ModelConfig, OptimiseConfig  # noqa: E402
from humaniflow_tpu.models import HumaniflowModel  # noqa: E402
from humaniflow_tpu.models.smpl import (  # noqa: E402
    SMPL_PARENTS,
    smpl_forward,
    synthetic_smpl,
)
from humaniflow_tpu.pipelines.optimise import make_optimise_fn  # noqa: E402
from humaniflow_tpu.utils.convert_torch import (  # noqa: E402
    convert_humaniflow_checkpoint,
)

B = 2
V = 512
IMG = 256
ITERS = 8


def _batch_rodrigues_torch(aa):
    """Standard Rodrigues exp map (smplx lbs.batch_rodrigues semantics:
    R = I + sin(θ)/θ·K + (1-cosθ)/θ²·K²), torch f32."""
    theta = torch.clamp((aa * aa).sum(-1), 1e-16).sqrt()
    x, y, z = aa.unbind(-1)
    zero = torch.zeros_like(x)
    k = torch.stack([zero, -z, y, z, zero, -x, -y, x, zero], dim=-1).reshape(
        aa.shape[:-1] + (3, 3)
    )
    eye = torch.eye(3).expand(k.shape)
    f1 = (torch.sin(theta) / theta)[..., None, None]
    f2 = ((1 - torch.cos(theta)) / theta**2)[..., None, None]
    return eye + f1 * k + f2 * (k @ k)


def _smpl_np(smpl):
    return {
        k: np.asarray(getattr(smpl, k))
        for k in (
            "v_template", "shapedirs", "posedirs", "j_regressor",
            "lbs_weights", "extra_joint_vertex_ids", "j_regressor_extra",
            "j_regressor_cocoplus", "j_regressor_h36m",
        )
    }


def _smpl_forward_torch(m, betas, pose_aa, glob_aa):
    """Torch mirror of humaniflow_tpu.models.smpl.smpl_forward(pose2rot=True)
    — standard SMPL: shape blendshapes + pose-corrective blendshapes +
    rigid kinematic chain + LBS + the reference wrapper's 90-joint stack
    (24 kinematic, 21 vertex picks, extra 9 + cocoplus 19 + h36m 17;
    reference models/smpl.py:27-41)."""
    b = betas.shape[0]
    vt = torch.from_numpy(m["v_template"])            # (V, 3)
    sd = torch.from_numpy(m["shapedirs"])             # (V, 3, nb)
    pd = torch.from_numpy(m["posedirs"])              # (207, V*3)
    jr = torch.from_numpy(m["j_regressor"])           # (24, V)
    w = torch.from_numpy(m["lbs_weights"])            # (V, 24)
    v = vt.shape[0]

    rot = _batch_rodrigues_torch(
        torch.cat([glob_aa[:, None], pose_aa.reshape(b, 23, 3)], dim=1)
    )  # (B, 24, 3, 3)
    v_shaped = vt[None] + torch.einsum("bl,vcl->bvc", betas, sd)
    joints_rest = torch.einsum("jv,bvc->bjc", jr, v_shaped)  # (B, 24, 3)
    eye = torch.eye(3)
    pose_feature = (rot[:, 1:] - eye).reshape(b, -1)  # (B, 207)
    v_posed = v_shaped + (pose_feature @ pd).reshape(b, v, 3)

    world_R = [rot[:, 0]]
    world_t = [joints_rest[:, 0]]
    for j in range(1, 24):
        p = int(SMPL_PARENTS[j])
        rel_j = joints_rest[:, j] - joints_rest[:, p]
        world_R.append(world_R[p] @ rot[:, j])
        world_t.append(
            torch.einsum("bxy,by->bx", world_R[p], rel_j) + world_t[p]
        )
    world_R = torch.stack(world_R, dim=1)  # (B, 24, 3, 3)
    world_t = torch.stack(world_t, dim=1)  # (B, 24, 3)
    rel_t = world_t - torch.einsum("bjxy,bjy->bjx", world_R, joints_rest)

    r_blend = torch.einsum("vj,bjxy->bvxy", w, world_R)
    t_blend = torch.einsum("vj,bjx->bvx", w, rel_t)
    verts = torch.einsum("bvxy,bvy->bvx", r_blend, v_posed) + t_blend

    landmarks = verts[:, torch.from_numpy(m["extra_joint_vertex_ids"]).long()]
    regs = [
        torch.einsum("jv,bvc->bjc", torch.from_numpy(m[k]), verts)
        for k in ("j_regressor_extra", "j_regressor_cocoplus", "j_regressor_h36m")
    ]
    joints = torch.cat([world_t, landmarks] + regs, dim=1)  # (B, 90, 3)
    return verts, joints


@pytest.fixture(scope="module")
def setup():
    from models.humaniflow_model import HumaniflowModel as RefHumaniflowModel

    cfg = ModelConfig()
    nf = types.SimpleNamespace(
        CONTEXT_DIM=cfg.NORM_FLOW.CONTEXT_DIM,
        NUM_TRANSFORMS=cfg.NORM_FLOW.NUM_TRANSFORMS,
        TRANSFORM_TYPE=cfg.NORM_FLOW.TRANSFORM_TYPE,
        TRANSFORM_NN_HIDDEN_DIMS=list(cfg.NORM_FLOW.TRANSFORM_NN_HIDDEN_DIMS),
        NUM_SPLINE_SEGMENTS=cfg.NORM_FLOW.NUM_SPLINE_SEGMENTS,
        PERMUTE_TYPE=cfg.NORM_FLOW.PERMUTE_TYPE,
        PERMUTE_NN_HIDDEN_DIMS=cfg.NORM_FLOW.PERMUTE_NN_HIDDEN_DIMS,
        COMPACT_SUPPORT_RADIUS=cfg.NORM_FLOW.COMPACT_SUPPORT_RADIUS,
        BASE_DIST_STD=cfg.NORM_FLOW.BASE_DIST_STD,
    )
    ref_cfg = types.SimpleNamespace(
        NUM_IN_CHANNELS=cfg.NUM_IN_CHANNELS,
        NUM_RESNET_LAYERS=cfg.NUM_RESNET_LAYERS,
        INPUT_SHAPE_GLOB_CAM_FEATS_DIM=cfg.INPUT_SHAPE_GLOB_CAM_FEATS_DIM,
        NUM_SMPL_BETAS=cfg.NUM_SMPL_BETAS,
        NORM_FLOW=nf,
    )
    torch.manual_seed(0)
    tm = RefHumaniflowModel(
        device="cpu", model_cfg=ref_cfg, smpl_parents=list(SMPL_PARENTS)
    )
    tm.eval()
    model = HumaniflowModel(cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_humaniflow_checkpoint(sd, model)
    )
    smpl = synthetic_smpl(num_verts=V)
    return tm, model, params, smpl


def test_torch_smpl_mirror(setup):
    """Pins the torch SMPL mirror used by the trajectory test against the
    JAX smpl_forward(pose2rot=True) on random inputs."""
    _, _, _, smpl = setup
    rng = np.random.default_rng(3)
    betas = rng.normal(scale=0.5, size=(B, 10)).astype(np.float32)
    pose = rng.normal(scale=0.3, size=(B, 69)).astype(np.float32)
    glob = rng.normal(scale=0.5, size=(B, 3)).astype(np.float32)

    out = smpl_forward(
        smpl, jnp.asarray(betas), jnp.asarray(pose), jnp.asarray(glob),
        pose2rot=True,
    )
    verts_t, joints_t = _smpl_forward_torch(
        _smpl_np(smpl), torch.tensor(betas), torch.tensor(pose),
        torch.tensor(glob),
    )
    np.testing.assert_allclose(
        np.asarray(out["vertices"]), verts_t.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["joints"]), joints_t.numpy(), rtol=1e-4, atol=1e-5
    )


def test_optimise_trajectory_parity(setup):
    """Reference refinement loop (transcribed with the reference's own
    model/projection/loss calls, torch SGD) vs our jitted fori_loop
    optimise: per-iteration losses + final variables after 8 steps."""
    from utils.cam_utils import orthographic_project_torch
    from utils.joints2d_utils import undo_keypoint_normalisation as ref_undo
    from utils.label_conversions import ALL_JOINTS_TO_COCO_MAP as REF_COCO

    tm, model, params, smpl = setup
    opt_cfg = OptimiseConfig(NUM_ITERS=ITERS)
    smpl_np = _smpl_np(smpl)
    rng = np.random.default_rng(17)

    shape0 = rng.normal(scale=0.3, size=(B, 10)).astype(np.float32)
    pose0 = rng.normal(scale=0.2, size=(B, 69)).astype(np.float32)
    glob0 = rng.normal(scale=0.4, size=(B, 3)).astype(np.float32)
    cam0 = np.array([[0.9, 0.0, 0.0]] * B, np.float32) + rng.normal(
        scale=0.02, size=(B, 3)
    ).astype(np.float32)
    feats0 = rng.normal(size=(B, 512)).astype(np.float32)
    tgt_j2d = rng.uniform(40, IMG - 40, size=(B, 17, 2)).astype(np.float32)
    conf = rng.uniform(size=(B, 17)).astype(np.float32)

    # ---- reference loop (optimise_humaniflow.py:72-137 transcription) ----
    shape = torch.tensor(shape0, requires_grad=True)
    pose_aa = torch.tensor(pose0, requires_grad=True)
    glob_aa = torch.tensor(glob0, requires_grad=True)
    cam_wp = torch.tensor(cam0, requires_grad=True)
    optimiser = torch.optim.SGD([pose_aa, glob_aa, shape, cam_wp], lr=opt_cfg.LR)

    t_j2d = torch.tensor(tgt_j2d)
    visib = torch.tensor(conf) > opt_cfg.JOINTS2D_VISIB_THRESHOLD
    visib[:, [0, 1, 2, 3, 4, 5, 6]] = True  # reference :59

    flip = torch.diag(torch.tensor([1.0, -1.0, -1.0]))  # x-axis π rotation
    coco = torch.tensor(np.asarray(REF_COCO)).long()

    ref_losses = []
    for _ in range(ITERS + 1):  # +1: final loss evaluated, not stepped
        _, joints = _smpl_forward_torch(smpl_np, shape, pose_aa, glob_aa)
        opt_j3d = torch.einsum("xy,bky->bkx", flip, joints[:, coco])
        opt_j2d = ref_undo(
            orthographic_project_torch(opt_j3d, cam_wp), IMG
        )
        j2d_loss = ((t_j2d[visib, :] - opt_j2d[visib, :]) ** 2).mean()

        pose_R = _batch_rodrigues_torch(pose_aa.reshape(-1, 3)).view(B, 23, 3, 3)
        glob_R = _batch_rodrigues_torch(glob_aa)
        dists = tm(
            input=None,
            input_feats=torch.tensor(feats0),
            compute_point_est=False,
            num_samples=0,
            compute_for_loglik=True,
            shape_for_loglik=shape,
            pose_R_for_loglik=pose_R,
            glob_R_for_loglik=glob_R,
        )
        pose_logprob = torch.tensor(0.0)
        for part in range(23):
            lp = dists["conditioned_pose_SO3flow_dists_for_loglik"][part].log_prob(
                pose_R[:, part].double()
            )
            pose_logprob = pose_logprob + lp.sum()
        pose_logprob = pose_logprob / B
        shape_logprob = dists["shape_dist_for_loglik"].log_prob(shape).sum() / B

        loss = (
            j2d_loss * opt_cfg.LOSS_WEIGHTS.JOINTS2D
            - pose_logprob * opt_cfg.LOSS_WEIGHTS.POSE_PRIOR
            - shape_logprob * opt_cfg.LOSS_WEIGHTS.SHAPE_PRIOR
        )
        ref_losses.append(float(loss))
        if len(ref_losses) == ITERS + 1:
            break
        optimiser.zero_grad()
        loss.backward()
        optimiser.step()

    # ------------------------------- ours -------------------------------
    fn = make_optimise_fn(model, smpl, opt_cfg, img_wh=IMG)
    out = fn(
        params,
        {
            "shape": jnp.asarray(shape0),
            "pose_axisangle": jnp.asarray(pose0.reshape(B, 23, 3)),
            "glob_axisangle": jnp.asarray(glob0),
            "cam_wp": jnp.asarray(cam0),
            "input_feats": jnp.asarray(feats0),
            "joints2D": jnp.asarray(tgt_j2d),
            "joints2D_conf": jnp.asarray(conf),
        },
    )
    assert not bool(out["halted_on_nan"])

    init_total = (
        float(out["initial_losses"]["joints2D"]) * opt_cfg.LOSS_WEIGHTS.JOINTS2D
        - float(out["initial_losses"]["pose_logprob"]) * opt_cfg.LOSS_WEIGHTS.POSE_PRIOR
        - float(out["initial_losses"]["shape_logprob"]) * opt_cfg.LOSS_WEIGHTS.SHAPE_PRIOR
    )
    final_total = (
        float(out["final_losses"]["joints2D"]) * opt_cfg.LOSS_WEIGHTS.JOINTS2D
        - float(out["final_losses"]["pose_logprob"]) * opt_cfg.LOSS_WEIGHTS.POSE_PRIOR
        - float(out["final_losses"]["shape_logprob"]) * opt_cfg.LOSS_WEIGHTS.SHAPE_PRIOR
    )
    # the loop refines: both sides must actually have moved downhill
    assert ref_losses[-1] < ref_losses[0]
    np.testing.assert_allclose(init_total, ref_losses[0], rtol=1e-3)
    # our final_losses come from the LAST STEPPED iteration (index ITERS-1)
    assert abs(final_total - ref_losses[ITERS - 1]) <= max(
        2e-3 * abs(ref_losses[ITERS - 1]),
        2.0 * abs(ref_losses[ITERS] - ref_losses[ITERS - 1]),
    )

    np.testing.assert_allclose(
        np.asarray(out["pose_axisangle"]).reshape(B, 69),
        pose_aa.detach().numpy(), rtol=1e-3, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["glob_axisangle"]), glob_aa.detach().numpy(),
        rtol=1e-3, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["shape"]), shape.detach().numpy(), rtol=1e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["cam_wp"]), cam_wp.detach().numpy(), rtol=1e-3, atol=2e-5
    )
