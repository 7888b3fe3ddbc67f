"""Flow-prior-guided post-inference optimisation (SMPLify-style refinement).

Capability parity with reference `optimise/optimise_humaniflow.py:18-144`:
SGD over (pose axis-angle, glob axis-angle, shape, cam_wp) initialised from a
prediction, loss = J2D·1.0 − pose_flow_logprob·0.3 − shape_logprob·1.0, with
the predicted (image-conditioned) distribution as prior and cached encoder
features so the ResNet never reruns (:53,96-103).

TPU-first: the entire 81-iteration loop runs as ONE jitted `lax.fori_loop`
(the reference does 81 Python steps with per-part try/except log-prob calls);
the NaN guard is a carried `halted` flag — once any update is non-finite the
state freezes, matching the reference's rollback-and-break (:129-137).
"""

import math
from typing import Dict

import jax
import jax.numpy as jnp

from ..configs.defaults import OptimiseConfig
from ..data.label_conversions import ALL_JOINTS_TO_COCO_MAP
from ..metrics.train_metrics import undo_keypoint_normalisation
from ..models.humaniflow import HumaniflowModel
from ..models.smpl import SMPLModel, smpl_forward
from ..ops.camera import orthographic_project
from ..ops.so3 import so3_exp


def make_optimise_fn(
    model: HumaniflowModel,
    smpl: SMPLModel,
    optimise_cfg: OptimiseConfig,
    img_wh: int = 256,
):
    """Build the jitted refinement program ONCE; call it per batch.

    Returns `fn(params, init) -> dict` (same contract as
    `optimise_batch_with_humaniflow_prior`).  Jitting happens at build time,
    so a caller looping over batches (scripts/run_optimise.py, bench.py)
    pays tracing once per process instead of once per batch — re-tracing
    the 81-iteration fori_loop program costs multiple SECONDS per call and
    was 30× the actual device time of the loop.
    """
    coco = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)
    flip = so3_exp(jnp.asarray([[math.pi, 0.0, 0.0]], jnp.float32))[0]
    w = optimise_cfg.LOSS_WEIGHTS
    lr = optimise_cfg.LR
    thresh = optimise_cfg.JOINTS2D_VISIB_THRESHOLD
    num_iters = optimise_cfg.NUM_ITERS

    def loss_fn(state, params, input_feats, target_j2d, vis):
        b = state["shape"].shape[0]
        pose_aa = state["pose"].reshape(b, 23, 3)
        pose_r = so3_exp(pose_aa)
        glob_r = so3_exp(state["glob"])
        out = smpl_forward(smpl, state["shape"], pose_r, glob_r)
        joints = out["joints"][:, coco]
        # 3D targets are y-up; flip about x before projecting (reference :78-83)
        joints = jnp.einsum("ij,bkj->bki", flip, joints)
        j2d = undo_keypoint_normalisation(
            orthographic_project(joints, state["cam"]), img_wh
        )
        se = jnp.sum((target_j2d - j2d) ** 2, axis=-1)
        joints2d_loss = jnp.sum(se * vis) / jnp.maximum(jnp.sum(vis) * 2.0, 1.0)

        head_out = model.apply(
            params,
            None,
            input_feats=input_feats,
            compute_point_est=False,
            compute_for_loglik=True,
            shape_for_loglik=state["shape"],
            pose_R_for_loglik=pose_r,
            glob_R_for_loglik=glob_r,
        )
        pose_lp = model.pose_log_prob(
            params, pose_r, head_out["pose_flow_contexts_for_loglik"]
        )  # (B, 23)
        pose_logprob = jnp.sum(pose_lp) / b

        mode = head_out["shape_mode"]
        log_std = head_out["shape_log_std"]
        var = jnp.exp(2.0 * log_std)
        shape_lp = (
            -0.5 * ((state["shape"] - mode) ** 2) / var
            - log_std
            - 0.5 * math.log(2 * math.pi)
        )
        shape_logprob = jnp.sum(shape_lp) / b

        total = (
            joints2d_loss * w.JOINTS2D
            - pose_logprob * w.POSE_PRIOR
            - shape_logprob * w.SHAPE_PRIOR
        )
        return total, {
            "joints2D": joints2d_loss,
            "pose_logprob": pose_logprob,
            "shape_logprob": shape_logprob,
        }

    @jax.jit
    def run(params, state, input_feats, target_j2d, vis):
        def body(_, carry):
            state, halted, aux_prev = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state, params, input_feats, target_j2d, vis
            )
            new_state = jax.tree_util.tree_map(
                lambda p, g: p - lr * g, state, grads
            )
            finite = jnp.all(
                jnp.stack(
                    [
                        jnp.all(jnp.isfinite(leaf))
                        for leaf in jax.tree_util.tree_leaves(new_state)
                    ]
                )
            ) & jnp.isfinite(loss)
            use_new = finite & ~halted
            state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(use_new, new, old), new_state, state
            )
            aux = jax.tree_util.tree_map(
                lambda new, old: jnp.where(use_new, new, old), aux, aux_prev
            )
            return state, halted | ~finite, aux

        # pre-optimisation loss terms
        _, aux0 = loss_fn(state, params, input_feats, target_j2d, vis)
        out = jax.lax.fori_loop(
            0, num_iters, body, (state, jnp.array(False), aux0)
        )
        return out, aux0

    def fn(params, init: Dict) -> Dict:
        from ..ops.so3 import so3_log

        b = init["shape"].shape[0]
        glob_aa = (
            init["glob_axisangle"]
            if "glob_axisangle" in init
            else so3_log(init["glob_rotmat"])
        )
        state = {
            "pose": init["pose_axisangle"].reshape(b, 23 * 3),
            "glob": glob_aa,
            "shape": init["shape"],
            "cam": init["cam_wp"],
        }
        vis = init["joints2D_conf"] > thresh
        # torso/head joints always kept (reference :59)
        vis = vis.at[:, jnp.arange(7)].set(True).astype(jnp.float32)

        (final_state, halted, aux), aux0 = run(
            params, state, init["input_feats"], init["joints2D"], vis
        )
        return {
            "pose_axisangle": final_state["pose"].reshape(b, 23, 3),
            "glob_axisangle": final_state["glob"],
            "shape": final_state["shape"],
            "cam_wp": final_state["cam"],
            "halted_on_nan": halted,
            "initial_losses": aux0,
            "final_losses": aux,
        }

    return fn


def optimise_batch_with_humaniflow_prior(
    model: HumaniflowModel,
    params,
    smpl: SMPLModel,
    optimise_cfg: OptimiseConfig,
    init: Dict,
    img_wh: int = 256,
) -> Dict:
    """Refine SMPL parameters against 2D joints with the flow prior.

    One-shot convenience wrapper over `make_optimise_fn` — builds (and
    traces) the program per call.  Callers looping over batches should
    build the fn once with `make_optimise_fn` instead.

    :param init: dict with
        shape (B, nb), pose_axisangle (B, 23, 3), glob_rotmat (B, 3, 3) or
        glob_axisangle (B, 3), cam_wp (B, 3), input_feats (B, F),
        joints2D (B, 17, 2) target pixels, joints2D_conf (B, 17).
    :return: dict with optimised pose_axisangle/shape/cam_wp/glob_axisangle
        plus final loss terms.
    """
    return make_optimise_fn(model, smpl, optimise_cfg, img_wh)(params, init)
