"""Jitted training step: teacher-forced forward → loss → Adam update with a
functional NaN-rollback guard, data-parallel over a device mesh.

Capability parity with the reference train loop's per-batch work
(train/train_humaniflow.py:246-366) redesigned for TPU:

* the reference deep-copies model+optimizer state dicts every batch and
  reloads them when NaNs appear (:264-278, :349-350); here the update is
  functional — when the loss or gradients are non-finite the step returns
  the previous (params, opt_state) via a where-select, so "rollback" is free
  (no copies, no host sync, no batch redo);
* forward + loss + backward + update is ONE fused XLA program with donated
  buffers; batch arrives sharded over the `data` mesh axis and XLA inserts
  the gradient all-reduce from the sharding annotations.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs.defaults import LossConfig
from ..data.label_conversions import ALL_JOINTS_TO_COCO_MAP
from ..losses.humaniflow_loss import humaniflow_loss
from ..models.humaniflow import HumaniflowModel
from ..models.smpl import SMPLModel, smpl_forward
from ..ops.camera import orthographic_project


def predict_joints2d(
    smpl: SMPLModel, shape, pose_rotmats, glob_rotmat, cam_wp
):
    """SMPL → COCO joints → weak-perspective projection.

    Works for point estimates (B, ...) and flattens a samples axis if present.
    :return: (B, 17, 2) or (B, N, 17, 2)
    """
    coco = jnp.asarray(ALL_JOINTS_TO_COCO_MAP)
    if pose_rotmats.ndim == 5:  # (B, N, 23, 3, 3) samples
        b, n = pose_rotmats.shape[:2]
        out = smpl_forward(
            smpl,
            shape.reshape(b * n, -1),
            pose_rotmats.reshape(b * n, 23, 3, 3),
            jnp.broadcast_to(glob_rotmat[:, None], (b, n, 3, 3)).reshape(b * n, 3, 3),
        )
        joints = out["joints"][:, coco]
        cam = jnp.broadcast_to(cam_wp[:, None], (b, n, 3)).reshape(b * n, 3)
        j2d = orthographic_project(joints, cam)
        return j2d.reshape(b, n, 17, 2)
    out = smpl_forward(smpl, shape, pose_rotmats, glob_rotmat)
    return orthographic_project(out["joints"][:, coco], cam_wp)


def make_train_step(
    model: HumaniflowModel,
    smpl: SMPLModel,
    loss_cfg: LossConfig,
    optimizer: optax.GradientTransformation,
    img_wh: int = 256,
    num_j2d_samples: Optional[int] = None,
    emit_metric_tensors: bool = False,
):
    """Build the jittable train step closure.

    batch keys: proxy (B,H,W,18), pose_rotmats (B,23,3,3), glob_rotmats
    (B,3,3), shape (B,nb), joints2D (B,17,2) px, joints2D_vis (B,17).

    With emit_metric_tensors, the metrics dict additionally carries the
    point-estimate/target tensors the training tracker consumes
    (pred/target verts3D, joints3D, joints2D — reference train loop
    :281-366) — still one fused program, no extra forward.
    """
    n_samples = (
        loss_cfg.NUM_J2D_SAMPLES if num_j2d_samples is None else num_j2d_samples
    )
    use_point_est = "point_est" in loss_cfg.J2D_LOSS_ON
    use_samples = "samples" in loss_cfg.J2D_LOSS_ON
    h36m_j14 = None
    if emit_metric_tensors:
        from ..data.label_conversions import ALL_JOINTS_TO_H36M_MAP, H36M_TO_J14

        h36m_j14 = jnp.asarray(np.asarray(ALL_JOINTS_TO_H36M_MAP)[np.asarray(H36M_TO_J14)])

    def _metric_tensors(out, batch):
        pe = smpl_forward(
            smpl, out["shape_mode"], out["pose_rotmats_point_est"],
            out["glob_rotmat"],
        )
        tgt = smpl_forward(
            smpl, batch["shape"], batch["pose_rotmats"], batch["glob_rotmats"]
        )
        return {
            "pred_verts3D": pe["vertices"],
            "target_verts3D": tgt["vertices"],
            "pred_joints3D": pe["joints"][:, h36m_j14],
            "target_joints3D": tgt["joints"][:, h36m_j14],
        }

    def loss_fn(params, batch, key):
        out = model.apply(
            params,
            batch["proxy"],
            key=key,
            compute_point_est=use_point_est,
            num_samples=n_samples if use_samples else 0,
            compute_for_loglik=True,
            shape_for_loglik=batch["shape"],
            pose_R_for_loglik=batch["pose_rotmats"],
            glob_R_for_loglik=batch["glob_rotmats"],
            train=True,
        )
        pose_lp = model.pose_log_prob(
            params, batch["pose_rotmats"], out["pose_flow_contexts_for_loglik"]
        )

        j2d_preds = []
        if use_point_est:
            j2d_pe = predict_joints2d(
                smpl, out["shape_mode"], out["pose_rotmats_point_est"],
                out["glob_rotmat"], out["cam_wp"],
            )
            j2d_preds.append(j2d_pe[:, None])
        if use_samples:
            j2d_s = predict_joints2d(
                smpl, out["shape_samples"], out["pose_rotmats_samples"],
                out["glob_rotmat"], out["cam_wp"],
            )
            j2d_preds.append(j2d_s)

        pred = {
            "pose_log_probs": pose_lp,
            "shape_mode": out["shape_mode"],
            "shape_log_std": out["shape_log_std"],
            "joints2D": jnp.concatenate(j2d_preds, axis=1),
            "glob_rotmats": out["glob_rotmat"],
        }
        target = {
            "shape_params": batch["shape"],
            "joints2D": batch["joints2D"],
            "joints2D_vis": batch["joints2D_vis"],
            "glob_rotmats": batch["glob_rotmats"],
        }
        total, breakdown = humaniflow_loss(loss_cfg, img_wh, pred, target)
        if emit_metric_tensors:
            mt = jax.lax.stop_gradient(_metric_tensors(out, batch))
            mt["pred_joints2D"] = jax.lax.stop_gradient(pred["joints2D"][:, 0])
            breakdown = {**breakdown, "metric_tensors": mt}
        flow_ctx = (
            jax.lax.stop_gradient(out["pose_flow_contexts_for_loglik"])
            if model.flow.has_batch_norm
            else None
        )
        return total, (breakdown, out.get("encoder_batch_stats"), flow_ctx)

    def train_step(params, opt_state, batch, key):
        (loss, (breakdown, new_bn, flow_ctx)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, key)

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if new_bn is not None:
            new_params = dict(new_params)
            new_params["encoder"] = dict(new_params["encoder"])
            new_params["encoder"]["batch_stats"] = new_bn
        if flow_ctx is not None:
            # EMA-update FlowBatchNorm running stats from this batch's
            # teacher-forced targets (no-op unless NORM_FLOW batch_norm on)
            new_params = model.update_pose_flow_batchnorm_stats(
                new_params, batch["pose_rotmats"], flow_ctx
            )

        # Functional NaN rollback (reference: train_humaniflow.py:264-278):
        # non-finite loss or gradient norm → keep previous state.
        gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), new, old
        )
        params_out = keep(new_params, params)
        opt_state_out = keep(new_opt_state, opt_state)
        metrics = dict(breakdown)
        metrics["grad_norm"] = gnorm
        metrics["nan_skipped"] = (~ok).astype(jnp.float32)
        return params_out, opt_state_out, metrics

    return train_step
