"""HumaniflowLoss: pose NLL + shape NLL + visible-joints2D MSE + glob MSE.

Capability parity with reference `losses/humaniflow_loss.py:5-79`, functional:

* pose NLL scores all 23 parts in one fused SO(3)-flow log_prob call
  (the reference loops over per-part distribution objects, :30-31);
* the visible-joint MSE uses mask-and-normalise semantics identical to
  torch's boolean-indexing + MSELoss(mean) (sum over visible elements /
  (num_visible * 2));
* weights and reduction come from the LossConfig (same defaults:
  POSE=150, SHAPE=50, JOINTS2D=25000, GLOB_ROTMATS=5000).
"""

import math
from typing import Dict

import jax.numpy as jnp

from ..configs.defaults import LossConfig


def _masked_mse(pred, target, mask):
    """torch MSELoss(mean) over boolean-selected rows: mask (..., K) selects
    joint rows of pred/target (..., K, D)."""
    se = jnp.sum((pred - target) ** 2, axis=-1)  # (..., K)
    total = jnp.sum(se * mask)
    count = jnp.maximum(jnp.sum(mask) * pred.shape[-1], 1.0)
    return total / count


def humaniflow_loss(
    loss_cfg: LossConfig,
    img_wh: int,
    pred: Dict,
    target: Dict,
):
    """Compute the total training loss and per-term breakdown.

    pred keys:
      pose_log_probs      (B, 23)  per-part SO(3) log p(R_target | context)
      shape_mode / shape_log_std (B, nb)
      joints2D            (B, S, K, 2) predicted 2D joints in [-1, 1]
                          (point-est and/or samples stacked on axis 1)
      glob_rotmats        (B, 3, 3)
      optional verts / joints3D for the point-estimate losses
    target keys:
      shape_params (B, nb); joints2D (B, K, 2) pixels; joints2D_vis (B, K);
      glob_rotmats (B, 3, 3); optional verts / joints3D
    """
    b, num_parts = pred["pose_log_probs"].shape

    # ----- pose NLL (reference :25-38; mean divides by B * num_parts)
    pose_nll = -jnp.sum(pred["pose_log_probs"])
    if loss_cfg.REDUCTION == "mean":
        pose_nll = pose_nll / (b * num_parts)

    # ----- shape NLL under diagonal Gaussian (reference :40-46)
    mode = pred["shape_mode"]
    log_std = pred["shape_log_std"]
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * ((target["shape_params"] - mode) ** 2) / var - log_std - 0.5 * math.log(
        2 * math.pi
    )
    shape_nll = -jnp.sum(lp, axis=1)  # (B,)
    shape_nll = jnp.mean(shape_nll) if loss_cfg.REDUCTION == "mean" else jnp.sum(shape_nll)

    # ----- visible joints2D MSE (reference :48-60)
    t_j2d = (2.0 * target["joints2D"]) / img_wh - 1.0
    s = pred["joints2D"].shape[1]
    t_j2d = jnp.broadcast_to(t_j2d[:, None], pred["joints2D"].shape)
    vis = jnp.broadcast_to(target["joints2D_vis"][:, None], pred["joints2D"].shape[:-1])
    joints2d_loss = _masked_mse(pred["joints2D"], t_j2d, vis.astype(jnp.float32))

    # ----- glob rotmat MSE (reference :63)
    glob_loss = jnp.mean((pred["glob_rotmats"] - target["glob_rotmats"]) ** 2)

    w = loss_cfg.WEIGHTS
    total = (
        pose_nll * w.POSE
        + shape_nll * w.SHAPE
        + joints2d_loss * w.JOINTS2D
        + glob_loss * w.GLOB_ROTMATS
    )

    breakdown = {
        "pose_nll": pose_nll,
        "shape_nll": shape_nll,
        "joints2D": joints2d_loss,
        "glob_rotmats": glob_loss,
    }

    # ----- optional 3D point-estimate losses (reference :70-77)
    if loss_cfg.APPLY_POINT_EST_LOSS:
        verts_loss = jnp.mean((pred["verts"] - target["verts"]) ** 2)
        joints3d_loss = jnp.mean((pred["joints3D"] - target["joints3D"]) ** 2)
        total = total + verts_loss * w.VERTS3D + joints3d_loss * w.JOINTS3D
        breakdown["verts3D"] = verts_loss
        breakdown["joints3D"] = joints3d_loss

    breakdown["total"] = total
    return total, breakdown
