"""Full training pipeline: on-device synthetic-data generation → forward →
loss → update, with epoch loops, metric tracking, checkpointing and resume.

Capability parity with reference `train/train_humaniflow.py:27-407` +
`scripts/run_train.py`, TPU-first:

* the reference generates synthetic data in eager torch inside the batch loop
  (:113-245: SMPL targets, pytorch3d render, crop, augmentations, Canny,
  heatmaps); here the ENTIRE data-generation stage is one jitted function
  (`make_synth_data_fn`) driven by a PRNG key — poses/textures/backgrounds
  are the only host inputs (from OnTheFlySMPLTrainDataset);
* forward+loss+backward+update is the fused train step
  (pipelines/train_step.py) with the functional NaN rollback;
* checkpoints: params/opt_state/best bookkeeping saved every EPOCHS_PER_SAVE
  epochs, resume restores history (reference :377-401).
"""

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs.defaults import HumaniflowConfig
from ..data.augmentation import (
    augment_cam_t,
    augment_light_colour,
    augment_light_t,
    augment_proxy_representation,
    augment_rgb,
    normal_sample_shape,
    random_extreme_crop,
)
from ..data.image_ops import batch_add_rgb_background, batch_crop_affine
from ..data.joints2d_utils import check_joints2d_occluded, check_joints2d_visibility
from ..data.label_conversions import (
    ALL_JOINTS_TO_COCO_MAP,
    convert_2d_joints_to_gaussian_heatmaps,
    convert_densepose_seg_to_14part_labels,
)
from ..metrics.train_metrics import TrainingLossesAndMetricsTracker
from ..models.canny import CannyEdgeDetector
from ..models.humaniflow import HumaniflowModel
from ..models.smpl import SMPLModel, smpl_forward
from ..ops.camera import perspective_project
from ..ops.rotation import aa_rotate_rotmats, aa_rotate_translate_points
from ..ops.so3 import so3_exp
from ..utils.checkpoints import save_checkpoint
from .train_step import make_train_step

_COCO = np.asarray(ALL_JOINTS_TO_COCO_MAP)


def make_optimizer(cfg: HumaniflowConfig) -> optax.GradientTransformation:
    """Adam at the reference LR (train_humaniflow.py setup).

    NOTE: `optax.flatten(adam)` times 5.9 → 0.9 ms as a STANDALONE jitted
    update over the 128-leaf tree, but makes the fused train step SLOWER
    (36.3 → 42.9 ms on v5e) — the flatten's grad concatenation blocks XLA
    from fusing the per-tensor update into the backward pass epilogues.
    Keep plain adam."""
    return optax.adam(cfg.TRAIN.LR)


def make_synth_data_fn(
    cfg: HumaniflowConfig, smpl: SMPLModel, renderer
):
    """Build the jitted synthetic-data generator.

    (key, pose72 (B,72), texture (B,1200,800,3), background (B,wh,wh,3)) →
    training batch dict (reference: train_humaniflow.py:113-245).
    """
    sd = cfg.TRAIN.SYNTH_DATA
    aug = sd.AUGMENT
    img_wh = cfg.DATA.PROXY_REP_SIZE
    edge_detector = CannyEdgeDetector(
        non_max_suppression=cfg.DATA.EDGE_NMS,
        gaussian_filter_std=cfg.DATA.EDGE_GAUSSIAN_STD,
        gaussian_filter_size=cfg.DATA.EDGE_GAUSSIAN_SIZE,
        threshold=cfg.DATA.EDGE_THRESHOLD,
    )
    coco = jnp.asarray(_COCO)
    x_axis = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)
    mean_cam_t = jnp.asarray(sd.MEAN_CAM_T, jnp.float32)

    @jax.jit
    def synth_batch(key, pose72, texture, background):
        b = pose72.shape[0]
        keys = jax.random.split(key, 10)

        # ---------------- random pose/shape/camera targets (:114-150)
        pose_r24 = so3_exp(pose72.reshape(b, 24, 3))
        glob_r = pose_r24[:, 0]
        body_r = pose_r24[:, 1:]
        # x-axis 180° post-flip so targets are y-up in 3D space (:124-129)
        _, glob_r = aa_rotate_rotmats(glob_r, x_axis, math.pi, rot_mult_order="post")
        shape = normal_sample_shape(
            keys[0], b, jnp.zeros(cfg.MODEL.NUM_SMPL_BETAS),
            jnp.full((cfg.MODEL.NUM_SMPL_BETAS,), aug.SMPL.SHAPE_STD),
        )
        cam_t = augment_cam_t(
            keys[1], jnp.broadcast_to(mean_cam_t, (b, 3)),
            xy_std=aug.CAM.XY_STD, delta_z_range=aug.CAM.DELTA_Z_RANGE,
        )

        smpl_out = smpl_forward(smpl, shape, body_r, glob_r)
        verts = smpl_out["vertices"]
        joints = smpl_out["joints"]

        # ---------------- render + 2D targets (:152-186)
        verts_render = aa_rotate_translate_points(verts, x_axis, math.pi, zero3)
        joints_coco = aa_rotate_translate_points(
            joints[:, coco], x_axis, math.pi, zero3
        )
        j2d = perspective_project(
            joints_coco, None, cam_t,
            focal_length=sd.FOCAL_LENGTH, img_wh=img_wh,
        )
        j2d_vis = check_joints2d_visibility(j2d, img_wh)

        lights = augment_light_colour(
            keys[2], 1,
            ambient_intensity_range=aug.RGB.LIGHT_AMBIENT_RANGE,
            diffuse_intensity_range=aug.RGB.LIGHT_DIFFUSE_RANGE,
            specular_intensity_range=aug.RGB.LIGHT_SPECULAR_RANGE,
        )
        lights["location"] = augment_light_t(keys[3], 1, aug.RGB.LIGHT_LOC_RANGE)
        render = renderer(
            verts_render, cam_t=cam_t, textures=texture,
            lights_rgb_settings=lights,
        )
        iuv = render["iuv_images"]  # (B, wh, wh, 3) part/U/V
        rgb = render["rgb_images"]

        # ---------------- extreme crop + bbox crop w/ jitter (:187-206)
        seg_extreme = random_extreme_crop(
            keys[4], iuv[..., 0].astype(jnp.int32),
            extreme_crop_probability=aug.PROXY_REP.EXTREME_CROP_PROB,
        )
        crop = batch_crop_affine(
            (img_wh, img_wh),
            iuv=iuv, rgb=rgb, joints2d=j2d,
            bbox_determiner=seg_extreme.astype(jnp.float32),
            orig_scale_factor=cfg.DATA.BBOX_SCALE_FACTOR,
            key=keys[5],
            delta_scale_range=aug.BBOX.DELTA_SCALE_RANGE,
            delta_centre_range=aug.BBOX.DELTA_CENTRE_RANGE,
            out_of_frame_pad_val=-1.0,
        )
        iuv = crop["iuv"]
        rgb = crop["rgb"]
        j2d = crop["joints2d"]
        seg = jnp.round(iuv[..., 0]).astype(jnp.int32)

        # ---------------- visibility + occlusion checks (:208-216)
        j2d_vis = check_joints2d_visibility(j2d, img_wh, j2d_vis)
        seg14 = convert_densepose_seg_to_14part_labels(jnp.maximum(seg, 0))
        j2d_vis = check_joints2d_occluded(seg14, j2d_vis)

        # ---------------- proxy + RGB augmentation (:218-233)
        seg_aug, j2d_input, j2d_vis = augment_proxy_representation(
            keys[6], seg, j2d, j2d_vis, aug.PROXY_REP
        )
        rgb = batch_add_rgb_background(background, rgb, seg_aug)
        rgb, j2d_input, j2d_vis = augment_rgb(
            keys[7], rgb, j2d_input, j2d_vis, aug.RGB
        )

        # ---------------- edges + heatmaps → proxy (:234-245)
        edges = edge_detector(rgb)
        edge_in = (
            edges["thresholded_thin_edges"]
            if cfg.DATA.EDGE_NMS
            else edges["thresholded_grad_magnitude"]
        )
        heatmaps = convert_2d_joints_to_gaussian_heatmaps(
            j2d_input, img_wh, std=cfg.DATA.HEATMAP_GAUSSIAN_STD
        )
        heatmaps = heatmaps * j2d_vis.astype(jnp.float32)[:, :, None, None]
        proxy = jnp.concatenate(
            [edge_in, jnp.moveaxis(heatmaps, 1, -1)], axis=-1
        )

        out = {
            "proxy": proxy,
            "pose_rotmats": body_r,
            "glob_rotmats": glob_r,
            "shape": shape,
            "joints2D": j2d,
            "joints2D_vis": j2d_vis.astype(jnp.float32),
            "rgb_in": rgb,
        }
        if "binning_overflow" in render:
            # renderer.emit_overflow: VISIBLE candidates dropped by the
            # binned backend's live_cap this batch — the train loop
            # accumulates it on device and warns per epoch (operator
            # visibility for the tightened culled-render caps,
            # scripts/run_train.py)
            out["binning_overflow"] = render["binning_overflow"]
        return out

    return synth_batch


def train_humaniflow(
    model: HumaniflowModel,
    smpl: SMPLModel,
    cfg: HumaniflowConfig,
    renderer,
    train_dataset,
    val_dataset,
    experiment_dir: str,
    params=None,
    opt_state=None,
    metrics_to_track=("PVE-SC", "joints2D-L2E"),
    save_val_metrics=("PVE-SC",),
    resume_state: Optional[Dict] = None,
    num_epochs: Optional[int] = None,
    steps_per_epoch: Optional[int] = None,
    key=None,
    mesh=None,
):
    """Epoch loop (reference: train_humaniflow.py:94-407).

    NOTE: the train step donates its (params, opt_state) buffers — the
    arrays passed in are consumed; use the returned pytrees.
    """
    os.makedirs(experiment_dir, exist_ok=True)
    if key is None:
        key = jax.random.PRNGKey(0)
    optimizer = make_optimizer(cfg)
    if params is None:
        key, sub = jax.random.split(key)
        params = model.init(
            sub, input_shape=(1, cfg.DATA.PROXY_REP_SIZE, cfg.DATA.PROXY_REP_SIZE,
                              cfg.MODEL.NUM_IN_CHANNELS),
        )
    if opt_state is None:
        opt_state = optimizer.init(params)

    shard_inputs = None
    if mesh is not None:
        from ..parallel.mesh import replicate, shard_batch

        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        n_dev = mesh.devices.size
        if bsz_check := (cfg.TRAIN.BATCH_SIZE % n_dev):
            raise ValueError(
                f"TRAIN.BATCH_SIZE={cfg.TRAIN.BATCH_SIZE} must divide the "
                f"mesh device count {n_dev} (remainder {bsz_check})"
            )
        # Shard the host inputs over the data axis BEFORE the jitted
        # synth-data generator: GSPMD propagates the batch sharding through
        # data gen → forward → loss, and inserts the gradient all-reduce
        # (psum over ICI) from the sharding annotations alone.
        shard_inputs = lambda tree: shard_batch(tree, mesh)

    synth_batch = make_synth_data_fn(cfg, smpl, renderer)
    step_fn = make_train_step(
        model, smpl, cfg.LOSS, optimizer, img_wh=cfg.DATA.PROXY_REP_SIZE,
        emit_metric_tensors=bool(metrics_to_track),
    )
    train_step = jax.jit(step_fn, donate_argnums=(0, 1))
    # validation: same fused program without buffer donation; the returned
    # update is discarded (loss/metrics only)
    val_step = jax.jit(step_fn)

    current_epoch = 0
    best_epoch = 0
    best_epoch_val_metrics = {m: np.inf for m in save_val_metrics}
    # device copy: train_step donates `params`, so a bare alias would be
    # deleted by the next step and poison checkpoint saves
    best_params = jax.tree_util.tree_map(jnp.copy, params)
    if resume_state is not None:
        from ..utils.checkpoints import load_training_info_from_checkpoint

        current_epoch, best_epoch, best_epoch_val_metrics = (
            load_training_info_from_checkpoint(resume_state, save_val_metrics)
        )
        params = resume_state["params"]
        opt_state = resume_state["opt_state"]
        best_params = resume_state.get("best_params", params)

    tracker = TrainingLossesAndMetricsTracker(
        metrics_to_track, cfg.DATA.PROXY_REP_SIZE,
        log_save_path=os.path.join(experiment_dir, "log.pkl"),
        load_logs=resume_state is not None, current_epoch=current_epoch,
    )

    num_epochs = num_epochs or cfg.TRAIN.NUM_EPOCHS
    bsz = cfg.TRAIN.BATCH_SIZE
    for epoch in range(current_epoch, num_epochs):
        tracker.initialise_loss_metric_sums()
        # Per-batch scalar sums stay ON DEVICE, PACKED into one small
        # vector per step, and are fetched as ONE concatenated array at
        # epoch end — a per-step fetch costs a tunnel RTT (~30 ms,
        # measured 178 vs 152 ms/iter), and a multi-hundred-leaf
        # device_get pays per-array transfer setup that measured
        # seconds-to-minutes (docs/DESIGN.md "Measurement methodology").
        pending_meta, pending_vals, pending_defs = [], [], []
        epoch_overflow = None  # device-side running render-cap overflow
        for split, dataset in (("train", train_dataset), ("val", val_dataset)):
            step_count = 0
            for host_batch in dataset.epoch_batches(bsz):
                key, k1, k2 = jax.random.split(key, 3)
                dev_inputs = {
                    "pose": jnp.asarray(host_batch["pose"]),
                    "texture": jnp.asarray(host_batch["texture"]),
                    "background": jnp.asarray(host_batch["background"]),
                }
                if shard_inputs is not None:
                    dev_inputs = shard_inputs(dev_inputs)
                batch = synth_batch(
                    k1, dev_inputs["pose"], dev_inputs["texture"],
                    dev_inputs["background"],
                )
                batch.pop("rgb_in")
                ov = batch.pop("binning_overflow", None)
                if ov is not None:
                    epoch_overflow = (
                        ov if epoch_overflow is None else epoch_overflow + ov
                    )
                if split == "train":
                    params, opt_state, metrics = train_step(params, opt_state, batch, k2)
                else:
                    _, _, metrics = val_step(params, opt_state, batch, k2)
                mt = metrics.pop("metric_tensors", None)
                if mt is not None and metrics_to_track:
                    vals = tracker.batch_sums_device(
                        metrics["total"],
                        {
                            "verts3D": mt["pred_verts3D"],
                            "joints3D": mt["pred_joints3D"],
                            "joints2D": mt["pred_joints2D"],
                        },
                        {
                            "verts3D": mt["target_verts3D"],
                            "joints3D": mt["target_joints3D"],
                            "joints2D": batch["joints2D"],
                            "joints2D_vis": batch["joints2D_vis"],
                        },
                    )
                else:
                    vals = {"loss": metrics["total"], "sums": {}}
                leaves, treedef = jax.tree_util.tree_flatten(vals)
                pending_meta.append((split, bsz))
                pending_vals.append(jnp.stack(leaves).astype(jnp.float32))
                pending_defs.append(treedef)
                step_count += 1
                if steps_per_epoch is not None and step_count >= steps_per_epoch:
                    break
        if pending_vals:
            sizes = [int(v.shape[0]) for v in pending_vals]
            # one fetch for scalars + the render-overflow counter (separate
            # device_gets would pay an extra tunnel RTT per epoch)
            flat, ov_total = jax.device_get(
                (jnp.concatenate(pending_vals), epoch_overflow)
            )
            if ov_total is not None and int(ov_total) > 0:
                print(
                    f"WARNING: synth-data render dropped {int(ov_total)} "
                    f"visible face-candidates this epoch (binned_live_cap "
                    f"exceeded — bottom-image-strip content is lost).  "
                    f"Raise binned_live_cap (TexturedIUVRenderer) if this "
                    f"persists"
                )
            off = 0
            for (split, b), treedef, size in zip(pending_meta, pending_defs, sizes):
                vals = jax.tree_util.tree_unflatten(
                    treedef, list(flat[off : off + size])
                )
                off += size
                tracker.add_batch_sums(split, vals, b)
        tracker.update_per_epoch()

        if tracker.determine_save_model_weights_this_epoch(
            save_val_metrics, best_epoch_val_metrics
        ):
            best_epoch = epoch
            for m in save_val_metrics:
                best_epoch_val_metrics[m] = tracker.epochs_history[f"val_{m}"][-1]
            best_params = jax.tree_util.tree_map(jnp.copy, params)

        if epoch % cfg.TRAIN.EPOCHS_PER_SAVE == 0:
            save_checkpoint(
                experiment_dir, f"epoch_{epoch:06d}",
                {
                    "epoch": epoch,
                    "best_epoch": best_epoch,
                    "best_epoch_val_metrics": dict(best_epoch_val_metrics),
                    "params": params,
                    "best_params": best_params,
                    "opt_state": opt_state,
                },
            )
    return params, best_params
