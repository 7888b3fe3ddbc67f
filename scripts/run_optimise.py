"""Optimisation CLI (reference: scripts/run_optimise.py): refine predictions
in `pred_output_dir` (from run_predict.py) with the flow prior."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_image_dir", "-I", type=str, required=True)
    parser.add_argument("--pred_output_dir", "-P", type=str, required=True)
    parser.add_argument("--opt_output_dir", "-S", type=str, required=True)
    parser.add_argument("--checkpoint", "-C", type=str, required=True)
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--optimise_cfg", type=str, default=None,
                        help="yaml overriding the optimisation config "
                             "(LR / NUM_ITERS / LOSS_WEIGHTS / "
                             "JOINTS2D_VISIB_THRESHOLD)")
    parser.add_argument("--no_visualise", action="store_true",
                        help="skip the post-optimisation comparison renders")
    args = parser.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from humaniflow_tpu.configs import (
        load_config,
        load_optimise_config,
        paths,
    )
    from humaniflow_tpu.data.datasets import load_opt_initialise_data_from_pred_output
    from humaniflow_tpu.models import HumaniflowModel, load_smpl_npz
    from humaniflow_tpu.pipelines.optimise import optimise_batch_with_humaniflow_prior
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    cfg = load_config(args.cfg)
    opt_cfg = load_optimise_config(args.optimise_cfg)
    model = HumaniflowModel(cfg.MODEL)
    if args.checkpoint.endswith(".tar"):
        from humaniflow_tpu.utils.convert_torch import convert_humaniflow_file

        params = convert_humaniflow_file(args.checkpoint, model)
    else:
        state = load_checkpoint(args.checkpoint)
        params = state.get("best_params", state.get("params", state))

    smpl = load_smpl_npz(
        paths.SMPL_NEUTRAL,
        regressor_paths={
            "extra": paths.J_REGRESSOR_EXTRA,
            "cocoplus": paths.COCOPLUS_REGRESSOR,
            "h36m": paths.H36M_REGRESSOR,
        },
    )

    data = load_opt_initialise_data_from_pred_output(
        args.pred_image_dir, args.pred_output_dir
    )
    init = {
        "shape": jnp.asarray(data["shape_mode"]),
        "pose_axisangle": jnp.asarray(data["pose_axisangle_point_est"]),
        "glob_rotmat": jnp.asarray(data["glob_rotmat"]),
        "cam_wp": jnp.asarray(data["cam_wp"]),
        "input_feats": jnp.asarray(data["input_feats"]),
        "joints2D": jnp.asarray(data["cropped_joints2D"]),
        "joints2D_conf": jnp.asarray(data["hrnet_joints2D_conf"]),
    }
    out = optimise_batch_with_humaniflow_prior(
        model, params, smpl, opt_cfg, init, img_wh=cfg.DATA.PROXY_REP_SIZE
    )

    os.makedirs(args.opt_output_dir, exist_ok=True)
    for i, fname in enumerate(data["fnames"]):
        np.savez(
            os.path.join(args.opt_output_dir, os.path.splitext(fname)[0] + "_opt.npz"),
            pose_axisangle=np.asarray(out["pose_axisangle"][i]),
            shape=np.asarray(out["shape"][i]),
            cam_wp=np.asarray(out["cam_wp"][i]),
        )
    print(f"Optimised {len(data['fnames'])} predictions → {args.opt_output_dir}")
    print("initial losses:", {k: float(v) for k, v in out["initial_losses"].items()})
    print("final losses:  ", {k: float(v) for k, v in out["final_losses"].items()})

    # ---- post-optimisation visualisations (reference
    # optimise/optimise_humaniflow.py:147-217): per-image point-estimate
    # comparison figure + composite back onto the original image
    if not args.no_visualise and os.path.exists(paths.DENSEPOSE_UV):
        import math

        import cv2

        from humaniflow_tpu.models import smpl_forward
        from humaniflow_tpu.ops.rotation import aa_rotate_translate_points
        from humaniflow_tpu.ops.so3 import so3_exp
        from humaniflow_tpu.render import TexturedIUVRenderer
        from humaniflow_tpu.utils.visualise import (
            render_point_est_visualisation,
            uncrop_point_est_visualisation,
        )

        wh = cfg.DATA.PROXY_REP_SIZE
        renderer = TexturedIUVRenderer(img_wh=wh, projection_type="orthographic")
        pose_r = so3_exp(jnp.asarray(out["pose_axisangle"]))
        glob_r = so3_exp(jnp.asarray(out["glob_axisangle"]))
        verts = smpl_forward(smpl, jnp.asarray(out["shape"]), pose_r, glob_r)["vertices"]
        x_axis = jnp.asarray([1.0, 0.0, 0.0])
        verts_flipped = aa_rotate_translate_points(
            verts, x_axis, math.pi, jnp.zeros(3)
        )
        proxy_vis = None
        if "proxy_rep" in data:
            proxy_vis = data["proxy_rep"].sum(axis=-1, keepdims=True).repeat(3, axis=-1)
            proxy_vis = np.clip(proxy_vis, 0.0, 1.0)
        figs = render_point_est_visualisation(
            renderer, verts_flipped, jnp.asarray(out["cam_wp"]),
            input_image=data.get("cropped_image"),
            proxy_image=proxy_vis,
            joints2d=data.get("cropped_joints2D"),
            joints2d_confs=data.get("hrnet_joints2D_conf"),
        )
        have_bbox = all(
            k in data for k in ("bbox_centre", "bbox_height", "bbox_width")
        )
        for i, fname in enumerate(data["fnames"]):
            stem = os.path.splitext(fname)[0]
            cv2.imwrite(
                os.path.join(args.opt_output_dir, stem + "_opt.png"),
                (figs["figure"][i][:, :, ::-1] * 255).astype(np.uint8),
            )
            if not have_bbox:
                continue
            orig = cv2.imread(os.path.join(args.pred_image_dir, fname))
            if orig is None:
                continue
            orig = cv2.cvtColor(orig, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
            render0 = figs["renders"]["0"][i : i + 1]
            sil0 = (render0.sum(-1) > 0).astype(np.float32)
            wh_box = max(float(data["bbox_height"][i]), float(data["bbox_width"][i]))
            uncropped = uncrop_point_est_visualisation(
                render0, sil0, data["bbox_centre"][i][None], np.asarray([wh_box]),
                orig[None], bbox_scale_factor=cfg.DATA.BBOX_SCALE_FACTOR,
            )
            cv2.imwrite(
                os.path.join(args.opt_output_dir, stem + "_opt_uncrop.png"),
                (uncropped[0][:, :, ::-1] * 255).astype(np.uint8),
            )
        print("Saved post-optimisation visualisations (_opt.png, _opt_uncrop.png).")


if __name__ == "__main__":
    main()
