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
    args = parser.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from humaniflow_tpu.configs import (
        get_optimise_cfg_defaults,
        load_config,
        paths,
    )
    from humaniflow_tpu.data.datasets import load_opt_initialise_data_from_pred_output
    from humaniflow_tpu.models import HumaniflowModel, load_smpl_npz
    from humaniflow_tpu.pipelines.optimise import optimise_batch_with_humaniflow_prior
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    cfg = load_config(args.cfg)
    opt_cfg = get_optimise_cfg_defaults()
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
    print("final losses:", {k: float(v) for k, v in out["final_losses"].items()})


if __name__ == "__main__":
    main()
