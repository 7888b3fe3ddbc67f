"""Evaluation CLI (reference: scripts/run_evaluate.py).

`-D ssp3d -B 32 -N 100` / `-D 3dpw -B 32 -N 10` reproduce the reference's
eval protocols (BASELINE.md)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", "-D", type=str, required=True, choices=["ssp3d", "3dpw"])
    parser.add_argument("--checkpoint", "-C", type=str, required=True)
    parser.add_argument("--batch_size", "-B", type=int, default=32)
    parser.add_argument("--num_samples", "-N", type=int, default=10)
    parser.add_argument("--save_path", "-S", type=str, default=None)
    parser.add_argument("--extreme_crop_scale", type=float, default=None)
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel evaluation over the first N "
                             "devices (jax.sharding 1-D data mesh); "
                             "default single-device")
    parser.add_argument("--exact_silhouettes", action="store_true",
                        help="render eval silhouettes through the exact "
                             "per-pixel coverage scan instead of the binned "
                             "kernel (bit-exact, ~3x slower; use when the "
                             "overflow warning fires)")
    parser.add_argument("--sync_every", type=int, default=8,
                        help="metric device->host sync cadence in batches "
                             "(default 8; each sync pays one host RTT — "
                             "raise over slow links, 1 restores per-batch "
                             "syncs and per-batch overflow warnings)")
    parser.add_argument("--pre_stage", action="store_true",
                        help="transfer the whole dataset into device memory "
                             "before the eval loop (decouples throughput "
                             "from host->device link bandwidth; costs the "
                             "full dataset in HBM — benchmark-sized "
                             "datasets only)")
    args = parser.parse_args()

    from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from humaniflow_tpu.configs import load_config, paths
    from humaniflow_tpu.data.datasets import PW3DEvalDataset, SSP3DEvalDataset
    from humaniflow_tpu.models import HumaniflowModel, load_smpl_npz
    from humaniflow_tpu.pipelines.evaluate import evaluate_humaniflow
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    cfg = load_config(args.cfg)
    model = HumaniflowModel(cfg.MODEL)

    if args.checkpoint.endswith(".tar"):
        from humaniflow_tpu.utils.convert_torch import convert_humaniflow_file

        params = convert_humaniflow_file(args.checkpoint, model)
    else:
        state = load_checkpoint(args.checkpoint)
        params = state.get("best_params", state.get("params", state))

    regs = {
        "extra": paths.J_REGRESSOR_EXTRA,
        "cocoplus": paths.COCOPLUS_REGRESSOR,
        "h36m": paths.H36M_REGRESSOR,
    }
    smpl_neutral = load_smpl_npz(paths.SMPL_NEUTRAL, regressor_paths=regs)
    smpl_male = load_smpl_npz(paths.SMPL_MALE, regressor_paths=regs)
    smpl_female = load_smpl_npz(paths.SMPL_FEMALE, regressor_paths=regs)

    from humaniflow_tpu.pipelines.protocols import (
        EVAL_METRICS_3DPW,
        EVAL_METRICS_SSP3D,
    )

    # metric sets per dataset (reference: scripts/run_evaluate.py:70-94)
    if args.dataset == "3dpw":
        metrics = list(EVAL_METRICS_3DPW)
        dataset = PW3DEvalDataset(
            paths.PW3D_PATH, cfg, extreme_crop_scale=args.extreme_crop_scale,
            visible_joints_threshold=0.6,
        )
        save_path = args.save_path or f"./evaluations/3dpw_eval_{args.num_samples}_samples"
        renderer = None
    else:
        metrics = list(EVAL_METRICS_SSP3D)
        dataset = SSP3DEvalDataset(paths.SSP3D_PATH, cfg)
        save_path = args.save_path or f"./evaluations/ssp3d_eval_{args.num_samples}_samples"
        from humaniflow_tpu.render import TexturedIUVRenderer

        renderer = TexturedIUVRenderer(
            img_wh=cfg.DATA.PROXY_REP_SIZE, projection_type="orthographic",
            render_rgb=False, silhouette_exact=args.exact_silhouettes,
        )

    mesh = None
    if args.num_devices:
        from humaniflow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)

    final = evaluate_humaniflow(
        model, params, smpl_neutral, smpl_male, smpl_female, cfg, dataset,
        metrics, batch_size=args.batch_size, num_pred_samples=args.num_samples,
        save_path=save_path, save_per_frame_metrics=True, renderer=renderer,
        mesh=mesh, sync_every=args.sync_every, pre_stage=args.pre_stage,
    )
    print(final)


if __name__ == "__main__":
    main()
