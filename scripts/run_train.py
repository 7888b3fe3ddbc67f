"""Training CLI (reference: scripts/run_train.py).

Synthetic-data training with resume: `-R epoch` reloads the checkpoint and
the frozen experiment config (reference :48-53); `-O KEY VALUE` applies
dotted-path config overrides (reference :134).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_dir", "-E", type=str, required=True)
    parser.add_argument("--pose_params_from", "-P", type=str, default="all",
                        choices=["all", "h36m", "up3d", "3dpw", "amass", "not_amass"])
    parser.add_argument("--resume_epoch", "-R", type=int, default=None)
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--cfg_overrides", "-O", nargs="*", default=[])
    parser.add_argument("--num_devices", "-D", type=int, default=None)
    parser.add_argument("--cull", default=True,
                        action=argparse.BooleanOptionalAction,
                        help="back-face-cull the synthetic-data renders: "
                             "exact and ~13%% faster for real SMPL meshes "
                             "(closed, consistently wound, non-self-"
                             "intersecting — DEFAULT, exactness test: "
                             "tests/test_binned_rasterizer.py::"
                             "test_cull_exact_on_closed_mesh); --no-cull "
                             "for meshes that self-intersect")
    args = parser.parse_args()

    from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from humaniflow_tpu.configs import load_config, paths, save_config
    from humaniflow_tpu.data.datasets import OnTheFlySMPLTrainDataset
    from humaniflow_tpu.models import HumaniflowModel, load_smpl_npz
    from humaniflow_tpu.parallel.mesh import make_mesh
    from humaniflow_tpu.pipelines.train import train_humaniflow
    from humaniflow_tpu.render import TexturedIUVRenderer
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    os.makedirs(args.experiment_dir, exist_ok=True)
    frozen_cfg_path = os.path.join(args.experiment_dir, "config.yaml")
    if args.resume_epoch is not None and os.path.exists(frozen_cfg_path):
        cfg = load_config(frozen_cfg_path, args.cfg_overrides)
    else:
        cfg = load_config(args.cfg, args.cfg_overrides)
        save_config(cfg, frozen_cfg_path)

    train_dataset = OnTheFlySMPLTrainDataset(
        poses_path=paths.TRAIN_POSES_PATH,
        textures_path=paths.TRAIN_TEXTURES_PATH,
        backgrounds_dir_path=paths.TRAIN_BACKGROUNDS_PATH,
        params_from=args.pose_params_from,
        img_wh=cfg.DATA.PROXY_REP_SIZE,
    )
    val_dataset = OnTheFlySMPLTrainDataset(
        poses_path=paths.VAL_POSES_PATH,
        textures_path=paths.VAL_TEXTURES_PATH,
        backgrounds_dir_path=paths.VAL_BACKGROUNDS_PATH,
        params_from=args.pose_params_from,
        img_wh=cfg.DATA.PROXY_REP_SIZE,
    )
    print(f"Found {len(train_dataset)} train / {len(val_dataset)} val poses.")

    smpl = load_smpl_npz(
        paths.SMPL_NEUTRAL,
        regressor_paths={
            "extra": paths.J_REGRESSOR_EXTRA,
            "cocoplus": paths.COCOPLUS_REGRESSOR,
            "h36m": paths.H36M_REGRESSOR,
        },
    )
    renderer = TexturedIUVRenderer(
        img_wh=cfg.DATA.PROXY_REP_SIZE, projection_type="perspective",
        focal_length=cfg.TRAIN.SYNTH_DATA.FOCAL_LENGTH,
        # synthetic-data renders use the binned Pallas rasterizer (~17x the
        # XLA backend on TPU; <0.1% boundary-pixel difference — noise at the
        # level of the augmentations applied on top) with per-face pre-lit
        # texels and no UV planes: the train pipeline consumes only
        # iuv[..., 0] and rgb, and faces project to ~1-2 px at 256² so
        # face-centroid texels keep pixel-level texture frequency
        # (docs/DESIGN.md "Texture sampling modes")
        rasterizer="binned", texture_sampling="face", emit_uv=False,
        binned_cull=args.cull,
        # culling ~halves the live candidate count, so the live-prefix
        # coefficient gather cap and per-strip window shrink with it:
        # synth 114.4 -> ~80 ms/batch measured at B=72/256² (TPU v5e,
        # scripts/profile_render_caps.py).  live_cap=28672 is the smallest
        # FACE_CHUNK-multiple with ZERO content drops over 3456 draws at
        # the TRUE training distribution (shape σ=1.25, cam tz ∈ [2, 3],
        # poses up to σ=0.8; scripts/profile_overflow_margin.py — 24576
        # measurably drops bottom-strip content); any future drop is
        # surfaced per-epoch by the train loop (emit_overflow)
        binned_live_cap=28672 if args.cull else 49152,
        binned_k_max=512 if args.cull else 896,
        emit_overflow=True,
    )
    model = HumaniflowModel(cfg.MODEL)

    resume_state = None
    if args.resume_epoch is not None:
        resume_state = load_checkpoint(
            os.path.join(args.experiment_dir, f"epoch_{args.resume_epoch:06d}")
        )

    mesh = make_mesh(args.num_devices) if args.num_devices else None
    train_humaniflow(
        model, smpl, cfg, renderer, train_dataset, val_dataset,
        args.experiment_dir, resume_state=resume_state, mesh=mesh,
    )


if __name__ == "__main__":
    main()
