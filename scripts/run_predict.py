"""Prediction CLI (reference: scripts/run_predict.py).

Runs the full uncropped-image pipeline on a directory of images:
person bbox (optional torchvision detector / whole image) → HRNet keypoints →
proxy crop → HumaniflowModel distribution inference → SMPL meshes +
per-vertex uncertainty → prediction npz dumps (+ visualisations when the
renderer assets are present).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", "-I", type=str, required=True)
    parser.add_argument("--save_dir", "-S", type=str, required=True)
    parser.add_argument("--checkpoint", "-C", type=str, default=None,
                        help="orbax checkpoint dir or reference .tar")
    parser.add_argument("--hrnet_checkpoint", type=str, default=None)
    parser.add_argument("--hrnet_dtype", choices=["bf16", "f32"], default="bf16",
                        help="HRNet conv compute dtype: bf16 (default; ~same "
                             "keypoints, ~1.5x throughput on TPU) or f32")
    parser.add_argument("--num_samples", "-N", "--num_pred_samples", "-NP",
                        dest="num_samples", type=int, default=50)
    parser.add_argument("--use_detector", action="store_true",
                        help="use torchvision Mask-RCNN (CPU) for person bboxes")
    parser.add_argument("--cropped_images", action="store_true",
                        help="images are already cropped + centred on the "
                             "person: skip bbox detection/refinement and use "
                             "the whole image as the crop (reference -C)")
    parser.add_argument("--gender", "-G", type=str, default="neutral",
                        choices=["neutral", "male", "female"],
                        help="SMPL body model variant (converted npz paths "
                             "in configs/paths.py)")
    parser.add_argument("--joints2Dvisib_threshold", "-T", type=float,
                        default=0.75,
                        help="confidence below which appendage-joint "
                             "heatmaps are zeroed in the proxy")
    parser.add_argument("--num_vis_samples", "-NV", type=int, default=8,
                        help="number of J2D-error-sorted samples in the "
                             "sample-grid visualisation")
    parser.add_argument("--cfg", type=str, default=None)
    parser.add_argument("--visualise", "-V", action="store_true",
                        help="write ALL visualisations (point-est + samples "
                             "+ xyz variance + uncrop)")
    parser.add_argument("--visualise_samples", "-VS", action="store_true")
    parser.add_argument("--visualise_uncropped", "-VU", action="store_true")
    parser.add_argument("--visualise_xyz_variance", "-VXYZ",
                        action="store_true")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="data-parallel inference over the first N "
                             "devices (jax.sharding 1-D data mesh); "
                             "default single-device")
    parser.add_argument("--sample_devices", type=int, default=None,
                        help="shard the N-sample SMPL stage over S devices "
                             "(2-D (data, sample) mesh: data axis = "
                             "num_devices // S; the serving-latency lever "
                             "— parallel/sample_parallel.py).  Requires "
                             "--num_devices divisible by S and "
                             "--num_samples divisible by S")
    args = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from humaniflow_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from humaniflow_tpu.configs import load_config, paths
    from humaniflow_tpu.models import HumaniflowModel, load_smpl_npz
    from humaniflow_tpu.models.hrnet import PoseHighResolutionNet
    from humaniflow_tpu.pipelines.predict import predict_humaniflow
    from humaniflow_tpu.pipelines.predict_hrnet import predict_hrnet_batch
    from humaniflow_tpu.utils.checkpoints import load_checkpoint

    cfg = load_config(args.cfg)
    model = HumaniflowModel(cfg.MODEL)

    # ---- weights
    if args.checkpoint and args.checkpoint.endswith(".tar"):
        from humaniflow_tpu.utils.convert_torch import convert_humaniflow_file

        params = convert_humaniflow_file(args.checkpoint, model)
    elif args.checkpoint:
        params = load_checkpoint(args.checkpoint)
        params = params.get("best_params", params.get("params", params))
    else:
        print("WARNING: no checkpoint given — using random init")
        params = model.init(jax.random.PRNGKey(0))

    hrnet = PoseHighResolutionNet(
        dtype=jnp.bfloat16 if args.hrnet_dtype == "bf16" else None
    )
    if args.hrnet_checkpoint and args.hrnet_checkpoint.endswith(".pth"):
        from humaniflow_tpu.utils.convert_torch import convert_hrnet_file

        hrnet_params = convert_hrnet_file(args.hrnet_checkpoint)
    elif args.hrnet_checkpoint:
        # orbax dir written by scripts/convert_model_files.py --hrnet_pth
        hrnet_params = load_checkpoint(args.hrnet_checkpoint)
        hrnet_params = hrnet_params.get("params", hrnet_params)
    else:
        print("WARNING: no HRNet checkpoint — using random init")
        import jax.numpy as jnp

        import importlib

        _ph_mod = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
        in_w, in_h = _ph_mod.HRNET_INPUT_WH
        hrnet_params = hrnet.init(jax.random.PRNGKey(1), jnp.zeros((1, in_h, in_w, 3)))

    smpl_path = {
        "neutral": paths.SMPL_NEUTRAL,
        "male": paths.SMPL_MALE,
        "female": paths.SMPL_FEMALE,
    }[args.gender]
    smpl = load_smpl_npz(
        smpl_path,
        regressor_paths={
            "extra": paths.J_REGRESSOR_EXTRA,
            "cocoplus": paths.COCOPLUS_REGRESSOR,
            "h36m": paths.H36M_REGRESSOR,
        },
    )

    import cv2

    os.makedirs(args.save_dir, exist_ok=True)
    fnames = sorted(
        f for f in os.listdir(args.image_dir) if f.endswith((".png", ".jpg", ".jpeg"))
    )
    wh = cfg.DATA.PROXY_REP_SIZE
    raw_images = [
        cv2.cvtColor(
            cv2.imread(os.path.join(args.image_dir, fname)), cv2.COLOR_BGR2RGB
        ).astype(np.float32) / 255.0
        for fname in fnames
    ]
    # ONE jitted HRNet forward over all images (the reference loops per image
    # at batch 1, predict/predict_hrnet.py:33)
    hr = predict_hrnet_batch(
        hrnet, hrnet_params, raw_images,
        use_torchvision_detector=args.use_detector and not args.cropped_images,
        # pre-cropped images ARE the person box — no keypoint-bbox re-crop
        keypoint_bbox_fallback=not args.cropped_images,
    )

    # re-crop the HRNet crops to the proxy size, batched (square centre crop
    # of the 384x288 crop, reference predict_humaniflow.py:85-98)
    from humaniflow_tpu.data.image_ops import batch_crop_affine
    import jax.numpy as jnp

    n = len(fnames)
    crop = batch_crop_affine(
        (wh, wh),
        rgb=jnp.asarray(hr["cropped_images"]),
        joints2d=jnp.asarray(hr["joints2D"]),
        bbox_centres=jnp.broadcast_to(
            jnp.asarray([384 / 2.0, 288 / 2.0], jnp.float32), (n, 2)
        ),
        bbox_heights=jnp.full((n,), 384.0),
        bbox_widths=jnp.full((n,), 384.0),
        orig_scale_factor=1.0,
    )
    images = np.asarray(crop["rgb"])
    joints2d = np.asarray(crop["joints2d"])
    bbox_centres = hr["bbox_centres"]
    bbox_heights = hr["bbox_heights"]
    bbox_widths = hr["bbox_widths"]

    mesh = None
    if args.num_devices and args.sample_devices and args.sample_devices > 1:
        from humaniflow_tpu.parallel.sample_parallel import make_mesh_2d

        assert args.num_devices % args.sample_devices == 0, (
            "--num_devices must be divisible by --sample_devices"
        )
        mesh = make_mesh_2d(
            args.num_devices // args.sample_devices, args.sample_devices
        )
    elif args.num_devices:
        from humaniflow_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.num_devices)

    pred = predict_humaniflow(
        model, params, smpl, cfg,
        images, joints2d, hr["joints2Dconfs"],
        num_samples=args.num_samples, save_dir=args.save_dir, fnames=fnames,
        mesh=mesh, joints2d_visib_threshold=args.joints2Dvisib_threshold,
        extras={
            "bbox_centre": bbox_centres,
            "bbox_height": bbox_heights,
            "bbox_width": bbox_widths,
            "hrnet_joints2D": hr["joints2D"],
        },
    )
    print(f"Saved predictions for {len(fnames)} images to {args.save_dir}")

    vis_samples = args.visualise or args.visualise_samples
    vis_uncrop = args.visualise or args.visualise_uncropped
    vis_xyz = args.visualise or args.visualise_xyz_variance
    if args.visualise or vis_samples or vis_uncrop or vis_xyz:
        import math

        import jax.numpy as jnp

        from humaniflow_tpu.ops.rotation import aa_rotate_translate_points
        from humaniflow_tpu.render import TexturedIUVRenderer
        from humaniflow_tpu.utils.sampling import joints2d_error_sorted_verts_sampling
        from humaniflow_tpu.utils.visualise import (
            plot_xyz_vertex_variance,
            render_point_est_visualisation,
            render_samples_visualisation,
            uncertainty_colourmap,
        )

        renderer = TexturedIUVRenderer(img_wh=wh, projection_type="orthographic")
        colours = np.stack(
            [uncertainty_colourmap(np.asarray(v)) for v in pred["vertex_uncertainty_l2"]]
        )
        x_axis = jnp.asarray([1.0, 0.0, 0.0])
        verts_flipped = aa_rotate_translate_points(
            pred["verts_point_est"], x_axis, math.pi, jnp.zeros(3)
        )
        tpose_flipped = aa_rotate_translate_points(
            pred["tpose_verts"], x_axis, math.pi, jnp.zeros(3)
        )
        figs = render_point_est_visualisation(
            renderer, verts_flipped, pred["cam_wp"],
            input_image=images,
            tpose_vertices=tpose_flipped,
            vertex_colours=jnp.asarray(colours),
        )
        proxy = np.asarray(pred["proxy_rep"])
        for i, fname in enumerate(fnames):
            stem = os.path.splitext(fname)[0]
            out = (figs["figure"][i][:, :, ::-1] * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(args.save_dir, stem + "_vis.png"), out)

            # J2D-error-sorted sample grid (reference -VS flag)
            if vis_samples:
                heatmaps = np.moveaxis(proxy[i, :, :, 1:], -1, 0)[None]
                sorted_verts = joints2d_error_sorted_verts_sampling(
                    jnp.asarray(pred["verts_samples"][i]),
                    jnp.asarray(pred["joints_samples"][i]),
                    jnp.asarray(heatmaps),
                    jnp.asarray(pred["cam_wp"][i : i + 1]),
                )[: args.num_vis_samples]
                sorted_flipped = aa_rotate_translate_points(
                    sorted_verts, x_axis, math.pi, jnp.zeros(3)
                )
                nv = sorted_flipped.shape[0]
                cols = min(nv, 6)
                grid = render_samples_visualisation(
                    renderer, sorted_flipped,
                    np.asarray(pred["cam_wp"][i : i + 1]),
                    num_rows=math.ceil(nv / cols), num_cols=cols,
                )
                cv2.imwrite(
                    os.path.join(args.save_dir, stem + "_samples.png"),
                    (grid[:, :, ::-1] * 255).astype(np.uint8),
                )
            # per-vertex directional-variance scatter (reference -VXYZ flag)
            if vis_xyz:
                plot_xyz_vertex_variance(
                    np.asarray(verts_flipped[i]),
                    np.asarray(pred["vertex_uncertainty_directional"][i]),
                    save_path=os.path.join(
                        args.save_dir, stem + "_xyz_variance.png"
                    ),
                )

            # composite the mesh render back onto the original image
            # (reference -VU flag: uncrop_point_est_visualisation)
            if vis_uncrop:
                from humaniflow_tpu.utils.visualise import (
                    uncrop_point_est_visualisation,
                )

                orig = cv2.cvtColor(
                    cv2.imread(os.path.join(args.image_dir, fname)),
                    cv2.COLOR_BGR2RGB,
                ).astype(np.float32) / 255.0
                render0 = figs["renders"]["0"][i : i + 1]
                sil0 = (render0.sum(-1) > 0).astype(np.float32)
                wh_box = max(bbox_heights[i], bbox_widths[i])
                uncropped = uncrop_point_est_visualisation(
                    render0, sil0, bbox_centres[i][None], np.asarray([wh_box]),
                    orig[None], bbox_scale_factor=cfg.DATA.BBOX_SCALE_FACTOR,
                )
                cv2.imwrite(
                    os.path.join(args.save_dir, stem + "_uncrop.png"),
                    (uncropped[0][:, :, ::-1] * 255).astype(np.uint8),
                )
        done = ["point-est"] + [
            n for n, f in [("samples", vis_samples), ("xyz variance", vis_xyz),
                           ("uncrop", vis_uncrop)] if f
        ]
        print(f"Saved visualisations ({', '.join(done)}).")


if __name__ == "__main__":
    main()
