"""Per-stage TPU profiling of the synthetic-training-data pipeline.

Splits make_synth_data_fn's program (pipelines/train.py:79-185) into
separately-jitted stages and times each at the training configuration
(B=72, 256²) so optimisation effort goes where the milliseconds are.
Per-stage jit boundaries add a little dispatch overhead vs the fused
program, so the sum reads slightly above the fused time — ratios are what
matter here.

Usage:  python scripts/profile_synth_stages.py  (runs on the TPU)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 72
IMG = 256


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
    from humaniflow_tpu.data.augmentation import (
        augment_cam_t,
        augment_light_colour,
        augment_light_t,
        augment_proxy_representation,
        augment_rgb,
        normal_sample_shape,
        random_extreme_crop,
    )
    from humaniflow_tpu.data.image_ops import batch_add_rgb_background, batch_crop_affine
    from humaniflow_tpu.data.joints2d_utils import (
        check_joints2d_occluded,
        check_joints2d_visibility,
    )
    from humaniflow_tpu.data.label_conversions import (
        ALL_JOINTS_TO_COCO_MAP,
        convert_2d_joints_to_gaussian_heatmaps,
        convert_densepose_seg_to_14part_labels,
    )
    from humaniflow_tpu.models import synthetic_smpl
    from humaniflow_tpu.models.canny import CannyEdgeDetector
    from humaniflow_tpu.models.smpl import smpl_forward
    from humaniflow_tpu.ops.camera import perspective_project
    from humaniflow_tpu.ops.rotation import aa_rotate_rotmats, aa_rotate_translate_points
    from humaniflow_tpu.ops.so3 import so3_exp
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    sd = cfg.TRAIN.SYNTH_DATA
    aug = sd.AUGMENT
    smpl = synthetic_smpl(num_verts=6890)
    # exactly the shipped train configuration (scripts/run_train.py:69-80):
    # binned backend, face-centroid texels, no atlas-UV planes
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="perspective",
        focal_length=sd.FOCAL_LENGTH, render_rgb=True, rasterizer="binned",
        texture_sampling="face", emit_uv=False,
    )
    edge_detector = CannyEdgeDetector(
        non_max_suppression=cfg.DATA.EDGE_NMS,
        gaussian_filter_std=cfg.DATA.EDGE_GAUSSIAN_STD,
        gaussian_filter_size=cfg.DATA.EDGE_GAUSSIAN_SIZE,
        threshold=cfg.DATA.EDGE_THRESHOLD,
    )
    coco = jnp.asarray(np.asarray(ALL_JOINTS_TO_COCO_MAP))
    x_axis = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)
    zero3 = jnp.zeros(3, jnp.float32)

    rng = np.random.default_rng(0)
    pose72 = jnp.asarray(rng.normal(scale=0.3, size=(B, 72)), jnp.float32)
    texture = jnp.asarray(rng.uniform(size=(B, 1200, 800, 3)), jnp.float32)
    background = jnp.asarray(rng.uniform(size=(B, IMG, IMG, 3)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 10)

    results = {}

    # ---- stage 1: targets (SMPL fwd + projection)
    @jax.jit
    def stage_targets(key1, key2, pose72):
        pose_r24 = so3_exp(pose72.reshape(B, 24, 3))
        glob_r = pose_r24[:, 0]
        body_r = pose_r24[:, 1:]
        _, glob_r = aa_rotate_rotmats(glob_r, x_axis, math.pi, rot_mult_order="post")
        shape = normal_sample_shape(
            key1, B, jnp.zeros(10), jnp.full((10,), aug.SMPL.SHAPE_STD)
        )
        cam_t = augment_cam_t(
            key2, jnp.broadcast_to(jnp.asarray(sd.MEAN_CAM_T), (B, 3)),
            xy_std=aug.CAM.XY_STD, delta_z_range=aug.CAM.DELTA_Z_RANGE,
        )
        out = smpl_forward(smpl, shape, body_r, glob_r)
        verts_render = aa_rotate_translate_points(out["vertices"], x_axis, math.pi, zero3)
        joints_coco = aa_rotate_translate_points(out["joints"][:, coco], x_axis, math.pi, zero3)
        j2d = perspective_project(joints_coco, None, cam_t, focal_length=sd.FOCAL_LENGTH, img_wh=IMG)
        return verts_render, j2d, cam_t, shape, body_r, glob_r

    verts_render, j2d, cam_t, shape, body_r, glob_r = stage_targets(keys[0], keys[1], pose72)
    results["1_targets_smpl"] = timed(stage_targets, keys[0], keys[1], pose72)

    # ---- stage 2: render
    @jax.jit
    def stage_render(key3, key4, verts_render, cam_t, texture):
        lights = augment_light_colour(
            key3, 1,
            ambient_intensity_range=aug.RGB.LIGHT_AMBIENT_RANGE,
            diffuse_intensity_range=aug.RGB.LIGHT_DIFFUSE_RANGE,
            specular_intensity_range=aug.RGB.LIGHT_SPECULAR_RANGE,
        )
        lights["location"] = augment_light_t(key4, 1, aug.RGB.LIGHT_LOC_RANGE)
        render = renderer._render(verts_render, cam_t=cam_t, textures=texture,
                                  lights_rgb_settings=lights)
        return render["iuv_images"], render["rgb_images"]

    iuv0, rgb0 = stage_render(keys[2], keys[3], verts_render, cam_t, texture)
    results["2_render"] = timed(stage_render, keys[2], keys[3], verts_render, cam_t, texture)

    # ---- stage 3: extreme crop + affine crop
    @jax.jit
    def stage_crop(key5, key6, iuv, rgb, j2d):
        seg_extreme = random_extreme_crop(
            key5, iuv[..., 0].astype(jnp.int32),
            extreme_crop_probability=aug.PROXY_REP.EXTREME_CROP_PROB,
        )
        crop = batch_crop_affine(
            (IMG, IMG), iuv=iuv, rgb=rgb, joints2d=j2d,
            bbox_determiner=seg_extreme.astype(jnp.float32),
            orig_scale_factor=cfg.DATA.BBOX_SCALE_FACTOR,
            key=key6,
            delta_scale_range=aug.BBOX.DELTA_SCALE_RANGE,
            delta_centre_range=aug.BBOX.DELTA_CENTRE_RANGE,
            out_of_frame_pad_val=-1.0,
        )
        return crop["iuv"], crop["rgb"], crop["joints2d"]

    iuv, rgb, j2dc = stage_crop(keys[4], keys[5], iuv0, rgb0, j2d)
    results["3_crop"] = timed(stage_crop, keys[4], keys[5], iuv0, rgb0, j2d)

    # ---- stage 4: visibility + occlusion checks
    @jax.jit
    def stage_vis(iuv, j2d, j2dc):
        vis0 = check_joints2d_visibility(j2d, IMG)
        seg = jnp.round(iuv[..., 0]).astype(jnp.int32)
        vis = check_joints2d_visibility(j2dc, IMG, vis0)
        seg14 = convert_densepose_seg_to_14part_labels(jnp.maximum(seg, 0))
        vis = check_joints2d_occluded(seg14, vis)
        return seg, vis

    seg, vis = stage_vis(iuv, j2d, j2dc)
    results["4_vis_occlusion"] = timed(stage_vis, iuv, j2d, j2dc)

    # ---- stage 5: proxy/rgb augmentation + background composite
    @jax.jit
    def stage_aug(key7, key8, seg, j2dc, vis, rgb, background):
        seg_aug, j2d_input, vis2 = augment_proxy_representation(
            key7, seg, j2dc, vis, aug.PROXY_REP
        )
        rgb2 = batch_add_rgb_background(background, rgb, seg_aug)
        rgb2, j2d_input, vis2 = augment_rgb(key8, rgb2, j2d_input, vis2, aug.RGB)
        return seg_aug, j2d_input, vis2, rgb2

    seg_aug, j2d_input, vis2, rgb2 = stage_aug(keys[6], keys[7], seg, j2dc, vis, rgb, background)
    results["5_augment"] = timed(stage_aug, keys[6], keys[7], seg, j2dc, vis, rgb, background)

    # ---- stage 6: Canny edges
    @jax.jit
    def stage_canny(rgb2):
        edges = edge_detector(rgb2)
        return (
            edges["thresholded_thin_edges"]
            if cfg.DATA.EDGE_NMS
            else edges["thresholded_grad_magnitude"]
        )

    edge_in = stage_canny(rgb2)
    results["6_canny"] = timed(stage_canny, rgb2)

    # ---- stage 7: heatmaps + concat
    @jax.jit
    def stage_heatmaps(j2d_input, vis2, edge_in):
        heatmaps = convert_2d_joints_to_gaussian_heatmaps(
            j2d_input, IMG, std=cfg.DATA.HEATMAP_GAUSSIAN_STD
        )
        heatmaps = heatmaps * vis2.astype(jnp.float32)[:, :, None, None]
        return jnp.concatenate([edge_in, jnp.moveaxis(heatmaps, 1, -1)], axis=-1)

    proxy = stage_heatmaps(j2d_input, vis2, edge_in)
    results["7_heatmaps"] = timed(stage_heatmaps, j2d_input, vis2, edge_in)

    total = sum(results.values())
    print(f"\nsynth-data per-stage timing  B={B}  {IMG}²  ({jax.devices()[0]})")
    for k, v in sorted(results.items()):
        print(f"  {k:<20s} {v * 1000:8.2f} ms  ({100 * v / total:4.1f}%)")
    print(f"  {'sum':<20s} {total * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
