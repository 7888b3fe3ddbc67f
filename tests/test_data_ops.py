"""Tests for image ops (crop/uncrop), heatmaps, augmentation, and Canny."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.configs.defaults import ProxyRepAugment, RgbAugment
from humaniflow_tpu.data.augmentation import (
    augment_cam_t,
    augment_light_colour,
    augment_light_t,
    augment_proxy_representation,
    augment_rgb,
    normal_sample_shape,
    random_extreme_crop,
)
from humaniflow_tpu.data.image_ops import (
    batch_add_rgb_background,
    batch_crop_affine,
    batch_uncrop_affine,
    bbox_from_joints2d,
    bbox_from_silhouette,
)
from humaniflow_tpu.data.label_conversions import (
    convert_2d_joints_to_gaussian_heatmaps,
    convert_densepose_seg_to_14part_labels,
    convert_heatmaps_to_2d_joints_coordinates,
)
from humaniflow_tpu.models.canny import CannyEdgeDetector


class TestHeatmaps:
    def test_roundtrip(self):
        joints = jnp.asarray([[[10.0, 20.0], [40.0, 5.0], [32.0, 32.0]]])
        hm = convert_2d_joints_to_gaussian_heatmaps(joints, 64, std=2.0)
        assert hm.shape == (1, 3, 64, 64)
        j2, vis = convert_heatmaps_to_2d_joints_coordinates(hm, gaussian_heatmaps=True)
        np.testing.assert_allclose(np.asarray(j2), np.asarray(joints), atol=0.5)
        assert np.asarray(vis).all()

    def test_out_of_frame_invisible(self):
        joints = jnp.asarray([[[10.0, 20.0], [-50.0, -50.0]]])
        hm = convert_2d_joints_to_gaussian_heatmaps(joints, 64, std=2.0)
        _, vis = convert_heatmaps_to_2d_joints_coordinates(hm, gaussian_heatmaps=True)
        assert bool(vis[0, 0]) and not bool(vis[0, 1])


class TestSegConversions:
    def test_densepose_to_14(self):
        seg = np.array([[0, 1, 2], [15, 16, 24]], np.int32)
        out = convert_densepose_seg_to_14part_labels(seg)
        np.testing.assert_array_equal(out, [[0, 1, 1], [2, 4, 10]])


class TestBbox:
    def test_bbox_from_silhouette(self):
        seg = jnp.zeros((1, 32, 32)).at[0, 5:20, 8:25].set(1.0)
        corners = np.asarray(bbox_from_silhouette(seg))
        np.testing.assert_allclose(corners[0], [5, 8, 19, 24])

    def test_bbox_from_joints(self):
        j = jnp.asarray([[[3.0, 7.0], [20.0, 15.0], [100.0, 100.0]]])
        vis = jnp.asarray([[True, True, False]])
        corners = np.asarray(bbox_from_joints2d(j, vis))
        np.testing.assert_allclose(corners[0], [7, 3, 15, 20])


class TestCropUncrop:
    def test_crop_centres_person(self):
        img = jnp.zeros((1, 64, 64, 3)).at[0, 20:40, 10:30].set(1.0)
        seg = jnp.zeros((1, 64, 64)).at[0, 20:40, 10:30].set(1.0)
        out = batch_crop_affine((32, 32), rgb=img, seg=seg, orig_scale_factor=1.0)
        cropped_seg = np.asarray(out["seg"][0])
        # person occupies the full crop (scale factor 1, square bbox)
        frac = cropped_seg.mean()
        assert frac > 0.9
        # centred: centroid near centre
        ys, xs = np.nonzero(cropped_seg)
        assert abs(ys.mean() - 15.5) < 1.5 and abs(xs.mean() - 15.5) < 1.5

    def test_joints_transform_consistency(self):
        joints = jnp.asarray([[[10.0, 20.0], [30.0, 40.0]]])
        vis = jnp.ones((1, 2), bool)
        out = batch_crop_affine(
            (32, 32), joints2d=joints, joints2d_vis=vis, orig_scale_factor=1.0
        )
        j = np.asarray(out["joints2d"][0])
        # both joints inside the 32x32 crop
        assert (j >= -1).all() and (j <= 33).all()

    def test_uncrop_inverts_crop(self):
        # smooth image: down-then-up resampling must approximately invert
        ys, xs = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
        smooth = np.stack([xs / 64, ys / 64, (xs + ys) / 128], -1).astype(np.float32)
        img = jnp.asarray(smooth[None])
        centres = jnp.asarray([[32.0, 32.0]])
        heights = jnp.asarray([40.0])
        widths = jnp.asarray([40.0])
        out = batch_crop_affine(
            (32, 32), rgb=img, bbox_centres=centres, bbox_heights=heights,
            bbox_widths=widths, orig_scale_factor=1.0,
        )
        restored = batch_uncrop_affine(
            out["rgb"], (64, 64), centres, heights, widths, (32, 32)
        )
        # interior of the original bbox should approximately match
        orig = np.asarray(img[0, 16:48, 16:48])
        rest = np.asarray(restored[0, 16:48, 16:48])
        assert np.abs(orig - rest).mean() < 0.01

    def test_background_composite(self):
        bg = jnp.ones((1, 8, 8, 3)) * 0.5
        rgb = jnp.zeros((1, 8, 8, 3))
        seg = jnp.zeros((1, 8, 8)).at[0, :4].set(1.0)
        out = np.asarray(batch_add_rgb_background(bg, rgb, seg))
        assert (out[0, :4] == 0.0).all() and (out[0, 4:] == 0.5).all()


class TestAugmentation:
    def test_shape_cam_light(self):
        k = jax.random.PRNGKey(0)
        s = normal_sample_shape(k, 8, jnp.zeros(10), jnp.ones(10) * 1.25)
        assert s.shape == (8, 10) and 0.5 < float(jnp.std(s)) < 2.5
        t = augment_cam_t(k, jnp.tile(jnp.asarray([[0.0, -0.2, 2.5]]), (8, 1)))
        assert t.shape == (8, 3)
        assert float(jnp.abs(t[:, 2] - 2.5).max()) <= 0.5 + 1e-6
        lt = augment_light_t(k, 8)
        r = np.linalg.norm(np.asarray(lt), axis=-1)
        assert (r >= 0.05 - 1e-6).all() and (r <= 3.0 + 1e-6).all()
        lc = augment_light_colour(k, 8)
        assert lc["ambient_color"].shape == (8, 3)

    def test_proxy_augment_shapes_preserved(self):
        k = jax.random.PRNGKey(1)
        seg = jnp.asarray(
            np.random.default_rng(0).integers(0, 25, size=(4, 32, 32)), jnp.int32
        )
        j2d = jnp.asarray(np.random.default_rng(1).uniform(0, 32, (4, 17, 2)), jnp.float32)
        vis = jnp.ones((4, 17), bool)
        s2, j2, v2 = augment_proxy_representation(k, seg, j2d, vis, ProxyRepAugment())
        assert s2.shape == seg.shape and j2.shape == j2d.shape and v2.shape == vis.shape
        # jit-able
        f = jax.jit(
            lambda k, s, j, v: augment_proxy_representation(k, s, j, v, ProxyRepAugment())
        )
        s3, _, _ = f(k, seg, j2d, vis)
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(s3))

    def test_extreme_crop_prob1_removes_legs(self):
        seg = jnp.full((2, 8, 8), 5, jnp.int32)  # class 5 = legs
        out = random_extreme_crop(jax.random.PRNGKey(2), seg, extreme_crop_probability=1.0)
        assert float(out.sum()) == 0.0

    def test_rgb_augment(self):
        k = jax.random.PRNGKey(3)
        rgb = jnp.ones((2, 16, 16, 3)) * 0.5
        j2d = jnp.asarray(np.random.default_rng(2).uniform(0, 16, (2, 17, 2)), jnp.float32)
        vis = jnp.ones((2, 17), bool)
        out, _, _ = augment_rgb(k, rgb, j2d, vis, RgbAugment())
        assert out.shape == rgb.shape
        assert float(out.max()) <= 1.0


class TestCanny:
    def test_edge_detection_on_step(self):
        img = jnp.zeros((1, 32, 32, 3)).at[:, :, 16:].set(1.0)
        canny = CannyEdgeDetector(threshold=0.1)
        out = canny(img)
        gm = np.asarray(out["grad_magnitude"][0, :, :, 0])
        # a vertical edge near column 16 is detected in the gradient
        assert gm[:, 14:18].max() > 1.0
        # flat interiors have zero gradient (borders excluded: zero padding
        # creates a boundary artifact, matching the reference's conv padding)
        assert gm[4:-4, 2:12].max() < 1e-6 and gm[4:-4, 20:29].max() < 1e-6
        # NMS keeps edges thin: at most the plateau columns survive
        edges = np.asarray(out["thresholded_thin_edges"][0, :, :, 0])
        interior = edges[5:-5, 2:-2]
        assert (interior > 0).sum(axis=1).max() <= 3

    def test_blur_and_magnitude_shapes(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
        out = CannyEdgeDetector()(img)
        assert out["blurred_img"].shape == (2, 16, 16, 3)
        assert out["grad_magnitude"].shape == (2, 16, 16, 1)
        assert out["thresholded_thin_edges"].shape == (2, 16, 16, 1)


class TestPW3DEvalDataset:
    """Synthetic on-disk 3DPW fixture: exercises the standard AND extreme
    -crop loader variants (reference data/pw3d_eval_dataset.py:20-37) —
    directory/file naming, keypoint rescaling to PROXY_REP_SIZE, visibility
    thresholds (hip-keep vs hip-threshold), and the GT face-joint threshold
    override."""

    N, ORIG = 3, 128

    def _build_dir(self, root):
        import cv2

        rng = np.random.default_rng(7)
        for sub in ("cropped_frames", "extreme_cropped_0.5_frames"):
            d = os.path.join(root, sub)
            os.makedirs(d)
            for i in range(self.N):
                img = rng.integers(0, 255, size=(self.ORIG, self.ORIG, 3))
                cv2.imwrite(os.path.join(d, f"f{i}.png"), img.astype(np.uint8))
        kp = rng.uniform(0, self.ORIG, size=(self.N, 17, 3)).astype(np.float32)
        kp[:, :, 2] = rng.uniform(0, 1, size=(self.N, 17))
        np.save(os.path.join(root, "hrnet_results_centred.npy"), kp)
        kp_ec = kp.copy()
        kp_ec[:, :, :2] *= 0.5
        np.save(
            os.path.join(root, "extreme_cropped_0.5_hrnet_results_centred.npy"),
            kp_ec,
        )
        j2d = rng.uniform(0, self.ORIG, size=(self.N, 17, 3)).astype(np.float32)
        j2d[:, :, 2] = rng.uniform(0, 1, size=(self.N, 17))
        j2d[:, 1:5, 2] = 0.2  # face joints: above 0.1, below 0.6
        np.savez(
            os.path.join(root, "3dpw_test.npz"),
            imgname=np.array([f"f{i}.png" for i in range(self.N)]),
            pose=rng.normal(size=(self.N, 72)).astype(np.float32),
            shape=rng.normal(size=(self.N, 10)).astype(np.float32),
            gender=np.array(["m", "f", "m"]),
            joints2D_coco=j2d,
        )
        np.save(os.path.join(root, "extreme_cropped_0.5_joints2D.npy"), j2d * 0.5)
        return kp, j2d

    def test_standard_and_extreme_crop_variants(self, tmp_path):
        pytest.importorskip("cv2")
        from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
        from humaniflow_tpu.data.datasets import PW3DEvalDataset

        root = str(tmp_path / "pw3d")
        os.makedirs(root)
        kp, j2d = self._build_dir(root)
        cfg = get_humaniflow_cfg_defaults()
        wh = cfg.DATA.PROXY_REP_SIZE
        s = wh / self.ORIG

        ds = PW3DEvalDataset(root, cfg, visible_joints_threshold=0.6)
        assert len(ds) == self.N
        item = ds[1]
        assert item["image"].shape == (wh, wh, 3)
        assert item["gender"] == "f"
        np.testing.assert_allclose(
            item["input_joints2D"], np.round(kp[1, :, :2] * s).astype(np.int16)
        )
        # hips (11, 12) always visible in the non-hip-threshold mode
        assert item["input_joints2D_vis"][[11, 12]].all()
        # face GT joints use the 0.1 threshold (conf 0.2 → visible)
        assert item["joints2D_visib"][1:5].all()
        np.testing.assert_allclose(item["joints2D"], j2d[1, :, :2] * s, rtol=1e-6)

        # hip-thresholding mode: hips follow the confidence like limbs
        ds_hip = PW3DEvalDataset(
            root, cfg, visible_joints_threshold=0.6, threshold_hip_joints=True
        )
        vis = ds_hip[1]["input_joints2D_vis"]
        np.testing.assert_array_equal(vis[[11, 12]], kp[1, [11, 12], 2] > 0.6)
        assert vis[:7].all()  # torso/head always kept

        # extreme-crop variant: its own frames dir, keypoints and GT npys
        ds_ec = PW3DEvalDataset(root, cfg, extreme_crop_scale=0.5)
        item_ec = ds_ec[0]
        assert item_ec["image"].shape == (wh, wh, 3)
        np.testing.assert_allclose(
            item_ec["input_joints2D"],
            np.round(kp[0, :, :2] * 0.5 * s).astype(np.int16),
        )
        np.testing.assert_allclose(
            item_ec["joints2D"], j2d[0, :, :2] * 0.5 * s, rtol=1e-6
        )
        # no threshold given: all input joints visible
        assert item_ec["input_joints2D_vis"].all()

        # batch iteration stacks across the variant dataset
        from humaniflow_tpu.data.datasets import batch_iterator

        b = next(iter(batch_iterator(ds_ec, 2)))
        assert b["image"].shape == (2, wh, wh, 3)
        assert list(b["gender"]) == ["m", "f"]
