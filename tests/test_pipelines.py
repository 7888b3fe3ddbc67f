"""Pipeline tests: loss, train step (incl. NaN rollback + data-parallel
sharding over the virtual mesh), optimise loop, eval metrics, predict slice."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from scipy.spatial.transform import Rotation as R

from humaniflow_tpu.configs import get_humaniflow_cfg_defaults, get_optimise_cfg_defaults
from humaniflow_tpu.losses import humaniflow_loss
from humaniflow_tpu.metrics import EvalMetricsTracker, TrainingLossesAndMetricsTracker
from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
from humaniflow_tpu.parallel import make_mesh, replicate, shard_batch
from humaniflow_tpu.pipelines import make_train_step, optimise_batch_with_humaniflow_prior
from humaniflow_tpu.pipelines.predict import make_predict_fn

IMG = 32
B = 4


@pytest.fixture(scope="module")
def setup():
    cfg = get_humaniflow_cfg_defaults()
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl = synthetic_smpl(num_verts=64)
    return cfg, model, params, smpl


def _batch(b=B, img=IMG, seed=0):
    rng = np.random.default_rng(seed)
    rot = R.random(b * 24, random_state=seed).as_matrix().astype(np.float32)
    return {
        "proxy": jnp.asarray(rng.normal(size=(b, img, img, 18)), jnp.float32),
        "pose_rotmats": jnp.asarray(rot[: b * 23].reshape(b, 23, 3, 3)),
        "glob_rotmats": jnp.asarray(rot[b * 23 :].reshape(b, 3, 3)),
        "shape": jnp.asarray(rng.normal(size=(b, 10)), jnp.float32),
        "joints2D": jnp.asarray(rng.uniform(0, img, size=(b, 17, 2)), jnp.float32),
        "joints2D_vis": jnp.ones((b, 17), jnp.float32),
    }


class TestLoss:
    def test_loss_terms(self):
        cfg = get_humaniflow_cfg_defaults()
        rng = np.random.default_rng(1)
        pred = {
            "pose_log_probs": jnp.asarray(rng.normal(size=(B, 23)), jnp.float32),
            "shape_mode": jnp.zeros((B, 10)),
            "shape_log_std": jnp.zeros((B, 10)),
            "joints2D": jnp.asarray(rng.normal(size=(B, 3, 17, 2)), jnp.float32),
            "glob_rotmats": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        }
        target = {
            "shape_params": jnp.zeros((B, 10)),
            "joints2D": jnp.asarray(rng.uniform(0, 32, size=(B, 17, 2)), jnp.float32),
            "joints2D_vis": jnp.ones((B, 17), jnp.float32),
            "glob_rotmats": jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        }
        total, bd = humaniflow_loss(cfg.LOSS, 32, pred, target)
        # pose NLL = -mean of log probs
        np.testing.assert_allclose(
            float(bd["pose_nll"]), -float(jnp.mean(pred["pose_log_probs"])), rtol=1e-5
        )
        # shape NLL of zeros under N(0,1): 0.5*log(2pi) per beta, summed
        np.testing.assert_allclose(
            float(bd["shape_nll"]), 10 * 0.5 * math.log(2 * math.pi), rtol=1e-5
        )
        assert float(bd["glob_rotmats"]) == 0.0
        w = cfg.LOSS.WEIGHTS
        np.testing.assert_allclose(
            float(total),
            float(bd["pose_nll"]) * w.POSE + float(bd["shape_nll"]) * w.SHAPE
            + float(bd["joints2D"]) * w.JOINTS2D,
            rtol=1e-5,
        )

    def test_visibility_masking(self):
        cfg = get_humaniflow_cfg_defaults()
        pred = {
            "pose_log_probs": jnp.zeros((2, 23)),
            "shape_mode": jnp.zeros((2, 10)),
            "shape_log_std": jnp.zeros((2, 10)),
            "joints2D": jnp.zeros((2, 1, 17, 2)),
            "glob_rotmats": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        }
        t_j2d = jnp.ones((2, 17, 2)) * 16  # normalises to 0 → zero error
        t_j2d_bad = t_j2d.at[:, 0].set(1000.0)
        vis_all = jnp.ones((2, 17), jnp.float32)
        vis_masked = vis_all.at[:, 0].set(0.0)
        target = lambda j2d, vis: {
            "shape_params": jnp.zeros((2, 10)), "joints2D": j2d,
            "joints2D_vis": vis, "glob_rotmats": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
        }
        _, bd_bad = humaniflow_loss(cfg.LOSS, 32, pred, target(t_j2d_bad, vis_all))
        _, bd_masked = humaniflow_loss(cfg.LOSS, 32, pred, target(t_j2d_bad, vis_masked))
        assert float(bd_bad["joints2D"]) > 10.0
        np.testing.assert_allclose(float(bd_masked["joints2D"]), 0.0, atol=1e-10)


class TestTrainStep:
    def test_step_runs_and_updates(self, setup):
        cfg, model, params, smpl = setup
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = jax.jit(
            make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
        )
        batch = _batch()
        new_params, new_opt, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["total"]))
        assert float(metrics["nan_skipped"]) == 0.0
        # params changed
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), new_params["fc1"], params["fc1"]
        )
        assert d["kernel"] > 0

    def test_nan_rollback(self, setup):
        cfg, model, params, smpl = setup
        opt = optax.adam(1e-4)
        opt_state = opt.init(params)
        step = jax.jit(
            make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
        )
        batch = _batch()
        batch["proxy"] = batch["proxy"].at[0, 0, 0, 0].set(jnp.nan)
        new_params, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
        assert float(metrics["nan_skipped"]) == 1.0
        # rollback: params unchanged
        same = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), new_params["fc1"], params["fc1"]
        )
        assert same["kernel"] == 0.0

    def test_data_parallel_matches_single_device(self, setup):
        cfg, model, params, smpl = setup
        opt = optax.adam(1e-4)
        step = make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
        batch = _batch(b=8)
        key = jax.random.PRNGKey(7)

        _, _, m_single = jax.jit(step)(params, opt.init(params), batch, key)

        mesh = make_mesh(8)
        p = replicate(params, mesh)
        o = replicate(opt.init(params), mesh)
        sb = shard_batch(batch, mesh)
        _, _, m_sharded = jax.jit(step)(p, o, sb, key)
        np.testing.assert_allclose(
            float(m_single["total"]), float(m_sharded["total"]), rtol=2e-4
        )


class TestFlowBatchNormTraining:
    def test_train_step_updates_flow_batchnorm_stats(self):
        """With NORM_FLOW.BATCH_NORM enabled the train step EMA-updates the
        per-part FlowBatchNorm running statistics (round-1 gap: the knob
        silently trained with frozen stats)."""
        from humaniflow_tpu.flows import FlowBatchNorm

        cfg = get_humaniflow_cfg_defaults()
        cfg.MODEL.NORM_FLOW.BATCH_NORM = True
        model = HumaniflowModel(cfg.MODEL)
        assert model.flow.has_batch_norm
        params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
        smpl = synthetic_smpl(num_verts=64)
        opt = optax.adam(1e-4)
        step = jax.jit(
            make_train_step(model, smpl, cfg.LOSS, opt, img_wh=IMG, num_j2d_samples=2)
        )
        bn_idx = [
            i for i, t in enumerate(model.flow.transforms)
            if isinstance(t, FlowBatchNorm)
        ]
        assert bn_idx
        key_name = f"transform_{bn_idx[0]}"
        old_mean = np.asarray(params["flows"][key_name]["moving_mean"]).copy()
        assert old_mean.shape == (23, 3)  # stacked per-part stats

        new_params, _, metrics = step(
            params, opt.init(params), _batch(), jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(metrics["total"]))
        new_mean = np.asarray(new_params["flows"][key_name]["moving_mean"])
        assert not np.allclose(new_mean, old_mean)


class TestOptimise:
    def test_optimise_reduces_loss(self, setup):
        cfg, model, params, smpl = setup
        ocfg = get_optimise_cfg_defaults()
        ocfg.NUM_ITERS = 5
        ocfg.LR = 1e-3
        b = 2
        rng = np.random.default_rng(3)
        rot = R.random(b, random_state=3).as_matrix().astype(np.float32)
        init = {
            "shape": jnp.zeros((b, 10)),
            "pose_axisangle": jnp.asarray(rng.normal(scale=0.2, size=(b, 23, 3)), jnp.float32),
            "glob_rotmat": jnp.asarray(rot),
            "cam_wp": jnp.asarray(np.tile([0.9, 0, 0], (b, 1)), jnp.float32),
            "input_feats": jnp.asarray(rng.normal(size=(b, model.feat_dim)), jnp.float32),
            "joints2D": jnp.asarray(rng.uniform(0, IMG, size=(b, 17, 2)), jnp.float32),
            "joints2D_conf": jnp.ones((b, 17)),
        }
        out = optimise_batch_with_humaniflow_prior(model, params, smpl, ocfg, init, img_wh=IMG)
        assert out["pose_axisangle"].shape == (b, 23, 3)
        assert not bool(out["halted_on_nan"])
        assert np.isfinite(np.asarray(out["final_losses"]["joints2D"])).all()
        # variables moved
        assert float(jnp.abs(out["pose_axisangle"] - init["pose_axisangle"]).max()) > 0

    def test_optimise_convergence_on_consistent_target(self, setup):
        """Convergence (VERDICT r1 item 6): with joints2D targets generated
        from a ground-truth SMPL configuration, refinement from a perturbed
        init reduces the visible-J2D error while the pose log-prob stays
        finite (reference optimise_humaniflow.py:72-137 behaviour)."""
        from humaniflow_tpu.data.label_conversions import ALL_JOINTS_TO_COCO_MAP
        from humaniflow_tpu.metrics.train_metrics import undo_keypoint_normalisation
        from humaniflow_tpu.models import smpl_forward
        from humaniflow_tpu.ops.camera import orthographic_project
        from humaniflow_tpu.ops.so3 import so3_exp

        cfg, model, params, smpl = setup
        ocfg = get_optimise_cfg_defaults()
        ocfg.NUM_ITERS = 40
        ocfg.LR = 1e-4
        b = 2
        rng = np.random.default_rng(7)

        gt_pose = jnp.asarray(rng.normal(scale=0.2, size=(b, 23, 3)), jnp.float32)
        gt_glob = jnp.asarray(
            R.random(b, random_state=7).as_matrix().astype(np.float32)
        )
        gt_shape = jnp.asarray(rng.normal(scale=0.3, size=(b, 10)), jnp.float32)
        cam = jnp.asarray(np.tile([0.9, 0, 0], (b, 1)), jnp.float32)

        # target joints2D from the GT configuration (same projection math as
        # the optimise loss: x-flip then weak-perspective)
        coco = jnp.asarray(np.asarray(ALL_JOINTS_TO_COCO_MAP))
        flip = so3_exp(jnp.asarray([[math.pi, 0.0, 0.0]], jnp.float32))[0]
        joints = smpl_forward(smpl, gt_shape, so3_exp(gt_pose), gt_glob)["joints"][:, coco]
        joints = jnp.einsum("ij,bkj->bki", flip, joints)
        target_j2d = undo_keypoint_normalisation(
            orthographic_project(joints, cam), IMG
        )

        init = {
            "shape": gt_shape + 0.2,
            "pose_axisangle": gt_pose + jnp.asarray(
                rng.normal(scale=0.15, size=(b, 23, 3)), jnp.float32
            ),
            "glob_rotmat": gt_glob,
            "cam_wp": cam,
            "input_feats": jnp.asarray(rng.normal(size=(b, model.feat_dim)), jnp.float32),
            "joints2D": target_j2d,
            "joints2D_conf": jnp.ones((b, 17)),
        }
        out = optimise_batch_with_humaniflow_prior(
            model, params, smpl, ocfg, init, img_wh=IMG
        )
        assert not bool(out["halted_on_nan"])
        init_j2d = float(out["initial_losses"]["joints2D"])
        final_j2d = float(out["final_losses"]["joints2D"])
        assert np.isfinite(final_j2d)
        assert final_j2d < init_j2d, (init_j2d, final_j2d)
        assert np.isfinite(float(out["final_losses"]["pose_logprob"]))

    def test_make_optimise_fn_reused_across_batches(self, setup):
        """The jit-once factory (pipelines/optimise.py make_optimise_fn):
        one built fn serves different batches and agrees with the one-shot
        wrapper on the same inputs (which routes through it)."""
        from humaniflow_tpu.pipelines import make_optimise_fn

        cfg, model, params, smpl = setup
        ocfg = get_optimise_cfg_defaults()
        ocfg.NUM_ITERS = 3
        b = 2
        fn = make_optimise_fn(model, smpl, ocfg, img_wh=IMG)
        outs = []
        for seed in (11, 12):
            rng = np.random.default_rng(seed)
            init = {
                "shape": jnp.zeros((b, 10)),
                "pose_axisangle": jnp.asarray(
                    rng.normal(scale=0.2, size=(b, 23, 3)), jnp.float32
                ),
                "glob_axisangle": jnp.asarray(
                    rng.normal(scale=0.2, size=(b, 3)), jnp.float32
                ),
                "cam_wp": jnp.asarray(np.tile([0.9, 0, 0], (b, 1)), jnp.float32),
                "input_feats": jnp.asarray(
                    rng.normal(size=(b, model.feat_dim)), jnp.float32
                ),
                "joints2D": jnp.asarray(
                    rng.uniform(0, IMG, size=(b, 17, 2)), jnp.float32
                ),
                "joints2D_conf": jnp.ones((b, 17)),
            }
            out = fn(params, init)
            assert not bool(out["halted_on_nan"])
            assert np.isfinite(np.asarray(out["pose_axisangle"])).all()
            outs.append((init, out))
        # wrapper parity on the second batch
        init, out = outs[1]
        out_w = optimise_batch_with_humaniflow_prior(
            model, params, smpl, ocfg, init, img_wh=IMG
        )
        np.testing.assert_allclose(
            np.asarray(out["pose_axisangle"]),
            np.asarray(out_w["pose_axisangle"]), atol=1e-6,
        )


class TestEvalMetrics:
    def test_point_and_sample_metrics(self):
        rng = np.random.default_rng(5)
        b, n, v = 3, 4, 32
        verts_t = rng.normal(size=(b, v, 3)).astype(np.float32)
        pred = {
            "verts3D": jnp.asarray(verts_t + 0.01),
            "tpose_verts3D": jnp.asarray(verts_t),
            "joints3D": jnp.asarray(rng.normal(size=(b, 14, 3)), jnp.float32),
            "verts3D_samples": jnp.asarray(
                verts_t[:, None] + rng.normal(scale=0.02, size=(b, n, v, 3)), jnp.float32
            ),
            "joints3D_samples": jnp.asarray(rng.normal(size=(b, n, 14, 3)), jnp.float32),
            "joints3D_coco_samples": jnp.asarray(rng.normal(size=(b, n, 17, 3)), jnp.float32),
            "tpose_verts3D_samples": jnp.asarray(
                np.tile(verts_t[:, None], (1, n, 1, 1)), jnp.float32
            ),
            "joints2D": jnp.asarray(rng.uniform(0, 64, (b, 17, 2)), jnp.float32),
            "joints2Dsamples": jnp.asarray(rng.uniform(0, 64, (b, n, 17, 2)), jnp.float32),
        }
        target = {
            "verts3D": jnp.asarray(verts_t),
            "tpose_verts3D": jnp.asarray(verts_t),
            "joints3D": pred["joints3D"] + 0.005,
            "joints2D": pred["joints2D"],
            "joints2D_vis": jnp.ones((b, 17), bool),
        }
        metrics = (
            "PVE", "PVE-SC", "PVE-PA", "PVE-T", "PVE-T-SC", "MPJPE", "MPJPE-SC",
            "MPJPE-PA", "PVE_samples_min", "MPJPE_samples_min", "joints2D-L2E",
            "joints2Dsamples-L2E", "verts3D_sample_diversity",
        )
        tracker = EvalMetricsTracker(metrics, num_samples_for_prob_metrics=n)
        tracker.update_per_batch(pred, target, b)
        final = tracker.compute_final_metrics(num_verts=v)
        np.testing.assert_allclose(final["PVE"], 0.01 * np.sqrt(3), rtol=1e-4)
        np.testing.assert_allclose(final["MPJPE"], 0.005 * np.sqrt(3), rtol=1e-4)
        assert final["PVE-T"] == 0.0
        assert final["joints2D-L2E"] == 0.0
        # min over samples <= point-estimate-style error of any single sample
        assert final["PVE_samples_min"] <= 0.02 * np.sqrt(3) * 2
        assert final["PVE-PA"] <= final["PVE"] + 1e-6
        assert final["PVE-SC"] <= final["PVE"] + 1e-6

    def test_train_tracker_epoch_history(self, tmp_path):
        tracker = TrainingLossesAndMetricsTracker(
            ("PVE", "joints2D-L2E"), img_wh=32,
            log_save_path=str(tmp_path / "log.pkl"),
        )
        tracker.initialise_loss_metric_sums()
        rng = np.random.default_rng(0)
        pred = {
            "verts3D": jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32),
            "joints2D": jnp.zeros((2, 17, 2)),
        }
        target = {
            "verts3D": pred["verts3D"],
            "joints2D": jnp.full((2, 17, 2), 16.0),
        }
        tracker.update_per_batch("train", 1.5, pred, target, 2)
        tracker.update_per_batch("val", 2.5, pred, target, 2)
        tracker.update_per_epoch()
        assert tracker.epochs_history["train_losses"] == [1.5]
        assert tracker.epochs_history["val_losses"] == [2.5]
        assert tracker.epochs_history["train_PVE"][-1] == 0.0
        # normalised (0,0) joints vs target at centre → 0 px error
        np.testing.assert_allclose(tracker.epochs_history["train_joints2D-L2E"][-1], 0.0, atol=1e-6)
        assert tracker.determine_save_model_weights_this_epoch(["PVE"], {"PVE": 1.0})

    def test_deferred_batch_sums_match_immediate(self, tmp_path):
        """batch_sums_device + one device_get + add_batch_sums (the epoch
        loop's batched-sync path) accumulates EXACTLY what the immediate
        update_per_batch does."""
        rng = np.random.default_rng(1)
        pred = {
            "verts3D": jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32),
            "joints2D": jnp.asarray(rng.uniform(-1, 1, size=(2, 17, 2)), jnp.float32),
        }
        target = {
            "verts3D": jnp.asarray(rng.normal(size=(2, 16, 3)), jnp.float32),
            "joints2D": jnp.asarray(rng.uniform(0, 32, size=(2, 17, 2)), jnp.float32),
        }
        metrics = ("PVE", "joints2D-L2E")
        t_imm = TrainingLossesAndMetricsTracker(metrics, img_wh=32)
        t_imm.initialise_loss_metric_sums()
        t_imm.update_per_batch("train", 1.5, pred, target, 2)

        t_def = TrainingLossesAndMetricsTracker(metrics, img_wh=32)
        t_def.initialise_loss_metric_sums()
        vals = jax.device_get(
            t_def.batch_sums_device(jnp.float32(1.5), pred, target)
        )
        t_def.add_batch_sums("train", vals, 2)
        for k, v in t_imm.loss_metric_sums.items():
            np.testing.assert_allclose(
                t_def.loss_metric_sums[k], v, rtol=1e-6, err_msg=k
            )

    def test_resume_truncation(self, tmp_path):
        path = str(tmp_path / "log.pkl")
        t1 = TrainingLossesAndMetricsTracker(("PVE",), 32, log_save_path=path)
        t1.initialise_loss_metric_sums()
        pred = {"verts3D": jnp.zeros((1, 8, 3))}
        target = {"verts3D": jnp.zeros((1, 8, 3))}
        for _ in range(3):
            t1.update_per_batch("train", 1.0, pred, target, 1)
            t1.update_per_batch("val", 1.0, pred, target, 1)
            t1.update_per_epoch()
            t1.initialise_loss_metric_sums()
        t2 = TrainingLossesAndMetricsTracker(
            ("PVE",), 32, log_save_path=path, load_logs=True, current_epoch=2
        )
        assert len(t2.epochs_history["train_losses"]) == 2


class TestPredict:
    def test_predict_fn(self, setup):
        cfg, model, params, smpl = setup
        predict = make_predict_fn(model, smpl, cfg, num_samples=3)
        proxy = jax.random.normal(jax.random.PRNGKey(1), (2, IMG, IMG, 18))
        out = predict(params, proxy, jax.random.PRNGKey(2))
        assert out["verts_samples"].shape == (2, 3, 64, 3)
        assert out["vertex_uncertainty_l2"].shape == (2, 64)
        assert np.isfinite(np.asarray(out["vertex_uncertainty_l2"])).all()

    def test_predict_data_parallel_matches_single(self, setup):
        """predict_humaniflow(mesh=8) pads + shards images over the data
        axis and reproduces the single-device outputs."""
        from humaniflow_tpu.pipelines.predict import predict_humaniflow

        _, model, params, smpl = setup
        cfg = get_humaniflow_cfg_defaults()
        cfg.DATA.PROXY_REP_SIZE = IMG
        rng = np.random.default_rng(5)
        images = rng.uniform(size=(3, IMG, IMG, 3)).astype(np.float32)  # pads to 8
        j2d = rng.uniform(0, IMG, size=(3, 17, 2)).astype(np.float32)
        conf = np.ones((3, 17), np.float32)
        key = jax.random.PRNGKey(9)
        single = predict_humaniflow(
            model, params, smpl, cfg, images, j2d, conf, num_samples=2, key=key,
        )
        sharded = predict_humaniflow(
            model, params, smpl, cfg, images, j2d, conf, num_samples=2, key=key,
            mesh=make_mesh(8),
        )
        np.testing.assert_allclose(
            np.asarray(single["verts_point_est"]),
            np.asarray(sharded["verts_point_est"]), atol=1e-5,
        )
        assert sharded["verts_samples"].shape[0] == 3
