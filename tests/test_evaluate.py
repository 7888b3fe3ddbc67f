"""Evaluate-pipeline test: full loop over a fake gendered dataset, checking
the reference metric protocol end-to-end (proxy build → N-sample forward →
gendered targets → metrics → per-frame dumps).

The shipped per-dataset metric lists (`pipelines/protocols.py`, consumed by
`scripts/run_evaluate.py`) are run verbatim so the `-D ssp3d` / `-D 3dpw`
protocols are exercised in CI, including per-sample silhouette rendering."""

import os

import jax
import numpy as np
import pytest

from humaniflow_tpu.configs import get_humaniflow_cfg_defaults
from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
from humaniflow_tpu.pipelines.evaluate import evaluate_humaniflow
from humaniflow_tpu.pipelines.protocols import EVAL_METRICS_3DPW, EVAL_METRICS_SSP3D

IMG = 32


class _FakeEvalDataset:
    """Emits the REAL datasets' payload format: uint8 image + keypoints for
    device-side heatmap synthesis (pipelines/evaluate.py).  legacy_heatmaps
    exercises the back-compat path (pre-built f32 heatmaps + f32 image)."""

    def __init__(self, n=4, img=IMG, seed=0, with_silhouette=False,
                 legacy_heatmaps=False):
        self.rng = np.random.default_rng(seed)
        self.n = n
        self.img = img
        self.with_silhouette = with_silhouette
        self.legacy_heatmaps = legacy_heatmaps

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        item = {
            "pose": rng.normal(scale=0.3, size=72).astype(np.float32),
            "shape": rng.normal(scale=0.5, size=10).astype(np.float32),
            "joints2D": rng.uniform(0, self.img, size=(17, 2)).astype(np.float32),
            "joints2D_visib": np.ones(17, bool),
            "fname": f"frame_{i:04d}.png",
            "gender": "f" if i % 2 else "m",
        }
        if self.legacy_heatmaps:
            item["image"] = rng.uniform(size=(self.img, self.img, 3)).astype(np.float32)
            item["heatmaps"] = rng.uniform(size=(17, self.img, self.img)).astype(np.float32)
        else:
            item["image"] = (
                rng.uniform(size=(self.img, self.img, 3)) * 255
            ).astype(np.uint8)
            item["input_joints2D"] = (
                rng.uniform(0, self.img, size=(17, 2)).astype(np.int16).astype(np.float32)
            )
            item["input_joints2D_vis"] = np.ones(17, bool)
        if self.with_silhouette:
            sil = np.zeros((self.img, self.img), np.uint8)
            sil[8:24, 10:22] = 1
            item["silhouette"] = sil
        return item


@pytest.fixture(scope="module")
def setup():
    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    smpl_n = synthetic_smpl(num_verts=64, seed=0)
    smpl_m = synthetic_smpl(num_verts=64, seed=1)
    smpl_f = synthetic_smpl(num_verts=64, seed=2)
    return cfg, model, params, smpl_n, smpl_m, smpl_f


def test_evaluate_full_metric_set(setup, tmp_path):
    cfg, model, params, smpl_n, smpl_m, smpl_f = setup
    metrics = [
        "PVE", "PVE-SC", "PVE-PA", "PVE-T-SC", "MPJPE", "MPJPE-SC", "MPJPE-PA",
        "PVE_samples_min", "MPJPE_samples_min",
        "joints2D-L2E", "joints2Dsamples-L2E",
        "verts3D_sample_diversity", "joints3D_sample_diversity",
        "joints3D_invis_sample_diversity", "joints3D_vis_sample_diversity",
    ]
    final = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg,
        _FakeEvalDataset(n=4), metrics,
        batch_size=2, num_pred_samples=3,
        save_path=str(tmp_path), save_per_frame_metrics=True,
    )
    for m in metrics:
        assert m in final, m
        assert np.isfinite(final[m]), m
    # gendered targets differ → PVE > 0
    assert final["PVE"] > 0
    # min-over-samples can't beat... can't exceed the average-sample error;
    # sanity: it is positive and finite
    assert final["PVE_samples_min"] > 0
    # per-frame dumps written
    assert os.path.exists(os.path.join(tmp_path, "fname_per_frame.npy"))
    assert os.path.exists(os.path.join(tmp_path, "PVE_per_frame.npy"))
    pf = np.load(os.path.join(tmp_path, "PVE_per_frame.npy"))
    assert pf.shape == (4,)
    poses = np.load(os.path.join(tmp_path, "pose_per_frame.npy"))
    assert poses.shape == (4, 23, 3, 3)


def test_evaluate_shipped_3dpw_protocol(setup, tmp_path):
    """The exact `-D 3dpw` metric list from scripts/run_evaluate.py runs
    end-to-end (all point-est metrics + their _samples_min variants)."""
    cfg, model, params, smpl_n, smpl_m, smpl_f = setup
    final = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg,
        _FakeEvalDataset(n=4), list(EVAL_METRICS_3DPW),
        batch_size=2, num_pred_samples=3,
        save_path=str(tmp_path), save_per_frame_metrics=True,
    )
    for m in EVAL_METRICS_3DPW:
        assert m in final and np.isfinite(final[m]), m
    # min-over-samples never beats the best sample; sanity vs point est exists
    assert final["PVE_samples_min"] > 0


@pytest.mark.skipif(
    not os.path.exists(
        __import__(
            "humaniflow_tpu.configs.paths", fromlist=["DENSEPOSE_UV"]
        ).DENSEPOSE_UV
    ),
    reason="UV_Processed.mat not available",
)
def test_evaluate_shipped_ssp3d_protocol(tmp_path):
    """The exact `-D ssp3d` metric list — including silhouette-IOU and
    silhouettesamples-IOU, which need per-sample silhouette renders — runs
    end-to-end (this is the protocol that crashed in round 1)."""
    from humaniflow_tpu.render import TexturedIUVRenderer

    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    model = HumaniflowModel(cfg.MODEL)
    params = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    # silhouette rendering needs real-SMPL-sized meshes (DP vertex map)
    smpl_n = synthetic_smpl(num_verts=6890, seed=0)
    smpl_m = synthetic_smpl(num_verts=6890, seed=1)
    smpl_f = synthetic_smpl(num_verts=6890, seed=2)
    renderer = TexturedIUVRenderer(
        img_wh=IMG, projection_type="orthographic", render_rgb=False,
    )
    final = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg,
        _FakeEvalDataset(n=2, with_silhouette=True),
        list(EVAL_METRICS_SSP3D),
        batch_size=2, num_pred_samples=3, renderer=renderer,
        save_path=str(tmp_path), save_per_frame_metrics=True,
        silhouette_sample_chunk=2,  # force the chunked + remainder path
    )
    for m in EVAL_METRICS_SSP3D:
        assert m in final and np.isfinite(final[m]), m
    assert 0.0 <= final["silhouette-IOU"] <= 1.0
    assert 0.0 <= final["silhouettesamples-IOU"] <= 1.0
    pf = np.load(os.path.join(tmp_path, "silhouettesamples-IOU_per_frame.npy"))
    assert pf.shape == (2,)


def test_evaluate_deferred_sync_and_prefetch_match_per_batch_sync(setup, tmp_path):
    """sync_every=3 (device-side sum accumulation, one host sync per 3
    batches) + threaded host batch assembly match the per-batch-sync,
    inline-assembly path — including a flush of a partial (non-multiple)
    tail.  Per-frame dumps are bit-identical; final metrics differ only by
    summation order (f32 on-device adds vs f64 host adds), bounded at 1e-6."""
    cfg, model, params, smpl_n, smpl_m, smpl_f = setup
    metrics = ["PVE", "PVE-PA", "MPJPE", "joints2D-L2E", "PVE_samples_min"]
    kwargs = dict(batch_size=2, num_pred_samples=3, save_per_frame_metrics=True)

    base_times, deferred_times = [], []
    base = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg, _FakeEvalDataset(n=8),
        metrics, sync_every=1, prefetch=False, batch_times=base_times,
        save_path=str(tmp_path / "base"), **kwargs,
    )
    deferred = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg, _FakeEvalDataset(n=8),
        metrics, sync_every=3, prefetch=True, batch_times=deferred_times,
        save_path=str(tmp_path / "deferred"), **kwargs,
    )
    assert len(base_times) == len(deferred_times) == 4
    for m in metrics:
        np.testing.assert_allclose(base[m], deferred[m], rtol=1e-6)
        pf_b = np.load(os.path.join(tmp_path, "base", m + "_per_frame.npy"))
        pf_d = np.load(os.path.join(tmp_path, "deferred", m + "_per_frame.npy"))
        np.testing.assert_array_equal(pf_b, pf_d)
        assert pf_b.shape == (8,)


def _build_pw3d_dir(root, n=4, orig=64):
    """Fabricated on-disk 3DPW layout with BOTH the standard and the
    extreme-crop (scale 0.5) variants (reference data/pw3d_eval_dataset.py:
    20-37).  The extreme variant's frames/keypoints/GT differ from the
    standard ones so consumption differences are observable."""
    import cv2

    rng = np.random.default_rng(11)
    for sub, shift in (("cropped_frames", 0), ("extreme_cropped_0.5_frames", 90)):
        d = os.path.join(root, sub)
        os.makedirs(d)
        for i in range(n):
            img = rng.integers(0, 255, size=(orig, orig, 3)) + shift
            cv2.imwrite(os.path.join(d, f"f{i}.png"), np.clip(img, 0, 255).astype(np.uint8))
    kp = rng.uniform(4, orig - 4, size=(n, 17, 3)).astype(np.float32)
    kp[:, :, 2] = 0.9
    np.save(os.path.join(root, "hrnet_results_centred.npy"), kp)
    kp_ec = kp.copy()
    kp_ec[:, :, :2] = rng.uniform(4, orig - 4, size=(n, 17, 2))
    np.save(os.path.join(root, "extreme_cropped_0.5_hrnet_results_centred.npy"), kp_ec)
    j2d = rng.uniform(4, orig - 4, size=(n, 17, 3)).astype(np.float32)
    j2d[:, :, 2] = 0.9
    np.savez(
        os.path.join(root, "3dpw_test.npz"),
        imgname=np.array([f"f{i}.png" for i in range(n)]),
        pose=(rng.normal(scale=0.3, size=(n, 72))).astype(np.float32),
        shape=(rng.normal(scale=0.5, size=(n, 10))).astype(np.float32),
        gender=np.array(["m", "f"] * (n // 2)),
        joints2D_coco=j2d,
    )
    j2d_ec = j2d.copy()
    j2d_ec[:, :, :2] = rng.uniform(4, orig - 4, size=(n, 17, 2))
    np.save(os.path.join(root, "extreme_cropped_0.5_joints2D.npy"), j2d_ec)
    return kp, kp_ec


def test_evaluate_consumes_extreme_crop_variant(setup, tmp_path):
    """The `--extreme_crop_scale` eval path (reference
    data/pw3d_eval_dataset.py:20-25, run via scripts/run_evaluate.py) runs
    end-to-end: the extreme-crop dataset variant feeds the eval step, the
    3DPW metric protocol comes out finite, and the crop actually changed
    the proxy (different keypoints -> different metric values)."""
    pytest.importorskip("cv2")
    from humaniflow_tpu.data.datasets import PW3DEvalDataset

    cfg, model, params, smpl_n, smpl_m, smpl_f = setup
    root = str(tmp_path / "pw3d")
    os.makedirs(root)
    kp, kp_ec = _build_pw3d_dir(root)
    assert not np.allclose(kp[:, :, :2], kp_ec[:, :, :2])

    metrics = ["PVE", "MPJPE-PA", "joints2D-L2E", "joints2Dsamples-L2E",
               "PVE_samples_min"]
    finals = {}
    for name, ec in (("standard", None), ("extreme", 0.5)):
        ds = PW3DEvalDataset(
            root, cfg, extreme_crop_scale=ec, visible_joints_threshold=0.6
        )
        item = ds[0]
        assert item["image"].shape == (IMG, IMG, 3)
        finals[name] = evaluate_humaniflow(
            model, params, smpl_n, smpl_m, smpl_f, cfg, ds, metrics,
            batch_size=2, num_pred_samples=3,
            save_path=str(tmp_path / name), save_per_frame_metrics=True,
        )
        for m in metrics:
            assert np.isfinite(finals[name][m]), (name, m)
    # different input keypoints (the proxy) and GT joints -> the protocols
    # measurably diverge; identical values would mean the variant files
    # were silently ignored
    assert finals["standard"]["joints2D-L2E"] != finals["extreme"]["joints2D-L2E"]
    # same GT pose/shape but a different proxy -> different predictions
    assert finals["standard"]["PVE"] != finals["extreme"]["PVE"]
    pf = np.load(os.path.join(tmp_path, "extreme", "joints2D-L2E_per_frame.npy"))
    assert pf.shape == (4,)


def test_run_evaluate_cli_perf_flags(setup, tmp_path, monkeypatch):
    """`scripts/run_evaluate.py --sync_every / --pre_stage` (the perf levers
    the protocol benchmark uses, VERDICT r4 item 7) reach
    evaluate_humaniflow and the CLI completes end-to-end on a fabricated
    3DPW directory."""
    pytest.importorskip("cv2")
    import importlib
    import sys as _sys

    import humaniflow_tpu.models as M
    import humaniflow_tpu.pipelines.evaluate as E
    from humaniflow_tpu.configs import paths
    from humaniflow_tpu.utils.checkpoints import save_checkpoint

    cfg, model, params, smpl_n, _, _ = setup
    root = str(tmp_path / "pw3d")
    os.makedirs(root)
    _build_pw3d_dir(root)
    monkeypatch.setattr(paths, "PW3D_PATH", root)
    monkeypatch.setattr(M, "load_smpl_npz", lambda *a, **k: smpl_n)
    ckpt = save_checkpoint(str(tmp_path), "ckpt", {"params": params})
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text(f"DATA:\n  PROXY_REP_SIZE: {IMG}\n")

    seen = {}
    real_eval = E.evaluate_humaniflow

    def spy(*a, **k):
        seen.update(k)
        return real_eval(*a, **k)

    monkeypatch.setattr(E, "evaluate_humaniflow", spy)
    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    run_evaluate = importlib.import_module("run_evaluate")
    monkeypatch.setattr(_sys, "argv", [
        "run_evaluate.py", "-D", "3dpw", "-C", ckpt, "-B", "2", "-N", "2",
        "-S", str(tmp_path / "out"), "--cfg", str(cfg_path),
        "--sync_every", "3", "--pre_stage",
    ])
    run_evaluate.main()
    assert seen["sync_every"] == 3
    assert seen["pre_stage"] is True
    assert os.path.exists(tmp_path / "out" / "PVE_per_frame.npy")


def test_evaluate_data_parallel_matches_single(setup):
    """Sharded eval over the 8-device mesh (with batch padding) produces the
    same final metrics as the single-device run."""
    from humaniflow_tpu.parallel import make_mesh, replicate

    cfg, model, params, smpl_n, smpl_m, smpl_f = setup
    metrics = ["PVE", "MPJPE", "joints2D-L2E"]
    kwargs = dict(batch_size=3, num_pred_samples=2)  # 3 → pads to 8

    single = evaluate_humaniflow(
        model, params, smpl_n, smpl_m, smpl_f, cfg, _FakeEvalDataset(n=3),
        metrics, **kwargs,
    )
    mesh = make_mesh(8)
    sharded = evaluate_humaniflow(
        model, replicate(params, mesh), smpl_n, smpl_m, smpl_f, cfg,
        _FakeEvalDataset(n=3), metrics, mesh=mesh, **kwargs,
    )
    for m in metrics:
        np.testing.assert_allclose(single[m], sharded[m], rtol=1e-4)
