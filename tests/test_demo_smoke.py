"""Demo-image pipeline smoke test (SURVEY.md §4: 'pipeline smoke tests on the
bundled demo images').

Runs the full uncropped predict pipeline — HRNet keypoints → proxy crop →
distribution inference → npz dumps — over assets/demo_images with random
weights.  TPU-gated: on the 1-core CPU host this takes too long for CI;
the path is routinely driven on TPU (see commit history / verify skill).
"""

import os
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "assets", "demo_images")

requires_tpu = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="full-res pipeline needs a TPU"
)


@requires_tpu
def test_demo_predict_pipeline(tmp_path):
    import humaniflow_tpu.models as M

    real_loader = M.load_smpl_npz
    M.load_smpl_npz = lambda *a, **k: M.synthetic_smpl(num_verts=6890)
    try:
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import run_predict

        sys.argv = [
            "run_predict.py", "-I", DEMO, "-S", str(tmp_path), "-N", "5",
        ]
        run_predict.main()
    finally:
        M.load_smpl_npz = real_loader

    dumps = [f for f in os.listdir(tmp_path) if f.endswith("_pred.npz")]
    assert len(dumps) == 6
    d = np.load(os.path.join(tmp_path, dumps[0]))
    for key in ("cam_wp", "pose_rotmats_point_est", "input_feats",
                "cropped_joints2D", "hrnet_joints2D_conf"):
        assert key in d.files, key
        assert np.isfinite(d[key]).all(), key


def test_demo_predict_pipeline_cpu_small(tmp_path, monkeypatch):
    """Reduced-resolution CPU variant of the demo smoke (VERDICT r1 item 8):
    2 demo images through the REAL run_predict.main() — batched HRNet at
    96×64, proxy 32², N=2 samples — so the full uncropped pipeline runs in
    every CI suite, not only on TPU."""
    import importlib

    import humaniflow_tpu.models as M

    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    monkeypatch.setattr(ph, "HRNET_INPUT_WH", (64, 96))
    monkeypatch.setattr(ph, "HRNET_HEATMAP_WH", (16, 24))
    monkeypatch.setattr(M, "load_smpl_npz", lambda *a, **k: M.synthetic_smpl(num_verts=6890))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    demo_files = sorted(os.listdir(DEMO))[:2]
    for f in demo_files:
        import shutil

        shutil.copy(os.path.join(DEMO, f), img_dir / f)

    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text("DATA:\n  PROXY_REP_SIZE: 32\n")

    save_dir = tmp_path / "out"
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_predict

    monkeypatch.setattr(sys, "argv", [
        "run_predict.py", "-I", str(img_dir), "-S", str(save_dir),
        "-N", "2", "--cfg", str(cfg_path),
    ])
    run_predict.main()

    dumps = [f for f in os.listdir(save_dir) if f.endswith("_pred.npz")]
    assert len(dumps) == 2
    d = np.load(os.path.join(save_dir, dumps[0]))
    for key in ("cam_wp", "pose_rotmats_point_est", "input_feats",
                "cropped_joints2D", "hrnet_joints2D_conf", "cropped_image"):
        assert key in d.files, key
        assert np.isfinite(d[key]).all(), key
    assert d["cropped_image"].shape == (32, 32, 3)


def test_demo_predict_cli_reference_flags(tmp_path, monkeypatch):
    """Reference CLI flag parity (run_predict.py): --cropped_images skips
    bbox refinement, -G selects the gendered SMPL npz, -T sets the joint
    -visibility threshold, -NP aliases -N (reference scripts/run_predict.py
    flags -C/-G/-T/-NP)."""
    import importlib

    import humaniflow_tpu.models as M

    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    monkeypatch.setattr(ph, "HRNET_INPUT_WH", (64, 96))
    monkeypatch.setattr(ph, "HRNET_HEATMAP_WH", (16, 24))
    requested_paths = []

    def fake_load(path, *a, **k):
        requested_paths.append(path)
        return M.synthetic_smpl(num_verts=6890)

    monkeypatch.setattr(M, "load_smpl_npz", fake_load)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    import shutil

    for f in sorted(os.listdir(DEMO))[:2]:
        shutil.copy(os.path.join(DEMO, f), img_dir / f)
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text("DATA:\n  PROXY_REP_SIZE: 32\n")

    save_dir = tmp_path / "out"
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_predict

    monkeypatch.setattr(sys, "argv", [
        "run_predict.py", "-I", str(img_dir), "-S", str(save_dir),
        "-NP", "2", "--cfg", str(cfg_path),
        "--cropped_images", "-G", "female", "-T", "0.6",
    ])
    run_predict.main()

    from humaniflow_tpu.configs import paths

    assert requested_paths == [paths.SMPL_FEMALE]
    dumps = [f for f in os.listdir(save_dir) if f.endswith("_pred.npz")]
    assert len(dumps) == 2
    d = np.load(os.path.join(save_dir, dumps[0]))
    # --cropped_images: whole image is the bbox — no keypoint-derived
    # refinement, so the stored bbox centre is the image centre
    h, w = d["bbox_height"], d["bbox_width"]
    assert np.isfinite(d["cam_wp"]).all()
    assert h > 0 and w > 0


def test_demo_predict_cli_data_parallel(tmp_path, monkeypatch):
    """run_predict.main() with --num_devices 8 on the virtual CPU mesh
    (VERDICT r2 item 5: data parallelism reachable from the CLIs, not just
    the pipeline APIs)."""
    import importlib

    import humaniflow_tpu.models as M

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (single real chip)")

    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    monkeypatch.setattr(ph, "HRNET_INPUT_WH", (64, 96))
    monkeypatch.setattr(ph, "HRNET_HEATMAP_WH", (16, 24))
    monkeypatch.setattr(M, "load_smpl_npz", lambda *a, **k: M.synthetic_smpl(num_verts=6890))

    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    import shutil

    for f in sorted(os.listdir(DEMO))[:2]:
        shutil.copy(os.path.join(DEMO, f), img_dir / f)

    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text("DATA:\n  PROXY_REP_SIZE: 32\n")

    save_dir = tmp_path / "out"
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_predict

    monkeypatch.setattr(sys, "argv", [
        "run_predict.py", "-I", str(img_dir), "-S", str(save_dir),
        "-N", "2", "--cfg", str(cfg_path), "--num_devices", "8",
    ])
    run_predict.main()

    dumps = [f for f in os.listdir(save_dir) if f.endswith("_pred.npz")]
    assert len(dumps) == 2
    d = np.load(os.path.join(save_dir, dumps[0]))
    assert np.isfinite(d["pose_rotmats_point_est"]).all()


def test_demo_predict_cli_sample_parallel(tmp_path, monkeypatch):
    """run_predict.main() with --num_devices 8 --sample_devices 2 (2-D
    (data=4, sample=2) mesh) on the virtual CPU mesh — the sample-axis
    latency lever reachable from the CLI (VERDICT r3 item 6)."""
    import importlib

    import humaniflow_tpu.models as M

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (single real chip)")

    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    monkeypatch.setattr(ph, "HRNET_INPUT_WH", (64, 96))
    monkeypatch.setattr(ph, "HRNET_HEATMAP_WH", (16, 24))
    monkeypatch.setattr(M, "load_smpl_npz", lambda *a, **k: M.synthetic_smpl(num_verts=6890))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    import shutil

    for f in sorted(os.listdir(DEMO))[:2]:
        shutil.copy(os.path.join(DEMO, f), img_dir / f)
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text("DATA:\n  PROXY_REP_SIZE: 32\n")

    save_dir = tmp_path / "out"
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import run_predict

    monkeypatch.setattr(sys, "argv", [
        "run_predict.py", "-I", str(img_dir), "-S", str(save_dir),
        "-N", "2", "--cfg", str(cfg_path),
        "--num_devices", "8", "--sample_devices", "2",
    ])
    run_predict.main()

    dumps = [f for f in os.listdir(save_dir) if f.endswith("_pred.npz")]
    assert len(dumps) == 2
    d = np.load(os.path.join(save_dir, dumps[0]))
    assert np.isfinite(d["pose_rotmats_point_est"]).all()
    assert np.isfinite(d["cam_wp"]).all()


def test_stage_timer():
    from humaniflow_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    for _ in range(3):
        timer.time_stage("add", lambda: x + 1)
    s = timer.summary()
    assert s["add"]["count"] == 3
    assert s["add"]["total_s"] > 0
    assert "add" in timer.report()
