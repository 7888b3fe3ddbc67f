"""Day-0 real-checkpoint dry run (VERDICT r3 item 3).

The released weights (`humaniflow_weights.tar`, `pose_hrnet_w48_384x288.pth`
— reference README.md:55-80) cannot be downloaded in this environment, but
their FILE formats can be fabricated exactly:

* a `.tar` training checkpoint in the reference's save-dict layout
  (`train/train_humaniflow.py:390-398`: epoch / best_epoch /
  best_epoch_val_metrics / model_state_dict / best_model_state_dict /
  optimiser_state_dict) holding the REAL reference `HumaniflowModel`'s
  state dict (running under tests/pyro17_stub.py);
* a raw `.pth` state dict of the REAL reference `PoseHighResolutionNet`
  (W48) — the format `scripts/run_predict.py:54` loads.

This test drives the exact day-0 workflow end-to-end:
`scripts/convert_model_files.py` on both files → orbax outputs →
2-image `run_predict.main()` loading the ORBAX checkpoints — and asserts
the CLI's saved predictions equal the stub-backed torch model's own
forward on the same proxy.  On download day only the bytes change.
"""

import os
import sys

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

import pyro17_stub  # noqa: E402

pyro17_stub.install()

pytest.importorskip("models.norm_flows.pyro_conditional_norm_flow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEMO = os.path.join(REPO, "assets", "demo_images")
IMG = 32


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


def _fabricate_humaniflow_tar(tmp_path):
    """Build the REAL reference `HumaniflowModel` (under the pyro stub) and
    write its `.tar` training checkpoint in the reference save-dict layout
    (`train/train_humaniflow.py:390-398`).  `model_state_dict` is a
    PERTURBED copy while `best_model_state_dict` holds the true weights —
    CLI outputs matching the torch model prove the loader picked
    `best_model_state_dict` exactly like the reference
    (`scripts/run_evaluate.py:64`, `run_optimise.py:53`, strict=True).
    Returns (torch model, tar path)."""
    from models.humaniflow_model import HumaniflowModel as RefHumaniflowModel

    from humaniflow_tpu.models.smpl import SMPL_PARENTS
    from test_reference_flow_parity import _ref_model_cfg

    ref_cfg, _ = _ref_model_cfg()
    torch.manual_seed(0)
    tm = RefHumaniflowModel(
        device="cpu", model_cfg=ref_cfg, smpl_parents=list(SMPL_PARENTS)
    )
    g = torch.Generator()
    g.manual_seed(1)
    with torch.no_grad():  # non-trivial BN stats through the file path
        for name, buf in tm.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
    tm.eval()

    best_sd = tm.state_dict()
    last_sd = {k: v.clone() for k, v in best_sd.items()}
    with torch.no_grad():
        for v in last_sd.values():
            if v.is_floating_point():
                v.mul_(1.5).add_(0.05)

    tar_path = str(tmp_path / "humaniflow_weights.tar")
    torch.save(
        {
            "epoch": 5,
            "best_epoch": 4,
            "best_epoch_val_metrics": {"PVE-SC": 0.0712},
            "model_state_dict": last_sd,
            "best_model_state_dict": best_sd,
            "optimiser_state_dict": {},
        },
        tar_path,
    )
    return tm, tar_path


def test_day0_tar_pth_convert_cli_roundtrip(tmp_path, monkeypatch):
    import importlib

    from models.pose2D_hrnet import PoseHighResolutionNet as RefHRNet
    from test_reference_parity import W48_CFG

    import humaniflow_tpu.models as M

    # ---------- fabricate the reference's exact on-disk formats ----------
    tm, tar_path = _fabricate_humaniflow_tar(tmp_path)

    torch.manual_seed(2)
    hrnet_torch = RefHRNet(W48_CFG)
    hrnet_torch.eval()
    pth_path = str(tmp_path / "pose_hrnet_w48_384x288.pth")
    torch.save(hrnet_torch.state_dict(), pth_path)

    # ---------- scripts/convert_model_files.py on the files ----------
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    convert_model_files = importlib.import_module("convert_model_files")
    out_dir = str(tmp_path / "converted")
    monkeypatch.setattr(
        sys, "argv",
        ["convert_model_files.py", "--humaniflow_tar", tar_path,
         "--hrnet_pth", pth_path, "--out_dir", out_dir],
    )
    convert_model_files.main()
    hf_ckpt = os.path.join(out_dir, "humaniflow_params")
    hr_ckpt = os.path.join(out_dir, "hrnet_params")
    assert os.path.exists(hf_ckpt) or os.path.exists(hf_ckpt + ".pkl")
    assert os.path.exists(hr_ckpt) or os.path.exists(hr_ckpt + ".pkl")
    if not os.path.exists(hf_ckpt):
        hf_ckpt, hr_ckpt = hf_ckpt + ".pkl", hr_ckpt + ".pkl"

    # ---------- 2-image run_predict.main() from the ORBAX outputs ----------
    ph = importlib.import_module("humaniflow_tpu.pipelines.predict_hrnet")
    monkeypatch.setattr(ph, "HRNET_INPUT_WH", (64, 96))
    monkeypatch.setattr(ph, "HRNET_HEATMAP_WH", (16, 24))
    monkeypatch.setattr(
        M, "load_smpl_npz", lambda *a, **k: M.synthetic_smpl(num_verts=6890)
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    import shutil

    for f in sorted(os.listdir(DEMO))[:2]:
        shutil.copy(os.path.join(DEMO, f), img_dir / f)
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text(f"DATA:\n  PROXY_REP_SIZE: {IMG}\n")

    save_dir = tmp_path / "out"
    run_predict = importlib.import_module("run_predict")
    monkeypatch.setattr(sys, "argv", [
        "run_predict.py", "-I", str(img_dir), "-S", str(save_dir),
        "-N", "2", "--cfg", str(cfg_path),
        "-C", hf_ckpt, "--hrnet_checkpoint", hr_ckpt,
        # converted weights are f32; keep HRNet in f32 so the CLI's
        # detections are bit-comparable against the torch HRNet if needed
        "--hrnet_dtype", "f32",
    ])
    run_predict.main()

    dumps = sorted(f for f in os.listdir(save_dir) if f.endswith("_pred.npz"))
    assert len(dumps) == 2

    # ---------- the CLI's predictions == the torch model's own forward ----
    for fname in dumps:
        d = np.load(os.path.join(save_dir, fname))
        proxy = d["proxy_rep"]  # (wh, wh, 18) NHWC
        assert proxy.shape == (IMG, IMG, 18)
        with torch.no_grad():
            want = tm(
                torch.tensor(proxy.transpose(2, 0, 1)[None]),
                compute_point_est=True,
                num_samples=0,
            )
        assert _rel_err(d["cam_wp"], want["cam_wp"].numpy()[0]) < 2e-4
        assert (
            _rel_err(d["shape_mode"], want["shape_mode"].numpy()[0]) < 2e-4
        )
        assert (
            _rel_err(
                d["pose_rotmats_point_est"],
                want["pose_rotmats_point_est"].numpy()[0],
            )
            < 5e-4
        )


def test_day0_tar_evaluate_cli(tmp_path, monkeypatch):
    """Day-0 slice for `run_evaluate` (VERDICT r4 item 5): fabricated
    real-format `.tar` → `run_evaluate.main()` on a fabricated 3DPW
    directory.  Asserts (a) the CLI's converted params reproduce the
    stub-torch reference model's own forward, (b) `best_model_state_dict`
    (not `model_state_dict`) was loaded — reference `run_evaluate.py:64`
    strict-load semantics — and (c) the metric protocol completes with
    finite per-frame dumps."""
    pytest.importorskip("cv2")
    import importlib

    import jax.numpy as jnp

    import humaniflow_tpu.models as M
    from humaniflow_tpu.configs import get_humaniflow_cfg_defaults, paths
    from humaniflow_tpu.models import HumaniflowModel, synthetic_smpl
    from humaniflow_tpu.utils.convert_torch import (
        convert_humaniflow_checkpoint,
        convert_humaniflow_file,
    )
    from test_evaluate import _build_pw3d_dir

    tm, tar_path = _fabricate_humaniflow_tar(tmp_path)

    cfg = get_humaniflow_cfg_defaults()
    cfg.DATA.PROXY_REP_SIZE = IMG
    model = HumaniflowModel(cfg.MODEL)

    # (a)+(b): the file loader must yield exactly the converted BEST dict...
    params = convert_humaniflow_file(tar_path, model)
    want_params = convert_humaniflow_checkpoint(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()}, model
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, want_params,
    )
    # ...and its forward must equal the torch model's (the perturbed
    # `model_state_dict` would be ~1.5x off)
    proxy = np.random.default_rng(3).normal(size=(1, IMG, IMG, 18)).astype(np.float32)
    got = model.apply(params, jnp.asarray(proxy))
    with torch.no_grad():
        want = tm(
            torch.tensor(proxy.transpose(0, 3, 1, 2)),
            compute_point_est=True,
            num_samples=0,
        )
    assert _rel_err(got["cam_wp"], want["cam_wp"].numpy()) < 2e-4
    assert (
        _rel_err(
            got["pose_rotmats_point_est"],
            want["pose_rotmats_point_est"].numpy(),
        )
        < 5e-4
    )

    # (c): the full eval CLI consumes the tar directly
    root = str(tmp_path / "pw3d")
    os.makedirs(root)
    _build_pw3d_dir(root)
    monkeypatch.setattr(paths, "PW3D_PATH", root)
    monkeypatch.setattr(
        M, "load_smpl_npz", lambda *a, **k: synthetic_smpl(num_verts=64)
    )
    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text(f"DATA:\n  PROXY_REP_SIZE: {IMG}\n")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    run_evaluate = importlib.import_module("run_evaluate")
    out_dir = tmp_path / "eval_out"
    monkeypatch.setattr(sys, "argv", [
        "run_evaluate.py", "-D", "3dpw", "-C", tar_path, "-B", "2", "-N", "2",
        "-S", str(out_dir), "--cfg", str(cfg_path),
    ])
    run_evaluate.main()
    pve = np.load(out_dir / "PVE_per_frame.npy")
    assert pve.shape == (4,) and np.isfinite(pve).all()


def test_day0_tar_optimise_cli(tmp_path, monkeypatch):
    """Day-0 slice for `run_optimise` (VERDICT r4 item 5): fabricated `.tar`
    → `run_optimise.main()` on fabricated predict-stage outputs.  The CLI
    loads `best_model_state_dict` via the same strict converter (asserted
    exactly in test_day0_tar_evaluate_cli); here the flow-prior refinement
    must run end-to-end from the real-format file and write finite refined
    parameters that moved from the init."""
    pytest.importorskip("cv2")
    import importlib

    import cv2

    import humaniflow_tpu.models as M
    from humaniflow_tpu.models import synthetic_smpl

    _, tar_path = _fabricate_humaniflow_tar(tmp_path)
    monkeypatch.setattr(
        M, "load_smpl_npz", lambda *a, **k: synthetic_smpl(num_verts=64)
    )

    img_dir = tmp_path / "imgs"
    pred_dir = tmp_path / "pred"
    img_dir.mkdir()
    pred_dir.mkdir()
    rng = np.random.default_rng(5)
    init_pose = rng.normal(scale=0.2, size=(2, 23, 3)).astype(np.float32)
    for i in range(2):
        cv2.imwrite(
            str(img_dir / f"im{i}.png"),
            rng.integers(0, 255, size=(IMG, IMG, 3)).astype(np.uint8),
        )
        np.savez(
            pred_dir / f"im{i}_pred.npz",
            shape_mode=rng.normal(scale=0.3, size=10).astype(np.float32),
            pose_axisangle_point_est=init_pose[i],
            glob_rotmat=np.eye(3, dtype=np.float32),
            cam_wp=np.array([0.9, 0.0, 0.0], np.float32),
            input_feats=rng.normal(size=512).astype(np.float32),
            cropped_joints2D=rng.uniform(4, IMG - 4, size=(17, 2)).astype(np.float32),
            hrnet_joints2D_conf=np.full(17, 0.9, np.float32),
        )

    cfg_path = tmp_path / "small.yaml"
    cfg_path.write_text(f"DATA:\n  PROXY_REP_SIZE: {IMG}\n")
    opt_cfg_path = tmp_path / "opt.yaml"
    opt_cfg_path.write_text("NUM_ITERS: 3\nLR: 0.01\n")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    run_optimise = importlib.import_module("run_optimise")
    out_dir = tmp_path / "opt_out"
    monkeypatch.setattr(sys, "argv", [
        "run_optimise.py", "-I", str(img_dir), "-P", str(pred_dir),
        "-S", str(out_dir), "-C", tar_path, "--cfg", str(cfg_path),
        "--optimise_cfg", str(opt_cfg_path), "--no_visualise",
    ])
    run_optimise.main()

    for i in range(2):
        d = np.load(out_dir / f"im{i}_opt.npz")
        assert d["pose_axisangle"].shape == (23, 3)
        assert d["shape"].shape == (10,)
        assert np.isfinite(d["pose_axisangle"]).all()
        assert np.isfinite(d["shape"]).all()
        assert np.isfinite(d["cam_wp"]).all()
        # the optimiser actually stepped from the predict-stage init
        assert np.abs(d["pose_axisangle"] - init_pose[i]).max() > 1e-6
