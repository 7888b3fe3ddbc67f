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


def test_day0_tar_pth_convert_cli_roundtrip(tmp_path, monkeypatch):
    import importlib

    from models.humaniflow_model import HumaniflowModel as RefHumaniflowModel
    from models.pose2D_hrnet import PoseHighResolutionNet as RefHRNet
    from test_reference_flow_parity import _ref_model_cfg
    from test_reference_parity import W48_CFG

    import humaniflow_tpu.models as M
    from humaniflow_tpu.models.smpl import SMPL_PARENTS

    # ---------- fabricate the reference's exact on-disk formats ----------
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

    tar_path = str(tmp_path / "humaniflow_weights.tar")
    torch.save(
        {
            "epoch": 5,
            "best_epoch": 4,
            "best_epoch_val_metrics": {"PVE-SC": 0.0712},
            "model_state_dict": tm.state_dict(),
            "best_model_state_dict": tm.state_dict(),
            "optimiser_state_dict": {},
        },
        tar_path,
    )

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
