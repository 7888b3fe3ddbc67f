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
