"""Checkpoint save/load roundtrip + torch-checkpoint conversion tests.

The real reference weights are external downloads (absent here, as in the
reference repo); conversion is validated against a synthetic torch state dict
with the reference's exact naming scheme."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humaniflow_tpu.configs.defaults import ModelConfig
from humaniflow_tpu.models import HumaniflowModel
from humaniflow_tpu.utils.checkpoints import (
    load_checkpoint,
    load_training_info_from_checkpoint,
    save_checkpoint,
)
from humaniflow_tpu.utils.convert_torch import convert_humaniflow_checkpoint

IMG = 32


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "epoch": 7,
        "best_epoch": 5,
        "best_epoch_val_metrics": {"PVE-SC": 0.123},
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
    }
    path = save_checkpoint(str(tmp_path), "ckpt_test", state)
    loaded = load_checkpoint(path)
    assert int(loaded["epoch"]) == 7
    np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])
    epoch, best_epoch, best = load_training_info_from_checkpoint(loaded, ["PVE-SC", "MPJPE"])
    assert epoch == 8 and best_epoch == 5
    assert best["PVE-SC"] == pytest.approx(0.123)
    assert best["MPJPE"] == np.inf


def _fake_reference_state_dict(model):
    """Synthetic torch-style state dict with the reference's module naming
    (humaniflow_model.py + torchvision resnet18 + pyro ConditionalDenseNN)."""
    import torch

    rng = np.random.default_rng(0)
    sd = {}

    def lin(name, fin, fout):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(scale=0.02, size=(fout, fin)).astype(np.float32)
        )
        sd[f"{name}.bias"] = torch.tensor(rng.normal(scale=0.02, size=fout).astype(np.float32))

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(scale=0.02, size=(cout, cin, k, k)).astype(np.float32)
        )

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(np.ones(c, np.float32))
        sd[f"{name}.bias"] = torch.tensor(np.zeros(c, np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(np.zeros(c, np.float32))
        sd[f"{name}.running_var"] = torch.tensor(np.ones(c, np.float32))

    # resnet18 encoder
    conv("image_encoder.conv1", 18, 64, 7)
    bn("image_encoder.bn1", 64)
    channels = [64, 128, 256, 512]
    for stage in range(4):
        cin = channels[max(stage - 1, 0)]
        cout = channels[stage]
        for block in range(2):
            src = f"image_encoder.layer{stage + 1}.{block}"
            c_in = cin if block == 0 else cout
            conv(f"{src}.conv1", c_in, cout, 3)
            bn(f"{src}.bn1", cout)
            conv(f"{src}.conv2", cout, cout, 3)
            bn(f"{src}.bn2", cout)
            if block == 0 and stage > 0:
                conv(f"{src}.downsample.0", cin, cout, 1)
                bn(f"{src}.downsample.1", cout)

    lin("fc1", 512, 512)
    lin("fc_shape", 512, 20)
    lin("fc_glob", 512, 6)
    lin("fc_cam", 512, 3)
    lin("fc_input_shape_glob_cam_feats", 512 + 10 + 9 + 3, 256)
    for part in range(23):
        num_anc = len(model.ancestors[part])
        lin(f"fc_flow_context.{part}", 256 + 9 * num_anc, 64)
    # 2 spline-coupling modules per part; ConditionalDenseNN dims:
    # (ctx 64 + split 1) → 64 → 32 → 32 → 62
    dims = [65, 64, 32, 32, 62]
    for part in range(23):
        for c in range(2):
            mod = part * 2 + c
            for li in range(4):
                lin(
                    f"pose_so3flow_transform_modules.{mod}.nn.layers.{li}",
                    dims[li], dims[li + 1],
                )
    return {k: v.numpy() for k, v in sd.items()}


def test_convert_humaniflow_checkpoint():
    model = HumaniflowModel(ModelConfig())
    sd = _fake_reference_state_dict(model)
    params = convert_humaniflow_checkpoint(sd, model)

    # shape checks against a fresh init
    ref = model.init(jax.random.PRNGKey(0), input_shape=(1, IMG, IMG, 18))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    # linear transpose correctness
    np.testing.assert_allclose(
        params["fc1"]["kernel"], np.asarray(sd["fc1.weight"]).T
    )
    # ancestor-row placement: part 3 has 1 ancestor → rows 256..264 non-zero,
    # rest of the ancestor block zero
    k3 = params["fc_flow_context"]["kernel"][3]
    assert np.abs(k3[256:265]).sum() > 0
    assert np.abs(k3[265:]).sum() == 0

    # converted params drive the model
    out = model.apply(
        {**params}, jnp.zeros((1, IMG, IMG, 18)), key=jax.random.PRNGKey(1), num_samples=2
    )
    assert np.isfinite(np.asarray(out["pose_rotmats_samples"])).all()
