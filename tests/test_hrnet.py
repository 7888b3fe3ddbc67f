"""HRNet-W48 tests: output shapes, keypoint decode, converter structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humaniflow_tpu.models.hrnet import (
    PoseHighResolutionNet,
    get_kp_locations_confs_from_heatmaps,
)

# full 384×288 is too slow for CPU tests; HRNet is fully convolutional so a
# smaller multiple-of-32 input exercises every layer
H, W = 96, 64


@pytest.fixture(scope="module")
def hrnet_and_params():
    model = PoseHighResolutionNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), train=False)
    return model, params


def test_forward_shapes(hrnet_and_params):
    model, params = hrnet_and_params
    out = model.apply(params, jnp.zeros((2, H, W, 3)), train=False)
    assert out.shape == (2, H // 4, W // 4, 17)
    assert np.isfinite(np.asarray(out)).all()


def test_param_count_is_w48_scale(hrnet_and_params):
    _, params = hrnet_and_params
    n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params["params"]))
    # HRNet-W48 has ~63.6M params
    assert 60e6 < n < 68e6, n


def test_keypoint_decode():
    hm = jnp.zeros((1, 8, 6, 2)).at[0, 3, 4, 0].set(2.0).at[0, 7, 1, 1].set(1.5)
    kps, confs = get_kp_locations_confs_from_heatmaps(hm)
    np.testing.assert_allclose(np.asarray(kps[0]), [[4, 3], [1, 7]])
    np.testing.assert_allclose(np.asarray(confs[0]), [2.0, 1.5])


def test_converter_structure(hrnet_and_params):
    """The converter's output tree must line up with flax's variable tree;
    validated with a synthetic state dict derived from the flax shapes."""
    from humaniflow_tpu.utils.convert_torch import convert_hrnet_checkpoint

    model, params = hrnet_and_params

    # Build a torch-style state dict whose values match the flax shapes by
    # inverting the name map: walk flax tree → emit torch names.
    sd = {}

    def conv_t(kernel):
        return np.transpose(kernel, (3, 2, 0, 1))

    p = params["params"]
    s = params["batch_stats"]

    def emit_bn(torch_name, flax_path_p, flax_path_s):
        sd[f"{torch_name}.weight"] = np.asarray(flax_path_p["scale"])
        sd[f"{torch_name}.bias"] = np.asarray(flax_path_p["bias"])
        sd[f"{torch_name}.running_mean"] = np.asarray(flax_path_s["mean"])
        sd[f"{torch_name}.running_var"] = np.asarray(flax_path_s["var"])

    sd["conv1.weight"] = conv_t(p["conv1"]["kernel"])
    emit_bn("bn1", p["bn1"], s["bn1"])
    sd["conv2.weight"] = conv_t(p["conv2"]["kernel"])
    emit_bn("bn2", p["bn2"], s["bn2"])
    for k in range(4):
        dst = f"layer1_block{k}"
        for c in (1, 2, 3):
            sd[f"layer1.{k}.conv{c}.weight"] = conv_t(p[dst][f"conv{c}"]["kernel"])
            emit_bn(f"layer1.{k}.bn{c}", p[dst][f"bn{c}"], s[dst][f"bn{c}"])
        if "downsample_conv" in p[dst]:
            sd[f"layer1.{k}.downsample.0.weight"] = conv_t(p[dst]["downsample_conv"]["kernel"])
            emit_bn(f"layer1.{k}.downsample.1", p[dst]["downsample_bn"], s[dst]["downsample_bn"])
    for tname, fname in [
        ("transition1.0.0", "transition1_0"),
        ("transition1.1.0.0", "transition1_1"),
        ("transition2.2.0.0", "transition2_2"),
        ("transition3.3.0.0", "transition3_3"),
    ]:
        sd[f"{tname}.weight"] = conv_t(p[f"{fname}_conv"]["kernel"])
        bn_t = tname.rsplit(".", 1)[0] + "." + str(int(tname.rsplit(".", 1)[1]) + 1)
        emit_bn(bn_t, p[f"{fname}_bn"], s[f"{fname}_bn"])

    from humaniflow_tpu.models.hrnet import STAGE_MODULES

    for st, num_modules in zip((2, 3, 4), STAGE_MODULES):
        for m in range(num_modules):
            mod = f"stage{st}_module{m}"
            for b in range(st):
                for k in range(4):
                    blk = p[mod][f"branch{b}_block{k}"]
                    blk_s = s[mod][f"branch{b}_block{k}"]
                    for c in (1, 2):
                        sd[f"stage{st}.{m}.branches.{b}.{k}.conv{c}.weight"] = conv_t(blk[f"conv{c}"]["kernel"])
                        emit_bn(f"stage{st}.{m}.branches.{b}.{k}.bn{c}", blk[f"bn{c}"], blk_s[f"bn{c}"])
            multi_out = not (st == 4 and m == num_modules - 1)
            for i in range(st if multi_out else 1):
                for j in range(st):
                    if j == i:
                        continue
                    if j > i:
                        sd[f"stage{st}.{m}.fuse_layers.{i}.{j}.0.weight"] = conv_t(p[mod][f"fuse{i}_{j}_conv"]["kernel"])
                        emit_bn(f"stage{st}.{m}.fuse_layers.{i}.{j}.1",
                                p[mod][f"fuse{i}_{j}_bn"], s[mod][f"fuse{i}_{j}_bn"])
                    else:
                        for k in range(i - j):
                            sd[f"stage{st}.{m}.fuse_layers.{i}.{j}.{k}.0.weight"] = conv_t(p[mod][f"fuse{i}_{j}_conv{k}"]["kernel"])
                            emit_bn(f"stage{st}.{m}.fuse_layers.{i}.{j}.{k}.1",
                                    p[mod][f"fuse{i}_{j}_bn{k}"], s[mod][f"fuse{i}_{j}_bn{k}"])
    sd["final_layer.weight"] = conv_t(p["final_layer"]["kernel"])
    sd["final_layer.bias"] = np.asarray(p["final_layer"]["bias"])

    converted = convert_hrnet_checkpoint(sd)
    want = jax.tree_util.tree_map(lambda a: a.shape, dict(params))
    got = jax.tree_util.tree_map(lambda a: a.shape, converted)
    assert want == got
    # values roundtrip exactly
    np.testing.assert_array_equal(
        converted["params"]["conv1"]["kernel"], np.asarray(p["conv1"]["kernel"])
    )
    # converted params run
    out = model.apply(converted, jnp.zeros((1, H, W, 3)), train=False)
    assert out.shape == (1, H // 4, W // 4, 17)


def test_bf16_compute_dtype_agreement(hrnet_and_params):
    """dtype=bf16 (the predict CLI default on TPU) keeps f32 params and f32
    output, and at trained-magnitude activations (random init damped so the
    residual stages don't amplify exponentially) matches f32 keypoint argmax
    exactly with small relative heatmap error."""
    import flax

    _, params = hrnet_and_params
    flat = flax.traverse_util.flatten_dict(params)
    damped = flax.traverse_util.unflatten_dict(
        {k: (v * 0.25 if k[-1] == "kernel" else v) for k, v in flat.items()}
    )

    x = jax.random.uniform(jax.random.PRNGKey(3), (2, H, W, 3))
    m32 = PoseHighResolutionNet()
    m16 = PoseHighResolutionNet(dtype=jnp.bfloat16)
    o32 = m32.apply(damped, x, train=False)
    o16 = m16.apply(damped, x, train=False)
    assert o16.dtype == jnp.float32
    rel = float(jnp.abs(o32 - o16).mean()) / float(o32.std())
    assert rel < 0.02, rel
    j32, _ = get_kp_locations_confs_from_heatmaps(o32)
    j16, _ = get_kp_locations_confs_from_heatmaps(o16)
    np.testing.assert_array_equal(np.asarray(j32), np.asarray(j16))
