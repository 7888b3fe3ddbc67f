"""PyTorch → JAX checkpoint conversion.

The north-star workflow requires loading the reference's released weights
(`humaniflow_weights.tar`, `pose_hrnet_w48_384x288.pth` — BASELINE.md) into
this framework.  This module maps the reference's torch state-dict naming
(humaniflow_model.py module tree, incl. pyro `ConditionalDenseNN` layer
naming inside `pose_so3flow_transform_modules`) onto the humaniflow_tpu
parameter pytree:

* torch Linear weight (out, in) → kernel (in, out) transpose;
* torch Conv OIHW → flax HWIO;
* torchvision ResNet `layerX.Y.*` → flax `layerX_blockY.*`, `downsample.0/1`
  → `downsample_conv` / `downsample_bn`;
* per-body-part modules are STACKED along a leading 23-axis
  (`fc_flow_context.{i}` and `pose_so3flow_transform_modules.{2i,2i+1}` —
  two spline-coupling modules per part);
* `fc_flow_context` rows are placed into the zero-padded
  (isgc + 9*MAX_ANCESTORS)-row stacked kernel (ancestor slot a occupies
  rows 256+9a .. 256+9a+8, unused slots stay zero — they multiply
  zero-masked inputs).
"""

from typing import Dict

import numpy as np


def _t(w):
    """torch Linear weight (out, in) → (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):
    """torch Conv OIHW → flax HWIO."""
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: numpy} without needing pyro.

    Accepts the reference's .tar training checkpoints (uses
    'best_model_state_dict') and raw .pth state dicts.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "best_model_state_dict" in blob:
        sd = blob["best_model_state_dict"]
    elif isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
    else:
        sd = blob
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _convert_resnet(sd: Dict[str, np.ndarray], prefix: str, stage_sizes) -> Dict:
    """torchvision ResNet state dict → flax variables {'params', 'batch_stats'}."""
    params: Dict = {}
    stats: Dict = {}

    def bn(src, dst):
        params[dst] = {
            "scale": np.asarray(sd[f"{src}.weight"]),
            "bias": np.asarray(sd[f"{src}.bias"]),
        }
        stats[dst] = {
            "mean": np.asarray(sd[f"{src}.running_mean"]),
            "var": np.asarray(sd[f"{src}.running_var"]),
        }

    params["conv1"] = {"kernel": _conv(sd[f"{prefix}conv1.weight"])}
    bn(f"{prefix}bn1", "bn1")

    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            src = f"{prefix}layer{stage + 1}.{block}"
            dst = f"layer{stage + 1}_block{block}"
            bparams: Dict = {}
            bstats: Dict = {}
            conv_idx = 1
            while f"{src}.conv{conv_idx}.weight" in sd:
                bparams[f"conv{conv_idx}"] = {
                    "kernel": _conv(sd[f"{src}.conv{conv_idx}.weight"])
                }
                bparams[f"bn{conv_idx}"] = {
                    "scale": np.asarray(sd[f"{src}.bn{conv_idx}.weight"]),
                    "bias": np.asarray(sd[f"{src}.bn{conv_idx}.bias"]),
                }
                bstats[f"bn{conv_idx}"] = {
                    "mean": np.asarray(sd[f"{src}.bn{conv_idx}.running_mean"]),
                    "var": np.asarray(sd[f"{src}.bn{conv_idx}.running_var"]),
                }
                conv_idx += 1
            if f"{src}.downsample.0.weight" in sd:
                bparams["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])
                }
                bparams["downsample_bn"] = {
                    "scale": np.asarray(sd[f"{src}.downsample.1.weight"]),
                    "bias": np.asarray(sd[f"{src}.downsample.1.bias"]),
                }
                bstats["downsample_bn"] = {
                    "mean": np.asarray(sd[f"{src}.downsample.1.running_mean"]),
                    "var": np.asarray(sd[f"{src}.downsample.1.running_var"]),
                }
            params[dst] = bparams
            if bstats:
                stats[dst] = bstats
    return {"params": params, "batch_stats": stats}


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]), "bias": np.asarray(sd[f"{name}.bias"])}


def convert_humaniflow_checkpoint(sd: Dict[str, np.ndarray], model) -> Dict:
    """Reference HumaniflowModel state dict → humaniflow_tpu params pytree.

    :param model: humaniflow_tpu HumaniflowModel (for dims/ancestor layout).
    """
    stage_sizes = (2, 2, 2, 2) if model.cfg.NUM_RESNET_LAYERS == 18 else (3, 4, 6, 3)
    params = {
        "encoder": _convert_resnet(sd, "image_encoder.", stage_sizes),
        "fc1": _linear(sd, "fc1"),
        "fc_shape": _linear(sd, "fc_shape"),
        "fc_glob": _linear(sd, "fc_glob"),
        "fc_cam": _linear(sd, "fc_cam"),
        "fc_isgc": _linear(sd, "fc_input_shape_glob_cam_feats"),
    }

    # --- stacked per-part flow-context layers with zero-padded ancestor rows
    nparts = model.num_bodyparts
    ctx_dim = model.cfg.NORM_FLOW.CONTEXT_DIM
    isgc = model.isgc_dim
    kernel = np.zeros((nparts, model.ctx_in_dim, ctx_dim), np.float32)
    bias = np.zeros((nparts, ctx_dim), np.float32)
    for part in range(nparts):
        w = _t(sd[f"fc_flow_context.{part}.weight"])  # (in_p, ctx)
        bias[part] = np.asarray(sd[f"fc_flow_context.{part}.bias"])
        kernel[part, :isgc] = w[:isgc]
        num_anc = len(model.ancestors[part])
        if num_anc:
            kernel[part, isgc : isgc + 9 * num_anc] = w[isgc : isgc + 9 * num_anc]
    params["fc_flow_context"] = {"kernel": kernel, "bias": bias}

    # --- stacked per-part flow transform modules (couplings + optional
    # BatchNorm layers; permutes / radial tanh are parameterless)
    params["flows"] = convert_flow_transforms(
        sd, model.flow, prefix="pose_so3flow_transform_modules.",
        num_parts=nparts,
    )
    return params


def convert_flow_transforms(
    sd: Dict[str, np.ndarray], flow, prefix: str = "", num_parts=None
) -> Dict:
    """Reference flow transform-module-list state dict → ConditionalFlow
    params pytree.

    The reference keeps only nn.Module transforms in its registered list
    (pyro_conditional_norm_flow.py:116): coupling hypernets
    (`{mod}.nn.layers.{l}.weight/bias`) and — with batch_norm=on
    (pyro_conditional_norm_flow.py:77-78) — pyro BatchNorm modules
    (`{mod}.gamma/.beta/.moving_mean/.moving_variance`).  pyro's
    positivity constraint γ̂ = relu(γ)+1e-6 is folded into our exp
    parameterisation as log_gamma = log(γ̂) (flows/autoregressive.py:181).

    :param num_parts: if given, stack along a leading part axis with the
        reference model's flat indexing mod = part*modules_per_part + mi
        (humaniflow_model.py registers all parts in one ModuleList);
        otherwise convert a single flow's module list (mod = mi).
    """
    from ..flows.autoregressive import FlowBatchNorm

    module_slots = [
        (i, t)
        for i, t in enumerate(flow.transforms)
        if hasattr(t, "param_dims") or isinstance(t, FlowBatchNorm)
    ]
    per_part = len(module_slots)
    parts = range(num_parts) if num_parts is not None else (None,)

    def stack(vals):
        # np.array (not asarray): torch `state_dict()` tensors SHARE storage
        # with the live module, and `.numpy()` / `jnp.asarray` on CPU can
        # alias that memory — a later in-place buffer update (e.g. BN EMA)
        # would silently mutate the converted params
        return np.stack(vals) if num_parts is not None else np.array(vals[0])

    flows: Dict = {f"transform_{i}": {} for i in range(len(flow.transforms))}
    for mi, (slot, t) in enumerate(module_slots):
        def key(part, field):
            mod = mi if part is None else part * per_part + mi
            return f"{prefix}{mod}.{field}"

        if isinstance(t, FlowBatchNorm):
            gammas = [
                np.maximum(np.asarray(sd[key(p, "gamma")]), 0.0) + 1e-6
                for p in parts
            ]
            flows[f"transform_{slot}"] = {
                "log_gamma": stack([np.log(g).astype(np.float32) for g in gammas]),
                "beta": stack([np.asarray(sd[key(p, "beta")]) for p in parts]),
                "moving_mean": stack(
                    [np.asarray(sd[key(p, "moving_mean")]) for p in parts]
                ),
                "moving_var": stack(
                    [np.asarray(sd[key(p, "moving_variance")]) for p in parts]
                ),
            }
            continue
        layers: Dict = {}
        layer_idx = 0
        while key(parts[0], f"nn.layers.{layer_idx}.weight") in sd:
            layers[f"layer_{layer_idx}"] = {
                "kernel": stack(
                    [_t(sd[key(p, f"nn.layers.{layer_idx}.weight")]) for p in parts]
                ),
                "bias": stack(
                    [np.asarray(sd[key(p, f"nn.layers.{layer_idx}.bias")]) for p in parts]
                ),
            }
            layer_idx += 1
        flows[f"transform_{slot}"] = {"hypernet": layers}
    return flows


def convert_humaniflow_file(path: str, model) -> Dict:
    return convert_humaniflow_checkpoint(load_torch_state_dict(path), model)


def convert_hrnet_checkpoint(sd: Dict[str, np.ndarray]) -> Dict:
    """Reference pose_hrnet_w48 state dict → flax PoseHighResolutionNet
    variables.

    torch naming (models/pose2D_hrnet.py): stageS.M.branches.B.K.*,
    stageS.M.fuse_layers.I.J[.K].{0 conv,1 bn}, transitionT.B[.0].{0,1},
    layer1.K.*, conv1/bn1/conv2/bn2, final_layer.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(dst, sub, value):
        node_p = params
        for part in dst[:-1]:
            node_p = node_p.setdefault(part, {})
        if sub == "conv":
            node_p.setdefault(dst[-1], {})["kernel"] = _conv(value)
        else:  # bn tuple → scale/bias in params, mean/var in batch_stats
            node_s = stats
            for part in dst[:-1]:
                node_s = node_s.setdefault(part, {})
            w, b, m, v = value
            node_p.setdefault(dst[-1], {}).update(
                scale=np.asarray(w), bias=np.asarray(b)
            )
            node_s.setdefault(dst[-1], {}).update(
                mean=np.asarray(m), var=np.asarray(v)
            )

    def bn_vals(src):
        return (
            sd[f"{src}.weight"], sd[f"{src}.bias"],
            sd[f"{src}.running_mean"], sd[f"{src}.running_var"],
        )

    # stem
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put(("bn1",), "bn", bn_vals("bn1"))
    params["conv2"] = {"kernel": _conv(sd["conv2.weight"])}
    put(("bn2",), "bn", bn_vals("bn2"))

    # layer1: 4 bottlenecks
    for k in range(4):
        src = f"layer1.{k}"
        dst = f"layer1_block{k}"
        for c in (1, 2, 3):
            put((dst, f"conv{c}"), "conv", sd[f"{src}.conv{c}.weight"])
            put((dst, f"bn{c}"), "bn", bn_vals(f"{src}.bn{c}"))
        if f"{src}.downsample.0.weight" in sd:
            put((dst, "downsample_conv"), "conv", sd[f"{src}.downsample.0.weight"])
            put((dst, "downsample_bn"), "bn", bn_vals(f"{src}.downsample.1"))

    # transitions: 1.0 is Sequential(conv,bn,relu); the new-branch entries
    # are Sequential(Sequential(conv,bn,relu))
    put(("transition1_0_conv",), "conv", sd["transition1.0.0.weight"])
    put(("transition1_0_bn",), "bn", bn_vals("transition1.0.1"))
    put(("transition1_1_conv",), "conv", sd["transition1.1.0.0.weight"])
    put(("transition1_1_bn",), "bn", bn_vals("transition1.1.0.1"))
    put(("transition2_2_conv",), "conv", sd["transition2.2.0.0.weight"])
    put(("transition2_2_bn",), "bn", bn_vals("transition2.2.0.1"))
    put(("transition3_3_conv",), "conv", sd["transition3.3.0.0.weight"])
    put(("transition3_3_bn",), "bn", bn_vals("transition3.3.0.1"))

    # stages
    from ..models.hrnet import STAGE_MODULES

    for s, num_modules in zip((2, 3, 4), STAGE_MODULES):
        num_branches = s
        for m in range(num_modules):
            src_mod = f"stage{s}.{m}"
            dst_mod = f"stage{s}_module{m}"
            for b in range(num_branches):
                for k in range(4):
                    src = f"{src_mod}.branches.{b}.{k}"
                    dst = f"branch{b}_block{k}"
                    for c in (1, 2):
                        put((dst_mod, dst, f"conv{c}"), "conv", sd[f"{src}.conv{c}.weight"])
                        put((dst_mod, dst, f"bn{c}"), "bn", bn_vals(f"{src}.bn{c}"))
            multi_out = not (s == 4 and m == num_modules - 1)
            num_out = num_branches if multi_out else 1
            for i in range(num_out):
                for j in range(num_branches):
                    if j == i:
                        continue
                    if j > i:
                        put((dst_mod, f"fuse{i}_{j}_conv"), "conv",
                            sd[f"{src_mod}.fuse_layers.{i}.{j}.0.weight"])
                        put((dst_mod, f"fuse{i}_{j}_bn"), "bn",
                            bn_vals(f"{src_mod}.fuse_layers.{i}.{j}.1"))
                    else:
                        for k in range(i - j):
                            put((dst_mod, f"fuse{i}_{j}_conv{k}"), "conv",
                                sd[f"{src_mod}.fuse_layers.{i}.{j}.{k}.0.weight"])
                            put((dst_mod, f"fuse{i}_{j}_bn{k}"), "bn",
                                bn_vals(f"{src_mod}.fuse_layers.{i}.{j}.{k}.1"))

    params["final_layer"] = {
        "kernel": _conv(sd["final_layer.weight"]),
        "bias": np.asarray(sd["final_layer.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def convert_hrnet_file(path: str) -> Dict:
    return convert_hrnet_checkpoint(load_torch_state_dict(path))
