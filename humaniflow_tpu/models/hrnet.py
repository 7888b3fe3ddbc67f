"""Pose HRNet-W48 2D keypoint detector (flax.linen, NHWC).

Capability parity with reference `models/pose2D_hrnet.py:275`
(PoseHighResolutionNet; original: leoxiaobin/deep-high-resolution-net):
stem → 4×Bottleneck layer1 → three multi-resolution stages of BASIC blocks
([48, 96, 192, 384] channels, [1, 4, 3] modules) with full cross-resolution
fuse layers → 17 COCO-keypoint heatmaps.  Input 384×288 (H×W), heatmaps
96×72 (reference: configs/pose2D_hrnet_config.py:19-50).

Module names are deterministic (stage{S}_module{M}_branch{B}_block{K}, fuse
{i}_{j}) so the torch→JAX weight converter (utils/convert_torch.py) is a
mechanical name map.
"""

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# W48 configuration (reference: pose2D_hrnet_config.py)
STAGE_CHANNELS = (48, 96, 192, 384)
STAGE_MODULES = (1, 4, 3)       # stages 2, 3, 4
STAGE_BLOCKS = 4                # BASIC blocks per branch
NUM_JOINTS = 17


class BasicBlock(nn.Module):
    features: int
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    norm: Any
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def _upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), method="nearest")


class HighResolutionModule(nn.Module):
    """Per-branch BASIC-block stacks + full cross-resolution fusion
    (reference: pose2D_hrnet.py:102-266)."""

    num_branches: int
    channels: Tuple[int, ...]
    norm: Any
    multi_scale_output: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        # branches
        ys = []
        for b in range(self.num_branches):
            y = xs[b]
            for k in range(STAGE_BLOCKS):
                y = BasicBlock(self.channels[b], self.norm, dtype=self.dtype,
                               name=f"branch{b}_block{k}")(y)
            ys.append(y)

        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    v = ys[j]
                elif j > i:
                    # 1x1 conv + bn then nearest-upsample 2^(j-i)
                    v = nn.Conv(self.channels[i], (1, 1), use_bias=False, dtype=self.dtype,
                                name=f"fuse{i}_{j}_conv")(ys[j])
                    v = self.norm(name=f"fuse{i}_{j}_bn")(v)
                    v = _upsample_nearest(v, 2 ** (j - i))
                else:
                    # chain of stride-2 3x3 convs
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        v = nn.Conv(out_ch, (3, 3), (2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype, name=f"fuse{i}_{j}_conv{k}")(v)
                        v = self.norm(name=f"fuse{i}_{j}_bn{k}")(v)
                        if not last:
                            v = nn.relu(v)
                acc = v if acc is None else acc + v
            fused.append(nn.relu(acc))
        return fused


class PoseHighResolutionNet(nn.Module):
    """HRNet-W48: (B, 384, 288, 3) NHWC → (B, 96, 72, 17) heatmaps.

    ``dtype=jnp.bfloat16`` runs every conv in bf16 (params stored f32,
    BatchNorm statistics/affine applied in f32; returned heatmaps are f32).
    On TPU the f32 conv path already multiplies at bf16 MXU rate (DEFAULT
    precision), so the win is the HALVED HBM traffic on the bandwidth-bound
    high-resolution branches (docs/DESIGN.md "HRNet roofline"); keypoint
    argmax decode is unchanged at image scale (tests/test_hrnet.py).
    """

    num_joints: int = NUM_JOINTS
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)

        # stem
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = norm(name="bn2")(x)
        x = nn.relu(x)
        for k in range(4):
            x = Bottleneck(64, norm, dtype=self.dtype, name=f"layer1_block{k}")(x)  # → 256 ch

        # transition1: 256 → [48, 96/2]
        xs = [
            nn.relu(norm(name="transition1_0_bn")(
                nn.Conv(STAGE_CHANNELS[0], (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                        name="transition1_0_conv")(x))),
            nn.relu(norm(name="transition1_1_bn")(
                nn.Conv(STAGE_CHANNELS[1], (3, 3), (2, 2), padding=1,
                        use_bias=False, dtype=self.dtype, name="transition1_1_conv")(x))),
        ]
        for m in range(STAGE_MODULES[0]):
            xs = HighResolutionModule(2, STAGE_CHANNELS[:2], norm, dtype=self.dtype,
                                      name=f"stage2_module{m}")(xs)

        # transition2: new branch from the previous lowest resolution
        xs = xs + [
            nn.relu(norm(name="transition2_2_bn")(
                nn.Conv(STAGE_CHANNELS[2], (3, 3), (2, 2), padding=1,
                        use_bias=False, dtype=self.dtype, name="transition2_2_conv")(xs[-1])))
        ]
        for m in range(STAGE_MODULES[1]):
            xs = HighResolutionModule(3, STAGE_CHANNELS[:3], norm, dtype=self.dtype,
                                      name=f"stage3_module{m}")(xs)

        xs = xs + [
            nn.relu(norm(name="transition3_3_bn")(
                nn.Conv(STAGE_CHANNELS[3], (3, 3), (2, 2), padding=1,
                        use_bias=False, dtype=self.dtype, name="transition3_3_conv")(xs[-1])))
        ]
        for m in range(STAGE_MODULES[2]):
            last = m == STAGE_MODULES[2] - 1
            xs = HighResolutionModule(4, STAGE_CHANNELS, norm, dtype=self.dtype,
                                      multi_scale_output=not last,
                                      name=f"stage4_module{m}")(xs)

        out = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                      name="final_layer")(xs[0])
        return out.astype(jnp.float32)


def get_kp_locations_confs_from_heatmaps(heatmaps: jax.Array):
    """argmax decode: heatmaps (B, H, W, K) → keypoints (B, K, 2) in heatmap
    coords (x, y) + confidences (B, K) (reference: predict_hrnet.py:7)."""
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k)
    idx = jnp.argmax(flat, axis=1)  # (B, K)
    confs = jnp.max(flat, axis=1)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    return jnp.stack([x, y], axis=-1), confs
