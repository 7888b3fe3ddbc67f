"""ResNet image encoder (flax.linen), torchvision-layout compatible.

Capability parity with reference `models/resnet.py` (resnet18:229,
resnet50:251): configurable in_channels (18 for the proxy representation),
final FC removed, global average pool output (512-d / 2048-d).

TPU-first: NHWC layout (XLA's preferred conv layout), bf16-friendly compute
with f32 batch-norm statistics.  Module/parameter names mirror torchvision
(conv1, bn1, layer1..layer4, blockN.convM) so the torch checkpoint converter
is a mechanical name map (utils/convert_torch.py).
"""

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class StemConv(nn.Module):
    """The 7×7/stride-2 stem conv, computed as a space-to-depth 4×4/stride-1
    conv.  NOT wired in: measured SLOWER than the direct conv on TPU v5e.

    Theory: the proxy input has 18 channels, so a direct conv uses 18 of
    the MXU's 128 lanes; shuffling 2×2 pixel blocks into channels (72
    lanes) and polyphase-rearranging the kernel (dy = 3 + 2u + p maps tap
    dy onto shuffled-tap u, phase p) computes the IDENTICAL convolution
    (verified to 5e-7) at ~3× the lane utilisation.  Measured (B=72, 256²,
    chained-dependency timing): encoder fwd 9.5 → 11.8 ms — XLA's own
    lowering of small-input-channel stride-2 convs already beats the
    explicit shuffle, which adds a 340 MB HBM round-trip for the
    space-to-depth transpose (docs/DESIGN.md "Encoder roofline").  Kept as
    evidence; parameters match nn.Conv's {kernel: (7, 7, C, features)}
    layout so it remains drop-in.
    """

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, c, self.features), jnp.float32,
        )
        b, h, w, _ = x.shape
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        # tap dy ∈ [0, 7) sits at shuffled tap u = (dy + 1) // 2 - 1, phase
        # p = (dy + 1) % 2: shift the kernel by one into an 8×8 buffer and
        # regroup (2u, p) pairs; the dy = -1 slots stay zero.
        k9 = jnp.zeros((8, 8, c, self.features), k.dtype).at[1:8, 1:8].set(k)
        ks = k9.reshape(4, 2, 4, 2, c, self.features)
        ks = ks.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            xs, ks, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides), padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(residual)
            residual = self.norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Feature-extractor ResNet: returns pooled (B, C) features (no FC)."""

    stage_sizes: Sequence[int]
    block: ModuleDef
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """:param x: (B, H, W, C) NHWC input."""
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=jnp.float32)
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = norm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, num_blocks in enumerate(self.stage_sizes):
            features = 64 * 2**i
            for j in range(num_blocks):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block(features, strides, norm, self.dtype,
                               name=f"layer{i + 1}_block{j}")(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool → (B, C)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock, dtype=dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck, dtype=dtype)


RESNET_FEAT_DIMS = {18: 512, 50: 2048}
