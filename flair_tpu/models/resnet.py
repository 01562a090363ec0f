"""ResNet backbones (flax, NHWC, inference BatchNorm).

Used by the RetinaFace detector (torchvision resnet50 in the reference,
retinaface.py:99-103) and by BiSeNet (facelib/parsing/resnet.py ResNet18).
Standard architecture — basic and bottleneck blocks, stages C2-C5.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        return nn.BatchNorm(
            use_running_average=True, param_dtype=jnp.float32, name="bn"
        )(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        h = ConvBN(self.features, 3, self.stride, self.dtype, name="c1")(x)
        h = jax.nn.relu(h)
        h = ConvBN(self.features, 3, 1, self.dtype, name="c2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(
                self.features, 1, self.stride, self.dtype, name="downsample"
            )(x)
        return jax.nn.relu(h + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; out = 4x
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * 4
        identity = x
        h = ConvBN(self.features, 1, 1, self.dtype, name="c1")(x)
        h = jax.nn.relu(h)
        h = ConvBN(self.features, 3, self.stride, self.dtype, name="c2")(h)
        h = jax.nn.relu(h)
        h = ConvBN(out_ch, 1, 1, self.dtype, name="c3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = ConvBN(out_ch, 1, self.stride, self.dtype,
                              name="downsample")(x)
        return jax.nn.relu(h + identity)


class ResNet(nn.Module):
    """Returns the C2..C5 stage features (for FPN consumers)."""

    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.width, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv1",
        )(x)
        h = nn.BatchNorm(
            use_running_average=True, param_dtype=jnp.float32, name="bn1"
        )(h)
        h = jax.nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), (2, 2), padding="VALID")

        Block = Bottleneck if self.block == "bottleneck" else BasicBlock
        outs = []
        ch = self.width
        for si, n in enumerate(self.layers):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Block(ch, stride, self.dtype, name=f"layer{si + 1}_{bi}")(h)
            outs.append(h)
            ch *= 2
        return outs  # [C2, C3, C4, C5]


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet("bottleneck", (3, 4, 6, 3), 64, dtype)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet("basic", (2, 2, 2, 2), 64, dtype)
