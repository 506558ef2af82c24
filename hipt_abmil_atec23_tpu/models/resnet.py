"""Frozen ResNet feature extractors.

Capability parity with the reference's patch encoders
(reference: models/resnet_custom.py): ``resnet50_trunc`` is ResNet-50 minus
layer4 with adaptive average pooling -> 1024-d features (:58-110,138-149);
``resnet18`` is the full torchvision ResNet-18 with the fc head stripped ->
512-d (:112-135). Both support ImageNet or "Histo" pretrained torch
state_dicts via models/convert.py.

TPU design: NHWC layout, explicit torch-equivalent conv paddings (SAME would
diverge on stride-2 layers), BatchNorm folded to inference mode with running
statistics (the encoders are frozen — reference: hipt_model_utils.py:55-57,
extract_features_fp.py:216).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((self.padding, self.padding), (self.padding, self.padding))
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.BatchNorm(use_running_average=True, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck, expansion 4
    (reference: resnet_custom.py:20-56)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.relu(_ConvBN(self.planes, (1, 1), dtype=self.dtype,
                              name="cb1")(x))
        out = nn.relu(_ConvBN(self.planes, (3, 3), self.stride, 1,
                              dtype=self.dtype, name="cb2")(out))
        out = _ConvBN(self.planes * 4, (1, 1), dtype=self.dtype,
                      name="cb3")(out)
        if self.downsample:
            residual = _ConvBN(self.planes * 4, (1, 1), self.stride,
                               dtype=self.dtype, name="down")(x)
        return nn.relu(out + residual)


class BasicBlock(nn.Module):
    """3x3 -> 3x3 basic block (ResNet-18/34)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.relu(_ConvBN(self.planes, (3, 3), self.stride, 1,
                              dtype=self.dtype, name="cb1")(x))
        out = _ConvBN(self.planes, (3, 3), 1, 1, dtype=self.dtype,
                      name="cb2")(out)
        if self.downsample:
            residual = _ConvBN(self.planes, (1, 1), self.stride,
                               dtype=self.dtype, name="down")(x)
        return nn.relu(out + residual)


class ResNetTrunk(nn.Module):
    """Stem + layer1..layerN + global average pool, NHWC."""
    block: Any = BottleneckBlock
    layers: Sequence[int] = (3, 4, 6)   # resnet50 minus layer4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(_ConvBN(64, (7, 7), 2, 3, dtype=self.dtype, name="stem")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        expansion = 4 if self.block is BottleneckBlock else 1
        planes = 64
        in_ch = 64
        for li, n_blocks in enumerate(self.layers):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                need_down = (bi == 0) and (s != 1 or in_ch != planes * expansion)
                x = self.block(planes, s, need_down, self.dtype,
                               name=f"layer{li + 1}_{bi}")(x)
                in_ch = planes * expansion
            planes *= 2
        x = jnp.mean(x, axis=(1, 2))   # AdaptiveAvgPool2d(1)
        return x.astype(jnp.float32)


def resnet50_trunc(dtype=jnp.float32) -> ResNetTrunk:
    """1024-d features (reference: resnet50_baseline, resnet_custom.py:138)."""
    return ResNetTrunk(block=BottleneckBlock, layers=(3, 4, 6), dtype=dtype)


def resnet18(dtype=jnp.float32) -> ResNetTrunk:
    """512-d features: full ResNet-18 trunk, fc stripped
    (reference: resnet18_baseline, resnet_custom.py:112-135)."""
    return ResNetTrunk(block=BasicBlock, layers=(2, 2, 2, 2), dtype=dtype)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def imagenet_normalize(x_uint8: jax.Array) -> jax.Array:
    """torchvision eval transform (reference: dataset_h5.py:21-37)."""
    x = x_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
