"""Hand-rolled headless ResNet50 — faithful port of the reference's
``resnet/resnet.py`` (ResNet50:5-78, identity_block:79-144,
convolutional_block:146-224).

This is deliberately NOT the generic :mod:`backbones` ResNet: the
reference's hand-rolled network keeps the original-paper quirks that a
modern implementation papers over, and they change shapes and numerics —

* explicit ZeroPadding2D(3) then a VALID 7x7/2 stem (``resnet.py:23-33``),
* VALID MaxPool 3x3 stride 2 (``:35``),
* the downsampling stride lives on the FIRST 1x1 conv of each
  convolutional block (``:174-181``; later ResNets moved it to the 3x3),
* stage 2 uses stride 1 (``:38``),
* headless output is a 2x2/2 AveragePooling2D + Flatten, NOT global
  average pooling (``:63-67``) — the classifier Dense is commented out in
  the reference and omitted here too.

Generic stage_sizes variants over the shared bottleneck live in
:mod:`audio_training_tpu.models.backbones`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.models.layers import Conv, KerasBatchNorm


class IdentityBlock(nn.Module):
    """1x1 -> fxf(SAME) -> 1x1 bottleneck with identity shortcut
    (resnet.py:79-144)."""

    f: int
    filters: Sequence[int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3 = self.filters
        shortcut = x
        x = Conv(f1, (1, 1), dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(f2, (self.f, self.f), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(f3, (1, 1), dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        return nn.relu(x + shortcut)


class ConvolutionalBlock(nn.Module):
    """Bottleneck with a projected shortcut; stride ``s`` sits on the first
    1x1 conv and on the shortcut projection (resnet.py:146-224)."""

    f: int
    filters: Sequence[int]
    s: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3 = self.filters
        shortcut = x
        x = Conv(f1, (1, 1), strides=(self.s, self.s), dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(f2, (self.f, self.f), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(f3, (1, 1), dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        shortcut = Conv(f3, (1, 1), strides=(self.s, self.s),
                        dtype=self.dtype)(shortcut)
        shortcut = KerasBatchNorm(dtype=self.dtype)(shortcut, train)
        return nn.relu(x + shortcut)


# (stride, mid kernel, filters, identity-block count) per stage
# (resnet.py:38-60)
_STAGES = (
    (1, 3, (64, 64, 256), 2),
    (2, 3, (128, 128, 512), 3),
    (2, 3, (256, 256, 1024), 5),
    (2, 3, (512, 512, 2048), 2),
)


class ResNet50(nn.Module):
    """Headless hand-rolled ResNet50 (resnet.ResNet50, resnet.py:5-78):
    returns the flattened post-AvgPool feature map."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # ZeroPadding2D(3)
        x = Conv(64, (7, 7), strides=(2, 2), dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                        padding="VALID")
        for s, f, filters, n_id in _STAGES:
            x = ConvolutionalBlock(f, filters, s=s, dtype=self.dtype)(x, train)
            for _ in range(n_id):
                x = IdentityBlock(f, filters, dtype=self.dtype)(x, train)
        # Keras AveragePooling2D() defaults: 2x2 window, stride 2, VALID
        x = nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2),
                        padding="VALID")
        return x.reshape(x.shape[0], -1)  # Flatten


# reference naming (resnet.py:79, :146)
identity_block = IdentityBlock
convolutional_block = ConvolutionalBlock

__all__ = ["ResNet50", "IdentityBlock", "ConvolutionalBlock",
           "identity_block", "convolutional_block"]
