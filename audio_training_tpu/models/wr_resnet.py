"""WideResNet (arXiv 1605.07146) — Flax port of the reference
``resnet/wr_resnet.py:5-90`` including its quirks (stride equals the stage
index, pre-activation basic blocks with dropout 0.1, identity/1x1-conv
shortcuts)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.models.layers import (
    Conv,
    KerasBatchNorm,
    global_avg_pool,
)


class BasicBlock(nn.Module):
    """Pre-activation basic block (resnet/wr_resnet.py:46-90)."""

    f1: int
    f2: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = KerasBatchNorm(dtype=self.dtype)(x, train)
        y = nn.relu(y)
        y = Conv(
            self.f1, (3, 3), strides=(self.stride, self.stride), padding="SAME",
            dtype=self.dtype,
        )(y)
        y = nn.Dropout(0.1, deterministic=not train)(y)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(self.f2, (3, 3), padding="SAME", dtype=self.dtype)(y)
        if y.shape[-1] != shortcut.shape[-1] or self.stride != 1:
            shortcut = Conv(
                y.shape[-1], (1, 1),
                strides=(self.stride, self.stride), padding="SAME",
                dtype=self.dtype,
            )(shortcut)
        return nn.relu(y + shortcut)


class WRResNet(nn.Module):
    """depth-22, k=4 wide resnet with filters [16, 64, 128, 256]
    (resnet/wr_resnet.py:5-33)."""

    classes: int
    depth: int = 22
    k: int = 4
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        filters = [16, 16 * self.k, 32 * self.k, 64 * self.k]
        n = int((self.depth - 4) / 6)
        for stage, f in enumerate(filters):
            if stage == 0:
                x = Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(x)
            else:
                # NOTE: the reference passes stride=stage (1, 2, 3)
                # (resnet/wr_resnet.py:21-23) — preserved here.
                x = BasicBlock(f, f, stride=stage, dtype=self.dtype)(x, train)
                for _ in range(n - 1):
                    x = BasicBlock(f, f, stride=1, dtype=self.dtype)(x, train)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dense(self.classes)(x)
        if self.logits_only:
            return x
        return nn.sigmoid(x)
