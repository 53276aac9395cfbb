"""badwinner2 — the flagship CNN, Flax/TPU-native.

Architecture parity with the reference ``badwinner2.build_model``
(badwinner2.py:212-324), a bulbul/sparrow-style BirdCLEF-lineage CNN:

    (B, 160 mels, 513 frames, C)
    -> MagTransform (x**sigmoid(a))
    -> BatchNorm over the mel axis (no scale/center)
    -> [Conv64 3x3 valid + LeakyReLU(0.01) + BN] x2 -> MaxPool 3x3
    -> [Conv128 3x3 + LReLU + BN] x2
    -> "big condense" Conv128 (44x3) for 160 mels / (22x3) for 96
    -> MaxPool (5,3) -> Dropout .5
    -> Conv1024 (1x9, orthogonal) -> LReLU -> BN -> Dropout
    -> Conv1024 (1x1, orthogonal) -> LReLU -> BN -> Dropout
    -> Conv(num_labels, 1x1, orthogonal) -> LReLU
    -> [optional LME pool over mel then time axes, sharpness 5]
    -> GlobalAvgPool -> sigmoid (multi-label) | softmax

All convs are NHWC with H=mel, W=time; compute dtype is configurable
(bfloat16 on TPU by default via the train harness; params stay fp32).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.models.layers import (
    Conv,
    KerasBatchNorm,
    LMELayer,
    MagTransform,
    global_avg_pool,
    leaky_relu,
    max_pool,
    orthogonal,
)


class BadWinner2(nn.Module):
    num_labels: int
    multi_label: bool = True
    lme: bool = False
    add_dense: bool = True
    big_condense: bool = True
    dropout: float = 0.5
    leaky_alpha: float = 0.01
    logits_only: bool = False
    # input already ran MagTransform + per-mel-row BN (the fused Pallas
    # featurizer can apply the frontend in-kernel at inference,
    # ops/pallas/fused_featurizer.py frontend_params) — skip it here
    external_frontend: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_mels = x.shape[1]
        a = self.leaky_alpha

        if not self.external_frontend:
            x = MagTransform()(x)
            # per-mel-row norm, beta/gamma off (badwinner2.py:233)
            x = KerasBatchNorm(feature_axis=1, use_scale=False,
                               use_bias=False)(x, train)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        for _ in range(2):
            x = Conv(64, (3, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, a)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = max_pool(x, (3, 3))

        for _ in range(2):
            x = Conv(128, (3, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, a)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)

        # squash the remaining mel bands into features (badwinner2.py:258-273).
        # dx_dots: XLA's data-gradient emitter for the tall 44-high kernel
        # picks a catastrophic window config inside the train graph
        # (22.4 ms/step at B=128 vs 6.7 ms for the same fwd+dx+dw isolated);
        # the custom backward computes dx as oh-unfolded MXU dots instead
        # (layers._condense_dx_dots).  Forward math is unchanged.
        if self.big_condense:
            if n_mels == 160:
                x = Conv(128, (44, 3), dtype=self.dtype, dx_dots=True)(x)
            elif n_mels == 96:
                x = Conv(128, (22, 3), dtype=self.dtype, dx_dots=True)(x)
            else:
                raise ValueError(f"Unhandled mel channels {n_mels}")
            x = leaky_relu(x, a)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
        else:
            x = Conv(128, (28, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, a)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
            x = Conv(128, (17, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, a)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)

        x = max_pool(x, (5, 3))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = Conv(1024, (1, 9), kernel_init=orthogonal, dtype=self.dtype)(x)
        x = leaky_relu(x, a)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        x = Conv(1024, (1, 1), kernel_init=orthogonal, dtype=self.dtype)(x)
        x = leaky_relu(x, a)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if not self.add_dense:
            return x

        x = Conv(self.num_labels, (1, 1), kernel_init=orthogonal, dtype=self.dtype)(
            x
        )
        x = leaky_relu(x, a)
        if self.lme:
            x = LMELayer(axis=1, sharpness=5)(x)
            x = LMELayer(axis=2, sharpness=5)(x)
        x = global_avg_pool(x).astype(jnp.float32)
        if self.logits_only:
            return x
        return nn.sigmoid(x) if self.multi_label else nn.softmax(x)


class ResBlock(nn.Module):
    """4-conv residual block of the badwinner2-res variant
    (badwinner2.res_block, badwinner2.py:66-124): [BN -> ReLU -> Conv3x3
    same] x4 plus a 1x1-conv shortcut."""

    filters: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        for _ in range(4):
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
            x = nn.relu(x)
            x = Conv(
                self.filters,
                (3, 3),
                strides=(self.stride, self.stride),
                padding="SAME",
                dtype=self.dtype,
            )(x)
        shortcut = Conv(
            x.shape[-1],
            (1, 1),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
        )(shortcut)
        return nn.relu(x + shortcut)


class BadWinner2Res(nn.Module):
    """badwinner2-res (badwinner2.build_model_res, badwinner2.py:127-209)."""

    num_labels: int
    multi_label: bool = True
    add_dense: bool = True
    big_condense: bool = True
    dropout: float = 0.5
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_mels = x.shape[1]
        x = MagTransform()(x)
        x = KerasBatchNorm(feature_axis=1, use_scale=False, use_bias=False)(
            x, train
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = Conv(64, (3, 3), dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)  # Keras LeakyReLU default alpha
        x = KerasBatchNorm(dtype=self.dtype)(x, train)

        x = ResBlock(64, dtype=self.dtype)(x, train)
        x = max_pool(x, (3, 3))
        x = ResBlock(128, dtype=self.dtype)(x, train)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)

        if self.big_condense:
            if n_mels != 160:
                raise ValueError(f"Unhandled mel channels {n_mels}")
            x = Conv(128, (48, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, 0.3)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
        else:
            x = Conv(128, (14, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, 0.3)
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
            x = Conv(128, (22, 3), dtype=self.dtype)(x)
            x = leaky_relu(x, 0.3)

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Conv(1024, (1, 9), kernel_init=orthogonal, dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Conv(1024, (1, 1), kernel_init=orthogonal, dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        if not self.add_dense:
            return x
        x = Conv(self.num_labels, (1, 1), kernel_init=orthogonal, dtype=self.dtype)(
            x
        )
        x = leaky_relu(x, 0.3)
        x = global_avg_pool(x).astype(jnp.float32)
        if self.logits_only:
            return x
        return nn.sigmoid(x) if self.multi_label else nn.softmax(x)
