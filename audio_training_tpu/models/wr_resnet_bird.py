"""BirdNET-flavored WideResNet — Flax port of ``resnet/wr_resnet_bird.py``.

Structure (resnet/wr_resnet_bird.py:7-179): 5x5 same-padded stem + BN +
MaxPool(1,2), then three stride-2 wr-stages whose basic blocks use a
BN-ReLU-1x1 pre-conv before downsampling (the "Bag of Tricks" §2 / BirdNET
pattern), MaxPool(2,2) downsampling in the main path and AvgPool + 1x1-conv
shortcuts; classification head Conv(4x10) -> Conv1x1 -> Conv(classes) ->
log-mean-exp pooling over both spatial axes (sharpness 5) -> Dense sigmoid.

Deviations from the reference source (both gated by
``keras_slip_compat``, default off):

* its pre-/mid-convs pass ``filters=X.shape[1]`` — the *spatial mel*
  dimension — as the filter count (resnet/wr_resnet_bird.py:128,139),
  which balloons parameters and is an evident indexing slip (the
  surrounding design keeps channel width until the block's second conv);
  the default uses the input's channel count, the evident intent;
* its head width comes from ``FILTERS = FILTERS * k`` — Python LIST
  repetition, not scalar multiply — so ``FILTERS[-1]`` is always 128
  (resnet/wr_resnet_bird.py:10-12); the default uses 128*k;
* its second ``logmeanexp(axis=2)`` runs on the already-reduced
  ``(B, W, classes)`` tensor, pooling the CLASS axis and feeding ``(B, W)``
  into the final Dense (resnet/wr_resnet_bird.py:73-77); the default pools
  both spatial axes instead.

``keras_slip_compat=True`` reproduces the reference exactly — the
TF logit-parity oracle (tests/test_tf_model_parity.py) builds both sides
in that mode.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.models.layers import (
    Conv,
    KerasBatchNorm,
    avg_pool,
    global_avg_pool,
    logmeanexp,
    max_pool,
)


class BirdBasicBlock(nn.Module):
    filters: int
    kernel: tuple[int, int] = (3, 3)
    stride: int = 1
    final_relu: bool = True
    keras_slip_compat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def width(t):
            # the reference's filters=X.shape[1] slip under compat mode
            return t.shape[1] if self.keras_slip_compat else t.shape[-1]

        shortcut = x
        if self.stride > 1:
            x = KerasBatchNorm(dtype=self.dtype)(x, train)
            x = nn.relu(x)
            x = Conv(width(x), (1, 1), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(width(x), self.kernel, padding="SAME", dtype=self.dtype)(x)
        if self.stride > 1:
            x = max_pool(x, (self.stride, self.stride))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = Conv(self.filters, self.kernel, padding="SAME", dtype=self.dtype)(x)

        if x.shape[-1] == shortcut.shape[-1] and self.stride == 1:
            pass
        else:
            shortcut = avg_pool(
                shortcut, (self.stride, self.stride), padding="SAME"
            )
            shortcut = Conv(
                self.filters, (1, 1), padding="SAME", dtype=self.dtype
            )(shortcut)
        x = x + shortcut
        if self.final_relu:
            x = nn.relu(x)
        return x


class WRResNetBird(nn.Module):
    classes: int
    depth: int = 22
    k: int = 4
    logits_only: bool = False
    keras_slip_compat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        filters = [16, 16 * self.k, 32 * self.k, 64 * self.k]
        kernel_sizes = [(5, 5), (3, 3), (3, 3), (3, 3)]
        # reference: FILTERS = [8,16,32,64,128] * k (LIST repetition) ->
        # FILTERS[-1] == 128; fixed default scales with k
        head_filters = 128 if self.keras_slip_compat else 128 * self.k
        n = int((self.depth - 4) / 6)

        for stage, f in enumerate(filters):
            if stage == 0:
                x = Conv(f, kernel_sizes[0], padding="SAME", dtype=self.dtype)(x)
                x = KerasBatchNorm(dtype=self.dtype)(x, train)
                x = max_pool(x, (1, 2))
            else:
                # first block of a stage downsamples; final ReLU is skipped
                # for the very first residual add (stage+sub_id <= 1,
                # resnet/wr_resnet_bird.py:177-178)
                x = BirdBasicBlock(
                    f, kernel_sizes[stage], stride=2,
                    final_relu=(stage > 1),
                    keras_slip_compat=self.keras_slip_compat,
                    dtype=self.dtype,
                )(x, train)
                for d in range(n - 1):
                    x = BirdBasicBlock(
                        f, kernel_sizes[stage], stride=1,
                        final_relu=(stage + d + 1 > 1),
                        keras_slip_compat=self.keras_slip_compat,
                        dtype=self.dtype,
                    )(x, train)

        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)

        # classification branch (resnet/wr_resnet_bird.py:47-77)
        x = Conv(head_filters, (4, 10), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Conv(head_filters * 2, (1, 1), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = Conv(self.classes, (1, 1), padding="SAME", dtype=self.dtype)(x)

        x = logmeanexp(x, axis=1, sharpness=5, keepdims=False)
        if self.keras_slip_compat:
            # reference: logmeanexp(axis=2) runs on the ALREADY-REDUCED
            # (B, W, classes) tensor, pooling the class axis and feeding
            # (B, W) into the Dense (resnet/wr_resnet_bird.py:73-77)
            x = logmeanexp(x, axis=2, sharpness=5, keepdims=False)
        else:
            x = logmeanexp(x, axis=1, sharpness=5, keepdims=False)
        x = x.astype(jnp.float32)
        x = nn.Dense(self.classes)(x)
        if self.logits_only:
            return x
        return nn.sigmoid(x)
