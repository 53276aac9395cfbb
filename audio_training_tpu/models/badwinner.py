"""badwinner v1 — the superseded small CNN (reference badwinner.py:47-94):
MagTransform -> BN -> 3 conv/pool stages of 16 filters -> dense 256/32 (as
1x1 convs over the spatial map, like the Keras Dense-on-4D behavior) ->
GlobalAvgPool -> Dense(num_labels) -> sigmoid/softmax.

No TF logit-parity oracle exists for this one: the reference's
``build_model`` reads ``activation`` before assigning it
(badwinner.py:85-87) and raises UnboundLocalError when called — v1 is
bit-rotted upstream; this port implements the architecture the dead code
describes (MagTransform ``a`` initialized to 0.0 per badwinner.py:34-38,
vs v2's -1.0)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.models.layers import (
    Conv,
    KerasBatchNorm,
    MagTransform,
    global_avg_pool,
    leaky_relu,
    max_pool,
)


class BadWinner(nn.Module):
    num_labels: int
    multi_label: bool = False
    filters: int = 16
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MagTransform(init_value=0.0)(x)  # badwinner.py:31-44 inits a=0
        x = KerasBatchNorm()(x, train)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = Conv(self.filters, (3, 3), dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)
        x = max_pool(x, (3, 3))
        x = Conv(self.filters, (3, 3), dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)
        x = max_pool(x, (3, 3))
        x = Conv(self.filters, (1, 3), dtype=self.dtype)(x)
        x = leaky_relu(x, 0.3)
        x = max_pool(x, (1, 3))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        # Keras Dense on a 4D tensor acts on the last axis (pointwise)
        for d in (256, 32):
            x = nn.Dense(d, dtype=self.dtype)(x)
            x = leaky_relu(x, 0.3)
            x = nn.Dropout(0.5, deterministic=not train)(x)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dense(self.num_labels)(x)
        if self.logits_only:
            return x
        return nn.sigmoid(x) if self.multi_label else nn.softmax(x)
