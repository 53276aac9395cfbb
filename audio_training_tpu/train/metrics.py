"""Metrics — parity with the reference compile set (audiomodel.py:858-871):
binary/categorical accuracy, AUC, precision, recall, focal-BCE, Huber, plus
the custom precAtK top-k metric (audiomodel.py:2653-2717).

All metrics are pure-functional accumulators: ``init() -> state``,
``update(state, probs, labels) -> state``, ``compute(state) -> scalar`` —
jit-friendly and shardable (states combine by psum across data shards).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def binary_accuracy(probs: jax.Array, labels: jax.Array,
                    threshold: float = 0.5) -> jax.Array:
    """tf.metrics.binary_accuracy semantics: elementwise match rate."""
    pred = (probs > threshold).astype(jnp.float32)
    return (pred == labels).astype(jnp.float32).mean()


def categorical_accuracy(probs: jax.Array, labels: jax.Array) -> jax.Array:
    return (jnp.argmax(probs, -1) == jnp.argmax(labels, -1)).astype(
        jnp.float32
    ).mean()


# ---------------------------------------------------------------------------
# Streaming AUC / precision / recall over fixed thresholds (the Keras way)
# ---------------------------------------------------------------------------

NUM_THRESHOLDS = 200


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ConfusionState:
    tp: jax.Array  # (T,)
    fp: jax.Array
    tn: jax.Array
    fn: jax.Array


def confusion_init(num_thresholds: int = NUM_THRESHOLDS) -> ConfusionState:
    # four distinct buffers — a shared one breaks jit donation (donating the
    # same buffer twice is an XLA error)
    def z():
        return jnp.zeros((num_thresholds,), jnp.float32)

    return ConfusionState(z(), z(), z(), z())


def _thresholds(n: int) -> jax.Array:
    # Keras AUC threshold spacing: (n-2) evenly spaced in (0,1) plus -eps/1+eps
    t = jnp.linspace(0.0, 1.0, n)
    return t.at[0].set(-1e-7).at[-1].set(1.0 + 1e-7)


def confusion_update(
    state: ConfusionState, probs: jax.Array, labels: jax.Array
) -> ConfusionState:
    t = _thresholds(state.tp.shape[0])
    p = probs.reshape(-1)[None, :] > t[:, None]  # (T, N)
    y = labels.reshape(-1)[None, :] > 0.5
    tp = (p & y).sum(-1).astype(jnp.float32)
    fp = (p & ~y).sum(-1).astype(jnp.float32)
    tn = (~p & ~y).sum(-1).astype(jnp.float32)
    fn = (~p & y).sum(-1).astype(jnp.float32)
    return ConfusionState(state.tp + tp, state.fp + fp, state.tn + tn,
                          state.fn + fn)


def auc_compute(state: ConfusionState) -> jax.Array:
    """ROC AUC by trapezoidal interpolation over the threshold grid
    (tf.keras.metrics.AUC equivalent)."""
    tpr = state.tp / jnp.maximum(state.tp + state.fn, 1e-7)
    fpr = state.fp / jnp.maximum(state.fp + state.tn, 1e-7)
    # thresholds ascend -> fpr/tpr descend; integrate over fpr
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)


def precision_compute(state: ConfusionState) -> jax.Array:
    """Precision at threshold 0.5 (Keras default)."""
    i = state.tp.shape[0] // 2
    return state.tp[i] / jnp.maximum(state.tp[i] + state.fp[i], 1e-7)


def recall_compute(state: ConfusionState) -> jax.Array:
    i = state.tp.shape[0] // 2
    return state.tp[i] / jnp.maximum(state.tp[i] + state.fn[i], 1e-7)


# ---------------------------------------------------------------------------
# precAtK (audiomodel.py:2653-2717)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PrecAtKState:
    hits: jax.Array  # weighted intersection count
    total: jax.Array  # number of true positives considered


def prec_at_k_init() -> PrecAtKState:
    return PrecAtKState(jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))


def prec_at_k_update(
    state: PrecAtKState,
    y_pred: jax.Array,
    y_true: jax.Array,
    k: int = 3,
    bird_index: int | None = None,
    weighting: jax.Array | None = None,
) -> PrecAtKState:
    """Top-k overlap between predicted and true label sets, optionally
    ignoring the generic ``bird`` output and weighting per-label hits.

    Matches audiomodel.precAtK.update_state: zero-valued entries don't count
    toward either set; the result is sum(|topk(pred) ∩ topk(true)|) /
    sum(|topk(true)|).
    """
    num_labels = y_true.shape[-1]
    if bird_index is not None:
        mask = jnp.ones((num_labels,)).at[bird_index].set(0.0)
        y_pred = y_pred * mask
        y_true = y_true * mask
    pred_v, pred_i = jax.lax.top_k(y_pred, k)
    true_v, true_i = jax.lax.top_k(y_true, k)
    pred_hot = jnp.zeros(y_pred.shape, bool)
    b = jnp.arange(y_pred.shape[0])[:, None]
    pred_hot = pred_hot.at[b, pred_i].set(pred_v > 0)
    true_hot = jnp.zeros(y_true.shape, bool)
    true_hot = true_hot.at[b, true_i].set(true_v > 0)
    inter = pred_hot & true_hot
    if weighting is not None:
        hits = (inter.astype(jnp.float32) * weighting).sum()
    else:
        hits = inter.sum().astype(jnp.float32)
    total = true_hot.sum().astype(jnp.float32)
    return PrecAtKState(state.hits + hits, state.total + total)


def prec_at_k_compute(state: PrecAtKState) -> jax.Array:
    return state.hits / jnp.maximum(state.total, 1.0)


# ---------------------------------------------------------------------------
# Bundled metric set used by the train loop
# ---------------------------------------------------------------------------


def metrics_init() -> dict:
    return {
        "confusion": confusion_init(),
        "loss_sum": jnp.zeros((), jnp.float32),
        "acc_sum": jnp.zeros((), jnp.float32),
        "focal_sum": jnp.zeros((), jnp.float32),
        "huber_sum": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }


def metrics_update(
    state: dict, loss: jax.Array, probs: jax.Array, labels: jax.Array,
    multi_label: bool = True,
) -> dict:
    from audio_training_tpu.train.losses import focal_bce_from_logits, huber

    logits = jnp.log(jnp.clip(probs, 1e-7, 1 - 1e-7)) - jnp.log1p(
        -jnp.clip(probs, 1e-7, 1 - 1e-7)
    )
    acc = (
        binary_accuracy(probs, labels)
        if multi_label
        else categorical_accuracy(probs, labels)
    )
    # per-batch means are weighted by batch size so a partial tail batch
    # (pipeline.BatchLoader emits them on eval streams) contributes
    # proportionally, not equally, to the epoch means
    w = jnp.float32(probs.shape[0])
    return {
        "confusion": confusion_update(state["confusion"], probs, labels),
        "loss_sum": state["loss_sum"] + loss * w,
        "acc_sum": state["acc_sum"] + acc * w,
        "focal_sum": state["focal_sum"]
        + focal_bce_from_logits(logits, labels) * w,
        "huber_sum": state["huber_sum"] + huber(probs, labels) * w,
        "count": state["count"] + w,
    }


def metrics_compute(state: dict) -> dict[str, float]:
    n = float(np.maximum(np.asarray(state["count"]), 1.0))
    return {
        "loss": float(np.asarray(state["loss_sum"])) / n,
        "accuracy": float(np.asarray(state["acc_sum"])) / n,
        "auc": float(np.asarray(auc_compute(state["confusion"]))),
        "precision": float(np.asarray(precision_compute(state["confusion"]))),
        "recall": float(np.asarray(recall_compute(state["confusion"]))),
        "focal": float(np.asarray(state["focal_sum"])) / n,
        "huber": float(np.asarray(state["huber_sum"])) / n,
    }
