"""Loss zoo — parity with the reference's losses (audiomodel.py:1194-1240,
2437-2650) but computed on *logits* for numerical stability (the Keras
versions consume post-sigmoid probabilities; the sigmoid is folded in here,
which is the standard TPU-friendly formulation — identical value, better
conditioning)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

EPS = 1e-7  # keras backend epsilon


def bce_from_logits(
    logits: jax.Array,
    labels: jax.Array,
    label_smoothing: float = 0.0,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    """Binary cross-entropy, mean over labels then batch
    (tf.keras.losses.BinaryCrossentropy, audiomodel.py:1206-1223)."""
    if label_smoothing:
        labels = labels * (1.0 - label_smoothing) + 0.5 * label_smoothing
    per = optax.sigmoid_binary_cross_entropy(logits, labels)
    if class_weights is not None:
        per = per * class_weights
    return per.mean(axis=-1).mean()


def cce_from_logits(
    logits: jax.Array, labels: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Categorical cross-entropy (softmax) for single-label mode."""
    if label_smoothing:
        n = labels.shape[-1]
        labels = labels * (1.0 - label_smoothing) + label_smoothing / n
    return optax.softmax_cross_entropy(logits, labels).mean()


def weighted_cross_entropy_from_logits(
    logits: jax.Array, labels: jax.Array, possible_labels: jax.Array
) -> jax.Array:
    """The "bird_cross_entropy" (audiomodel.WeightedCrossEntropy,
    audiomodel.py:2606-2650): negative-class terms are masked by
    ``possible_labels`` so a specific-species guess on a generic-bird clip
    isn't penalized; positive terms are unmasked.

    ``possible_labels`` is 1 where a negative prediction should be punished
    and 0 where the label is plausible-but-unconfirmed.
    """
    p = jax.nn.sigmoid(logits)
    p = jnp.clip(p, EPS, 1.0 - EPS)
    term_0 = (1.0 - labels) * jnp.log1p(-p + EPS) * possible_labels
    term_1 = labels * jnp.log(p + EPS)
    return -(term_0 + term_1).mean(axis=-1).mean()


def macro_soft_f1(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """1 - mean soft-F1 across labels (audiomodel.macro_soft_f1,
    audiomodel.py:2437-2460)."""
    y = labels.astype(jnp.float32)
    y_hat = jax.nn.sigmoid(logits)
    tp = (y_hat * y).sum(axis=0)
    fp = (y_hat * (1.0 - y)).sum(axis=0)
    fn = ((1.0 - y_hat) * y).sum(axis=0)
    soft_f1 = 2.0 * tp / (2.0 * tp + fn + fp + 1e-16)
    return (1.0 - soft_f1).mean()


def macro_double_soft_f1(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Both-class soft-F1 cost: mean over labels of
    0.5 * ((1 - softF1_pos) + (1 - softF1_neg))
    (audiomodel.macro_double_soft_f1, audiomodel.py:2550-2580)."""
    y = labels.astype(jnp.float32)
    y_hat = jax.nn.sigmoid(logits)
    tp = (y_hat * y).sum(axis=0)
    fp = (y_hat * (1.0 - y)).sum(axis=0)
    fn = ((1.0 - y_hat) * y).sum(axis=0)
    tn = ((1.0 - y_hat) * (1.0 - y)).sum(axis=0)
    f1_pos = 2.0 * tp / (2.0 * tp + fn + fp + 1e-16)
    f1_neg = 2.0 * tn / (2.0 * tn + fn + fp + 1e-16)
    return (0.5 * ((1.0 - f1_pos) + (1.0 - f1_neg))).mean()


def macro_f1(probs: jax.Array, labels: jax.Array,
             thresh: float = 0.5) -> jax.Array:
    """Hard macro F1 at a threshold (audiomodel.macro_f1,
    audiomodel.py:2528-2548) — an evaluation metric, not a loss."""
    y = labels.astype(jnp.float32)
    y_pred = (probs > thresh).astype(jnp.float32)
    tp = (y_pred * y).sum(axis=0)
    fp = (y_pred * (1.0 - y)).sum(axis=0)
    fn = ((1.0 - y_pred) * y).sum(axis=0)
    f1 = 2.0 * tp / (2.0 * tp + fn + fp + 1e-16)
    return f1.mean()


def focal_bce_from_logits(
    logits: jax.Array, labels: jax.Array, gamma: float = 2.0,
    alpha: float | None = None,
) -> jax.Array:
    """Binary focal cross-entropy (used as a tracked metric in the reference
    compile, audiomodel.py:866)."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, labels)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    mod = (1.0 - p_t) ** gamma
    if alpha is not None:
        a_t = labels * alpha + (1.0 - labels) * (1.0 - alpha)
        mod = mod * a_t
    return (mod * ce).mean(axis=-1).mean()


def huber(probs: jax.Array, labels: jax.Array, delta: float = 1.0) -> jax.Array:
    """Huber distance between probabilities and targets (tracked as a metric,
    audiomodel.py:869)."""
    err = probs - labels
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    lin = abs_err - quad
    return (0.5 * quad**2 + delta * lin).mean()


LOSSES = {
    "bce": bce_from_logits,
    "cce": cce_from_logits,
    "weighted_bce": weighted_cross_entropy_from_logits,
    "soft_f1": macro_soft_f1,
    "double_soft_f1": macro_double_soft_f1,
    "focal": focal_bce_from_logits,
}


def get_loss(name: str):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name}; have {sorted(LOSSES)}")
    return LOSSES[name]
