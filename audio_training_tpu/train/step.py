"""pjit train/eval steps.

One jit-compiled function covers forward, loss, backward, Adam update, and
metric accumulation.  Under a multi-chip mesh the batch is sharded over the
``data`` axis and parameters are replicated; XLA inserts the gradient
all-reduce over ICI (SURVEY.md §2.2).  This replaces the reference's Keras
``model.fit`` inner loop (audiomodel.py:550-562).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from audio_training_tpu.train.losses import get_loss
from audio_training_tpu.train.metrics import metrics_init, metrics_update
from audio_training_tpu.train.state import TrainState


def possible_labels_from_targets(
    y: jax.Array, bird_index: int | None, specific_bird_mask
) -> jax.Array:
    """Derive the weighted_bce negative-mask from the targets.

    Parity with the reference's intent (WeightedCrossEntropy,
    audiomodel.py:2637-2643): on a clip whose only bird tag is the generic
    ``bird`` output, a specific-species positive prediction should not be
    penalized — its negative term is masked out.
    """
    if bird_index is None or specific_bird_mask is None:
        return jnp.ones_like(y)
    specific = jnp.asarray(specific_bird_mask, y.dtype)  # (L,) 1=specific bird
    has_specific = (y * specific).sum(axis=-1, keepdims=True) > 0
    is_bird_clip = y[..., bird_index : bird_index + 1] > 0
    generic_only = is_bird_clip & ~has_specific  # (B, 1)
    # mask (zero) the negative terms of specific-bird outputs on such clips
    return 1.0 - generic_only.astype(y.dtype) * specific


def make_train_step(
    loss_name: str = "bce",
    multi_label: bool = True,
    label_smoothing: float = 0.0,
    class_weights=None,
    donate: bool = True,
    remat: bool = False,
    bird_index: int | None = None,
    specific_bird_mask=None,
) -> Callable:
    """Returns step(state, mel, y, dropout_key[, possible]) ->
    (state, metrics_state').  ``remat`` wraps the forward in
    ``jax.checkpoint`` (rematerialize activations in the backward pass,
    trading FLOPs for HBM — lets batch sizes grow past activation memory)."""
    loss_fn = get_loss(loss_name)

    def step(state: TrainState, metrics, mel, y, dropout_key, possible=None):
        def forward(params, mel):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                mel,
                train=True,
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward)

        def compute_loss(params):
            out, mutated = forward(params, mel)
            logits = out
            if loss_name == "weighted_bce":
                p = possible
                if p is None:
                    p = possible_labels_from_targets(
                        y, bird_index, specific_bird_mask
                    )
                loss = loss_fn(logits, y, p)
            elif loss_name == "cce":
                loss = loss_fn(logits, y, label_smoothing)
            elif loss_name == "bce":
                loss = loss_fn(logits, y, label_smoothing, class_weights)
            else:
                loss = loss_fn(logits, y)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=new_bs)
        probs = jax.nn.sigmoid(logits) if multi_label else jax.nn.softmax(logits)
        metrics = metrics_update(metrics, loss, probs, y, multi_label)
        return state, metrics

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


def make_eval_step(
    loss_name: str = "bce",
    multi_label: bool = True,
    label_smoothing: float = 0.0,
    bird_index: int | None = None,
    specific_bird_mask=None,
) -> Callable:
    loss_fn = get_loss(loss_name)

    def step(state: TrainState, metrics, mel, y, possible=None):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            mel,
            train=False,
        )
        if loss_name == "weighted_bce":
            if possible is None:
                possible = possible_labels_from_targets(
                    y, bird_index, specific_bird_mask
                )
            loss = loss_fn(logits, y, possible)
        elif loss_name in ("bce", "cce"):
            loss = loss_fn(logits, y, label_smoothing)
        else:
            loss = loss_fn(logits, y)
        probs = jax.nn.sigmoid(logits) if multi_label else jax.nn.softmax(logits)
        metrics = metrics_update(metrics, loss, probs, y, multi_label)
        return metrics

    return jax.jit(step, donate_argnums=(1,))


def make_predict_fn(multi_label: bool = True) -> Callable:
    """jit (state, mel) -> probabilities."""

    @jax.jit
    def predict(state: TrainState, mel):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            mel,
            train=False,
        )
        return jax.nn.sigmoid(logits) if multi_label else jax.nn.softmax(logits)

    return predict


def fresh_metrics():
    return metrics_init()
