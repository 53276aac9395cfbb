"""pjit train/eval steps.

One jit-compiled function covers forward, loss, backward, Adam update, and
metric accumulation.  Under a multi-chip mesh the batch is sharded over the
``data`` axis and parameters are replicated; XLA inserts the gradient
all-reduce over ICI (SURVEY.md §2.2).  This replaces the reference's Keras
``model.fit`` inner loop (audiomodel.py:550-562).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.train.losses import get_loss
from audio_training_tpu.train.metrics import metrics_init, metrics_update
from audio_training_tpu.train.state import TrainState

# NZ bounding box [lng_min, lat_max, lng_max, lat_min] (tfdataset.py:35)
NZ_BOX = (166.509144322, -34.4506617165, 178.517093541, -46.641235447)


class GeoMasks(NamedTuple):
    """Static per-label mask vectors for the geo-aware weighted_bce
    (tfdataset.py:229-248): which outputs count as specific birds, which is
    the generic ``bird`` output, and the two negative-term weightings used
    for generic-bird-only clips inside/outside the NZ bounding box."""

    specific: np.ndarray  # 1 where label is a specific (non-generic) bird
    generic: np.ndarray  # 1 at "bird"
    nz_weighting: np.ndarray  # NZ_BIRD_LOSS_WEIGHTING: 1 at bird (+rifleman)
    bird_weighting: np.ndarray  # BIRD_WEIGHTING: 1 at bird only


def build_geo_masks(labels: list[str], all_birds) -> GeoMasks | None:
    """Build the four mask vectors exactly as get_a_dataset does
    (tfdataset.py:229-248).  Returns None when there is no generic ``bird``
    output (the geo weighting is then undefined)."""
    if "bird" not in labels:
        return None
    n = len(labels)
    specific = np.zeros(n, np.float32)
    generic = np.zeros(n, np.float32)
    nz_w = np.zeros(n, np.float32)
    bird_w = np.zeros(n, np.float32)
    bi = labels.index("bird")
    generic[bi] = 1.0
    bird_w[bi] = 1.0
    nz_w[bi] = 1.0
    if "rifleman" in labels:  # tfdataset.py:236-237
        nz_w[labels.index("rifleman")] = 1.0
    for i, l in enumerate(labels):
        if l in all_birds and l != "bird":
            specific[i] = 1.0
    return GeoMasks(specific, generic, nz_w, bird_w)


def possible_from_geo(y: jax.Array, latlng: jax.Array, geo: GeoMasks) -> jax.Array:
    """Per-sample negative-term mask from targets + recording GPS
    (read_tfrecord, tfdataset.py:1188-1212).

    Clips whose only bird tag is the generic ``bird`` output get their
    negative loss restricted: inside the NZ box (or with unknown GPS) to
    ``NZ_BIRD_LOSS_WEIGHTING``, outside it to ``BIRD_WEIGHTING`` — i.e. a
    specific-species guess on an unidentified-bird clip is never penalized,
    and outside NZ even the rifleman negative is dropped.
    """
    specific = jnp.asarray(geo.specific, y.dtype)
    generic = jnp.asarray(geo.generic, y.dtype)
    nz_w = jnp.asarray(geo.nz_weighting, y.dtype)
    bird_w = jnp.asarray(geo.bird_weighting, y.dtype)
    has_specific = (y * specific).sum(axis=-1, keepdims=True) > 0
    has_generic = (y * generic).sum(axis=-1, keepdims=True) > 0
    generic_only = has_generic & ~has_specific  # (B, 1)
    lat = latlng[..., 0:1]
    lng = latlng[..., 1:2]
    unknown = (lat == 0) | (lng == 0)  # tfdataset.py:1201-1203
    in_nz = (
        (lat <= NZ_BOX[1]) & (lat >= NZ_BOX[3])
        & (lng >= NZ_BOX[0]) & (lng <= NZ_BOX[2])
    )
    geo_possible = jnp.where(unknown | in_nz, nz_w, bird_w)  # (B, L)
    return jnp.where(generic_only, geo_possible, jnp.ones_like(y))


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
    geo_masks: GeoMasks | None = None,
) -> Callable:
    """Returns step(state, mel, y, dropout_key[, possible][, latlng]) ->
    (state, metrics_state').  ``remat`` wraps the forward in
    ``jax.checkpoint`` (rematerialize activations in the backward pass,
    trading FLOPs for HBM — lets batch sizes grow past activation memory).

    With ``geo_masks`` set and a per-sample ``latlng`` batch given, the
    weighted_bce negative mask follows the reference's NZ-bounding-box rule
    (possible_from_geo); otherwise it falls back to the target-only
    approximation (possible_labels_from_targets).
    """
    loss_fn = get_loss(loss_name)

    def step(state: TrainState, metrics, mel, y, dropout_key, possible=None,
             latlng=None):
        def forward(params, mel):
            # multi-input models (merge / cnn-features) receive a tuple
            inputs = mel if isinstance(mel, tuple) else (mel,)
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                *inputs,
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
                if p is None and latlng is not None and geo_masks is not None:
                    p = possible_from_geo(y, latlng, geo_masks)
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
    geo_masks: GeoMasks | None = None,
) -> Callable:
    loss_fn = get_loss(loss_name)

    def step(state: TrainState, metrics, mel, y, possible=None, latlng=None):
        inputs = mel if isinstance(mel, tuple) else (mel,)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs,
            train=False,
        )
        if loss_name == "weighted_bce":
            if possible is None and latlng is not None and geo_masks is not None:
                possible = possible_from_geo(y, latlng, geo_masks)
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


def reestimate_batch_stats(
    module, params, batch_stats, batches, momentum: float = 0.99,
    dropout_seed: int = 0,
) -> dict:
    """EXACT one-pass BatchNorm running-stat re-estimation.

    Keras/Flax BN accumulates running stats as a momentum-0.99 EMA —
    ~500 optimizer steps to converge, so short runs (few epochs x few
    steps) evaluate through badly-stale statistics while train-mode
    metrics look fine.  This recomputes the statistics in ONE pass over
    ``batches``: flax's train-mode update is ``new = m*old + (1-m)*batch``,
    so each batch's exact moments are recovered algebraically as
    ``(new - m*old) / (1-m)`` and AVERAGED across batches (the standard
    BN re-estimation used before deploying early-stopped models; the
    per-batch-var average is the usual slightly-conservative estimator).

    Forward passes run in train mode (each BN normalizes by ITS OWN batch
    moments, exactly the distribution under which training accumulated
    stats downstream of earlier layers).  The reference has no equivalent
    (it relies on long schedules to converge the EMA); this is a
    beyond-parity robustness feature, opt-in via
    ``TrainConfig.bn_reestimate``.

    ``batches`` yields model input(s) — a mel image array or the tuple
    models' input tuple.  Returns the new batch_stats pytree.
    """

    @jax.jit
    def one_update(bs, inputs):
        _, mut = module.apply(
            {"params": params, "batch_stats": bs},
            *(inputs if isinstance(inputs, tuple) else (inputs,)),
            train=True,
            rngs={"dropout": jax.random.PRNGKey(dropout_seed)},
            mutable=["batch_stats"],
        )
        return mut["batch_stats"]

    sums = None
    n = 0
    for inputs in batches:
        new_bs = one_update(batch_stats, inputs)
        batch_vals = jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            new_bs, batch_stats,
        )
        sums = batch_vals if sums is None else jax.tree_util.tree_map(
            jnp.add, sums, batch_vals
        )
        n += 1
    if not n:
        return batch_stats
    return jax.tree_util.tree_map(lambda s: s / n, sums)


def make_predict_fn(multi_label: bool = True) -> Callable:
    """jit (state, mel) -> probabilities."""

    @jax.jit
    def predict(state: TrainState, mel):
        inputs = mel if isinstance(mel, tuple) else (mel,)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs,
            train=False,
        )
        return jax.nn.sigmoid(logits) if multi_label else jax.nn.softmax(logits)

    return predict


def fresh_metrics():
    return metrics_init()
