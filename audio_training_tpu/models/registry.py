"""Model registry — the ``build_model`` dispatch (audiomodel.py:660-876).

Supported names match the reference CLI: ``badwinner2``, ``badwinner2-res``,
``badwinner``, ``dual-badwinner2``, ``merge``, ``cnn-features``,
``rf-features``, ``embeddings``, ``wr-resnet``, ``wr-resnet-bird``, plus every
backbone in :data:`audio_training_tpu.models.backbones.BACKBONES` (wrapped
with a PCEN frontend + GAP + dropout + Dense head, audiomodel.py:784-820).

``rf-features`` is not a neural model: the reference trains a ydf random
forest (audiomodel.py:766-769); here :func:`build_random_forest` returns an
sklearn RandomForestClassifier adapter (ydf is not bundled).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio_training_tpu.models.backbones import BACKBONES
from audio_training_tpu.models.badwinner import BadWinner
from audio_training_tpu.models.badwinner2 import BadWinner2, BadWinner2Res
from audio_training_tpu.models.layers import (
    LMELayer,
    MagTransform,
    PCENLayer,
    global_avg_pool,
)
from audio_training_tpu.models.wr_resnet import WRResNet
from audio_training_tpu.models.wr_resnet_bird import WRResNetBird

# Short/mid audio-feature tensor contract lives in data/schema.py
from audio_training_tpu.data.schema import (  # noqa: F401
    MID_FEATURES_SHAPE,
    SHORT_FEATURES_SHAPE,
)


class FeatureCNN(nn.Module):
    """Dense tower over short/mid audio features (audiomodel.feature_cnn,
    audiomodel.py:2770-2787): two Dense-128+relu, dropout .1, GAP over the
    first feature axis, Dense(num_labels) sigmoid — per branch.

    Module creation alternates the two towers per depth, matching the
    keras functional graph's topological layer order so the positional
    weight transplant pairs with the reference (short-d1, mid-d1,
    short-d2, mid-d2, short-out, mid-out)."""

    num_labels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, short_f, mid_f, train: bool = False):
        s, m = short_f, mid_f
        for _ in range(2):
            s = nn.relu(nn.Dense(128, dtype=self.dtype)(s))
            m = nn.relu(nn.Dense(128, dtype=self.dtype)(m))
        drop = nn.Dropout(0.1, deterministic=not train)
        s, m = drop(s), drop(m)
        s = jnp.mean(s, axis=1)  # GlobalAveragePooling1D
        m = jnp.mean(m, axis=1)
        s = nn.sigmoid(nn.Dense(self.num_labels)(s))
        m = nn.sigmoid(nn.Dense(self.num_labels)(m))
        return s, m


class CNNFeaturesModel(nn.Module):
    """``cnn-features``: feature towers -> concat -> Dense -> activation
    (audiomodel.py:751-765)."""

    num_labels: int
    multi_label: bool = True
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, short_f, mid_f, train: bool = False):
        s, m = FeatureCNN(self.num_labels, dtype=self.dtype)(short_f, mid_f, train)
        out = jnp.concatenate([s, m], axis=-1)
        out = nn.Dense(self.num_labels)(out)
        if self.logits_only:
            return out
        return nn.sigmoid(out) if self.multi_label else nn.softmax(out)


class MergeModel(nn.Module):
    """``merge``: badwinner2 output ++ feature towers -> Dense -> activation
    (audiomodel.py:674-708)."""

    num_labels: int
    multi_label: bool = True
    lme: bool = False
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, mel, short_f, mid_f, train: bool = False):
        bw = BadWinner2(
            self.num_labels, multi_label=self.multi_label, lme=self.lme,
            dtype=self.dtype,
        )(mel, train)
        s, m = FeatureCNN(self.num_labels, dtype=self.dtype)(short_f, mid_f, train)
        out = jnp.concatenate([bw, s, m], axis=-1)
        out = nn.Dense(self.num_labels)(out)
        if self.logits_only:
            return out
        return nn.sigmoid(out) if self.multi_label else nn.softmax(out)


class DualBadWinner2(nn.Module):
    """``dual-badwinner2``: two badwinner2 trunks on two mel views, concat,
    Dense, activation (audiomodel.py:709-740)."""

    num_labels: int
    multi_label: bool = True
    lme: bool = False
    logits_only: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, mel_a, mel_b, train: bool = False):
        a = BadWinner2(self.num_labels, multi_label=self.multi_label,
                       lme=self.lme, dtype=self.dtype)(mel_a, train)
        b = BadWinner2(self.num_labels, multi_label=self.multi_label,
                       lme=self.lme, dtype=self.dtype)(mel_b, train)
        out = jnp.concatenate([a, b], axis=-1)
        out = nn.Dense(self.num_labels)(out)
        if self.logits_only:
            return out
        return nn.sigmoid(out) if self.multi_label else nn.softmax(out)


class LinearEmbeddings(nn.Module):
    """``embeddings``: linear probe over (Perch-style) embedding vectors
    (audiomodel.get_linear_model, audiomodel.py:2595-2603)."""

    num_labels: int
    logits_only: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = nn.Dense(self.num_labels)(x)
        return x if self.logits_only else nn.sigmoid(x)


class BackboneClassifier(nn.Module):
    """Pretrained-backbone adapter: PCEN (or MagTransform) frontend ->
    backbone -> optional LME -> GAP -> Dropout .5 -> Dense -> activation
    (audiomodel.py:784-820)."""

    backbone_name: str
    num_labels: int
    multi_label: bool = True
    lme: bool = False
    use_pcen: bool = True
    dropout: float = 0.5
    logits_only: bool = False
    # static constructor kwargs for the backbone as a tuple of (name, value)
    # pairs (hashable for flax) — e.g. EfficientNet normalization constants
    # set by the pretrained-weight import (models/transplant.py)
    backbone_args: tuple = ()
    # input is already PCEN'd (e.g. by the fused waveform->mel->PCEN Pallas
    # featurizer, ops/pallas/fused_featurizer.py) — skip the in-model
    # frontend; at inference the math is identical to use_pcen=True
    external_frontend: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.external_frontend:
            pass
        elif self.use_pcen:
            # PCEN over mel images: time axis is 2 in (B, mel, T, C)
            x = PCENLayer(time_axis=2)(x)
        else:
            x = MagTransform()(x)
        backbone = BACKBONES[self.backbone_name](
            dtype=self.dtype, **dict(self.backbone_args)
        )
        x = backbone(x, train)
        if self.lme:
            x = LMELayer(axis=1, sharpness=5)(x)
            x = LMELayer(axis=2, sharpness=5)(x)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_labels)(x)
        if self.logits_only:
            return x
        return nn.sigmoid(x) if self.multi_label else nn.softmax(x)


@dataclass(frozen=True)
class ModelSpec:
    """What inputs a model takes; used by the train/infer harness."""

    module: nn.Module
    inputs: tuple[str, ...]  # e.g. ("mel",) or ("short_f", "mid_f")


def build_model(
    model_name: str,
    num_labels: int,
    multi_label: bool = True,
    lme: bool = False,
    logits_only: bool = False,
    dtype: Any = None,
    **kwargs,
) -> ModelSpec:
    """Build a model by reference CLI name (audiomodel.py:660-876)."""
    name = model_name.lower()
    common = dict(multi_label=multi_label, logits_only=logits_only, dtype=dtype)
    if name == "badwinner2":
        return ModelSpec(
            BadWinner2(num_labels, lme=lme, **common, **kwargs), ("mel",)
        )
    if name == "badwinner2-res":
        return ModelSpec(BadWinner2Res(num_labels, **common, **kwargs), ("mel",))
    if name == "badwinner":
        return ModelSpec(BadWinner(num_labels, **common, **kwargs), ("mel",))
    if name == "dual-badwinner2":
        return ModelSpec(
            DualBadWinner2(num_labels, lme=lme, **common, **kwargs),
            ("mel", "mel2"),
        )
    if name == "merge":
        return ModelSpec(
            MergeModel(num_labels, lme=lme, **common, **kwargs),
            ("mel", "short_f", "mid_f"),
        )
    if name == "cnn-features":
        return ModelSpec(
            CNNFeaturesModel(num_labels, **common, **kwargs),
            ("short_f", "mid_f"),
        )
    if name == "embeddings":
        return ModelSpec(
            LinearEmbeddings(num_labels, logits_only=logits_only),
            ("embedding",),
        )
    if name == "wr-resnet":
        return ModelSpec(
            WRResNet(num_labels, logits_only=logits_only, dtype=dtype, **kwargs),
            ("mel",),
        )
    if name == "wr-resnet-bird":
        return ModelSpec(
            WRResNetBird(num_labels, logits_only=logits_only, dtype=dtype,
                         **kwargs),
            ("mel",),
        )
    if name in BACKBONES:
        return ModelSpec(
            BackboneClassifier(
                backbone_name=name, num_labels=num_labels, lme=lme,
                **common, **kwargs,
            ),
            ("mel",),
        )
    if name == "rf-features":
        raise ValueError(
            "rf-features is a random-forest model; use "
            "audio_training_tpu.models.registry.build_random_forest"
        )
    raise ValueError(f"Unknown model name: {model_name}")


def fold_gray_stem(spec: ModelSpec, variables):
    """Exact-math serving optimization: collapse a BackboneClassifier's RGB
    stem so it consumes the 1-channel mel image directly, skipping the
    reference's 3-channel repeat (tfdataset.raw_to_mel's
    ``tf.repeat(mel, 3, -1)``, tfdataset.py:175-180).

    For channel-identical input, ``conv(repeat(x, 3), W) ==
    conv(x, W.sum(axis=2))`` exactly; everything upstream of the stem conv
    must treat the channels uniformly, so this refuses backbones configured
    with per-channel normalization constants (ImageNet weight imports set
    ``backbone_args``; EfficientNetV2 B-variants bake ImageNet constants
    whenever ``preprocess=True`` sees 3-channel input).

    Returns folded ``variables``; apply the SAME module to input with a
    size-1 channel axis.  On TPU this removes the 3x mel-image
    materialization + the stem conv reading 3x the bytes.
    """
    module = spec.module
    if not isinstance(module, BackboneClassifier):
        raise ValueError("fold_gray_stem only applies to BackboneClassifier")
    args = dict(module.backbone_args)
    for key in ("norm_mean", "norm_var", "extra_rescale"):
        vals = args.get(key, ())
        if len(vals):
            # even channel-UNIFORM constants break the fold: the backbone
            # applies (x - mean) with a length-3 vector, broadcasting the
            # 1-channel input back to 3 channels before the folded stem
            raise ValueError(
                f"backbone applies per-channel {key}={vals}; the gray fold "
                "requires identity preprocessing (empty norm constants)"
            )
    if module.backbone_name.startswith("efficientnetv2") and args.get(
            "preprocess", True):
        raise ValueError(
            "EfficientNetV2 B-variants bake per-channel ImageNet "
            "normalization constants on 3-channel input "
            "(models/backbones.EfficientNetV2.preprocess); build with "
            "backbone_args=(('preprocess', False),) to fold"
        )

    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    matches = [
        path for path, leaf in flat
        if getattr(leaf, "ndim", 0) == 4 and leaf.shape[2] == 3
        and "kernel" in str(path[-1])
    ]
    if len(matches) != 1:
        raise ValueError(
            f"expected exactly one 3-input-channel conv kernel (the stem), "
            f"found {len(matches)}"
        )
    stem_path = matches[0]

    def fold(path, leaf):
        if path == stem_path:
            return leaf.sum(axis=2, keepdims=True)
        return leaf

    return jax.tree_util.tree_map_with_path(fold, variables)


class YDFRandomForest:
    """sklearn-compatible facade over ydf's RandomForestLearner — the
    learner the reference actually builds for ``rf-features``
    (audiomodel.py:766-769; dataset flattening per tf_to_ydf,
    audiomodel.py:2790-2803).

    ydf trains single-label classification, so multi-hot targets are
    argmax-reduced for both fit and score.  Pickle support serializes via
    ``model.serialize()`` (ydf models are not directly picklable)."""

    def __init__(self, n_estimators: int = 300, random_state: int = 0):
        import ydf  # noqa: F401 — fail fast if unavailable

        self.n_estimators = n_estimators
        self.random_state = random_state
        self.model = None

    @staticmethod
    def _frame(x, y=None):
        x = np.asarray(x)
        data = {f"f{i:04d}": np.ascontiguousarray(x[:, i])
                for i in range(x.shape[1])}
        if y is not None:
            data["label"] = np.asarray(y)
        return data

    @staticmethod
    def _classes(y):
        y = np.asarray(y)
        return y.argmax(axis=1) if y.ndim == 2 else y

    def fit(self, x, y):
        import ydf

        y_cls = self._classes(y).astype(str)
        learner = ydf.RandomForestLearner(
            label="label", num_trees=self.n_estimators,
            random_seed=self.random_state,
        )
        self.model = learner.train(self._frame(x, y_cls))
        return self

    def predict(self, x):
        preds = self.model.predict(self._frame(x))
        preds = np.asarray(preds)
        if preds.ndim == 2:  # per-class probabilities
            classes = [int(c) for c in self.model.label_classes()]
            return np.asarray(classes)[preds.argmax(axis=1)]
        classes = self.model.label_classes()
        return np.asarray([int(classes[1]) if p >= 0.5 else int(classes[0])
                           for p in preds])

    def score(self, x, y) -> float:
        return float((self.predict(x) == self._classes(y)).mean())

    def __getstate__(self):
        state = dict(self.__dict__)
        if self.model is not None:
            state["model"] = ("ydf-serialized", self.model.serialize())
        return state

    def __setstate__(self, state):
        model = state.pop("model", None)
        self.__dict__.update(state)
        if isinstance(model, tuple) and model[0] == "ydf-serialized":
            import ydf

            model = ydf.deserialize_model(model[1])
        self.model = model


def rf_backends() -> list[str]:
    """Random-forest backends available in this environment."""
    backends = []
    try:
        import ydf  # noqa: F401

        backends.append("ydf")
    except ImportError:
        pass
    backends.append("sklearn")
    return backends


def build_random_forest(backend: str | None = None, **kwargs):
    """Random forest for ``rf-features``: the reference builds a ydf
    RandomForestLearner (audiomodel.py:766-769) — used here when ydf is
    importable; sklearn's RandomForestClassifier is the fallback (ydf is
    not bundled in every image).  ``backend`` forces one explicitly."""
    if backend is None:
        backend = rf_backends()[0]
    if backend == "ydf":
        return YDFRandomForest(
            n_estimators=kwargs.pop("n_estimators", 300),
            random_state=kwargs.pop("random_state", 0),
        )
    if backend != "sklearn":
        raise ValueError(f"unknown rf backend {backend!r}")
    from sklearn.ensemble import RandomForestClassifier

    kwargs.setdefault("n_estimators", 300)
    return RandomForestClassifier(**kwargs)


MODEL_NAMES = (
    ["badwinner", "badwinner2", "badwinner2-res", "dual-badwinner2", "merge",
     "cnn-features", "rf-features", "embeddings", "wr-resnet",
     "wr-resnet-bird"]
    + sorted(BACKBONES.keys())
)
