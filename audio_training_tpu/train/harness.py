"""End-to-end training orchestration (audiomodel.AudioModel.train_model,
audiomodel.py:405-567): label init from training-meta (+ second/extra/human
dataset dirs), count-based label admission, dataset streams, model build,
class weights, fit with the callback suite, test-set confusion, metadata.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.config import FeaturizerConfig, TrainConfig
from audio_training_tpu.data import (
    build_training_stream,
    get_weighting,
    load_meta,
    make_preprocess_fn,
    weights_to_array,
)
from audio_training_tpu.eval.confusion import (
    multi_label_confusion,
    save_confusion,
    save_raw_predictions,
    single_label_confusion,
)
from audio_training_tpu.models import build_model
from audio_training_tpu.parallel import make_mesh, replicated
from audio_training_tpu.taxonomy.ebird import get_ebird_id
from audio_training_tpu.taxonomy.labels import (
    LabelSpace,
    admit_labels_by_count,
    build_label_space,
    get_excluded_labels,
)
from audio_training_tpu.taxonomy.ontology import Ontology, load_ontology
from audio_training_tpu.train.loop import fit
from audio_training_tpu.train.metadata import save_metadata
from audio_training_tpu.train.state import create_train_state, param_count
from audio_training_tpu.train.step import make_predict_fn

log = logging.getLogger(__name__)


def init_labels(
    data_dirs: list[Path],
    ontology: Ontology | None = None,
    use_generic_bird: bool = True,
    only_features: bool = False,
    morepork_model: bool = False,
) -> tuple[LabelSpace, Ontology, dict]:
    """Resolve the run's label space (audiomodel.init_labels,
    audiomodel.py:1647-1776): union of dataset labels -> eBird ids ->
    count-based admission -> exclusions (+merge-mode overrides)."""
    ontology = ontology or load_ontology()
    labels: set[str] = set()
    meta = None
    for d in data_dirs:
        m = load_meta(d)
        labels.update(m.get("labels", []))
        ontology, _ = admit_labels_by_count(ontology, m)
        if meta is None:
            meta = m

    labels = sorted({get_ebird_id(l) for l in labels})
    if use_generic_bird and "bird" not in labels:
        labels.append("bird")
    labels.sort()

    if only_features:
        # merge everything into bird/animal/noise (audiomodel.py:1708-1732)
        merge = {}
        if "animal" not in labels:
            labels.append("animal")
        for l in labels:
            if l == "bird":
                continue
            if l in ontology.all_birds:
                merge[l] = "bird"
            elif l in ontology.animal_labels:
                merge[l] = "animal"
            elif l == "insect" or l in ontology.noise_labels:
                merge[l] = "noise"
        ontology = ontology.with_relabel_map(merge)
        excluded = ["false-positive"]
    elif morepork_model:
        # everything except morepork folds to bird/noise/human
        # (audiomodel.py:1733-1767)
        merge = {}
        for l in labels:
            if l in ("morepo2", "bird"):
                continue
            if l in ontology.all_birds:
                merge[l] = "bird"
            elif l in ontology.animal_labels or l == "insect" or (
                l in ontology.insect_labels
            ):
                merge[l] = "noise"
            elif l in ontology.noise_labels:
                merge[l] = "noise"
            elif l in ontology.human_labels:
                merge[l] = "human"
        ontology = ontology.with_relabel_map(merge)
        excluded = ["false-positive"]
    else:
        excluded = get_excluded_labels(ontology, list(labels))
        if use_generic_bird and "bird" in excluded:
            excluded.remove("bird")
        if not use_generic_bird:
            excluded.append("bird")
        # default path also drops standalone human/noise outputs
        # (audiomodel.py:1768-1773)
        for extra in ("human", "noise"):
            if extra not in excluded:
                excluded.append(extra)

    space = build_label_space(
        ontology, sorted(labels), excluded_labels=excluded,
        use_generic_bird=use_generic_bird,
    )
    return space, ontology, meta or {}


def _maybe_restore(state, weights, weight_labels, labels):
    """Resume / fine-tune restore (audiomodel.py:835-857): when the label
    sets differ the fresh head is kept (shape-mismatch merge)."""
    if weights is None:
        return state
    from audio_training_tpu.train.checkpoints import (
        restore_into,
        restore_with_new_head,
    )

    if weight_labels is None:
        # infer the source label set from metadata.txt beside the ckpt
        src_meta = Path(weights).parent / "metadata.txt"
        if src_meta.exists():
            try:
                weight_labels = json.loads(src_meta.read_text()).get(
                    "ebird_labels"
                )
            except Exception:
                pass
    if weight_labels is not None and list(weight_labels) != labels:
        log.info("Fine-tuning from %s with a new head", weights)
        return restore_with_new_head(state, weights)
    log.info("Resuming from %s", weights)
    return restore_into(state, weights)


def _train_vector_run(run_dir, data_dirs, split_shards, space, ontology,
                      labels, train_cfg, cfg, spec, epochs, steps_per_epoch,
                      data_meta, weights=None,
                      weight_labels=None) -> "TrainRunResult":
    """Training for vector-input model families: the ``embeddings`` linear
    probe over stored Perch vectors (tfdatasetembeddings.py pipeline) and
    ``cnn-features``/``merge``-style hand-crafted feature towers
    (tfdataset.py:1041-1111 feature parsing).  Streams come straight from
    the records; no mel featurization."""
    import itertools

    from audio_training_tpu.data.embeddings import (
        EMBEDDING_DIM,
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
        EmbeddingStream,
        FeatureStream,
    )
    from audio_training_tpu.data.pipeline import find_shards

    kind = spec.inputs

    def shards_for(split):
        if split_shards is not None:
            return list(split_shards.get(split) or [])
        out = []
        for d in data_dirs:
            out.extend(find_shards(d, split))
        return out

    def make_stream(split, loop):
        sh = shards_for(split)
        if not sh:
            return None
        if kind == ("embedding",):
            # tfdatasetembeddings.py has no decode-time sample filters
            return EmbeddingStream(sh, space, loop=loop,
                                   seed=train_cfg.seed)
        return FeatureStream(
            sh, space, loop=loop, seed=train_cfg.seed,
            exclude_low_samples=train_cfg.no_low_samples,
            drop_bird_only=train_cfg.multi_label
            and not train_cfg.use_bird_tags,
        )

    def batches(stream):
        it = iter(stream)
        while True:
            items = list(itertools.islice(it, train_cfg.batch_size))
            if len(items) < train_cfg.batch_size:
                return
            y = jnp.asarray(np.stack([i[-1] for i in items]))
            if kind == ("embedding",):
                yield jnp.asarray(np.stack([i[0] for i in items])), y
            else:
                s_f = jnp.asarray(np.stack([i[0] for i in items]))
                m_f = jnp.asarray(np.stack([i[1] for i in items]))
                yield (s_f, m_f), y

    train_stream = make_stream("train", loop=True)
    if train_stream is None:
        raise ValueError("no train shards found")
    if steps_per_epoch is None:
        # prefer the builder's metadata counts (the mel path does the same)
        # over an extra full decode pass
        counts = data_meta.get("counts", {}).get("train", {}).get(
            "sample_counts", {}
        )
        n = int(sum(counts.values()))
        if not n:
            n = sum(1 for _ in make_stream("train", loop=False))
        if n == 0:
            raise ValueError(
                "no usable vector records in the train split — rebuild with "
                "--embedding-model / --add-features"
            )
        steps_per_epoch = max(n // train_cfg.batch_size, 1)
    train_iter = iter(batches(train_stream))

    def train_batches(epoch):
        for _ in range(steps_per_epoch):
            try:
                yield next(train_iter)
            except StopIteration:
                return

    def val_batches():
        stream = make_stream("validation", loop=False)
        if stream is None:
            return
        yield from batches(stream)

    identity = lambda x, y: (x, y)  # noqa: E731
    if kind == ("embedding",):
        example = (jnp.zeros((1, EMBEDDING_DIM), jnp.float32),)
    else:
        example = (
            jnp.zeros((1, *SHORT_FEATURES_SHAPE), jnp.float32),
            jnp.zeros((1, *MID_FEATURES_SHAPE), jnp.float32),
        )
    state = create_train_state(
        spec.module, example, learning_rate=train_cfg.learning_rate,
        seed=train_cfg.seed,
    )
    state = _maybe_restore(state, weights, weight_labels, labels)
    log.info("Model %s (vector inputs %s) has %s params",
             train_cfg.model_name, kind, param_count(state))
    save_metadata(
        run_dir, train_cfg.model_name, labels, cfg, ontology,
        loss_fn=train_cfg.loss, multi_label=train_cfg.multi_label,
        use_generic_bird=train_cfg.use_generic_bird,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
    )
    result = fit(
        state, train_batches, identity,
        epochs=epochs or train_cfg.epochs,
        steps_per_epoch=steps_per_epoch,
        val_batches=val_batches, val_preprocess=identity,
        loss_name=train_cfg.loss, multi_label=train_cfg.multi_label,
        run_dir=run_dir,
        early_stop_patience=train_cfg.early_stop_patience,
        reduce_lr_patience=train_cfg.reduce_lr_patience,
        reduce_lr_factor=train_cfg.reduce_lr_factor,
        seed=train_cfg.seed, augment=False,
    )
    return TrainRunResult(run_dir=run_dir, labels=labels,
                          history=result.history)


def _train_merge_run(run_dir, data_dirs, split_shards, space, ontology,
                     labels, train_cfg, cfg, spec, epochs, steps_per_epoch,
                     data_meta, weights=None, weight_labels=None,
                     confusion=True) -> "TrainRunResult":
    """Joint end-to-end training of the ``merge`` model (audiomodel.py:674-708:
    badwinner2 mel tower + short_f (68,60) + mid_f (136,3) feature towers,
    concat -> Dense, trained as ONE model by model.fit).

    Streams ``(raw, y, short_f, mid_f)`` straight from the feature-bearing
    records (tfdataset.py:1103-1119); the device preprocess mixes all three
    input tensors with one shared lambda and featurizes the waveform
    (data.preprocess.make_merge_preprocess_fn)."""
    import itertools

    from audio_training_tpu.data.pipeline import RecordStream, find_shards
    from audio_training_tpu.data.preprocess import make_merge_preprocess_fn

    if train_cfg.num_data_shards > 1:
        raise ValueError(
            "merge training does not implement mesh data-parallelism yet; "
            "run with num_data_shards=1 (--data-shards 1)"
        )
    from audio_training_tpu.data.schema import (
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
    )

    def shards_for(split):
        if split_shards is not None:
            return list(split_shards.get(split) or [])
        out = []
        for d in data_dirs:
            out.extend(find_shards(d, split))
        return out

    def make_stream(split, loop, seed_offset=0):
        sh = shards_for(split)
        if not sh:
            return None
        return RecordStream(
            sh, space, cfg.samples_per_clip, loop=loop,
            seed=train_cfg.seed + seed_offset, with_features=True,
            cache=split != "train",
            exclude_low_samples=train_cfg.no_low_samples,
            drop_bird_only=train_cfg.multi_label
            and not train_cfg.use_bird_tags,
            filter_freq=train_cfg.filter_freq,
            random_butter=train_cfg.random_butter,
        )

    def batches(stream, mix_stream=None):
        """Yield ((raw, short, mid), y[, (raw2, short2, mid2), y2]).

        Eval streams (no mixup partner) emit the final PARTIAL batch —
        Keras evaluates it (same rule as pipeline.BatchLoader); the mixup
        zip keeps fixed shapes and drops remainders."""
        it = iter(stream)
        mix_it = iter(mix_stream) if mix_stream is not None else None

        def take(source, allow_partial):
            items = list(itertools.islice(source, train_cfg.batch_size))
            if not items or (
                len(items) < train_cfg.batch_size and not allow_partial
            ):
                return None
            raw = jnp.asarray(np.stack([i[0] for i in items]))
            y = jnp.asarray(np.stack([i[1] for i in items]))
            s_f = jnp.asarray(np.stack([i[2] for i in items]))
            m_f = jnp.asarray(np.stack([i[3] for i in items]))
            return (raw, s_f, m_f), y

        while True:
            main = take(it, allow_partial=mix_it is None)
            if main is None:
                return
            if mix_it is None:
                yield main
                continue
            partner = take(mix_it, allow_partial=False)
            if partner is None:
                return
            yield (*main, *partner)

    train_stream = make_stream("train", loop=True)
    if train_stream is None:
        raise ValueError("no train shards found")
    mix_stream = make_stream("train", loop=True, seed_offset=7919)
    if steps_per_epoch is None:
        counts = data_meta.get("counts", {}).get("train", {}).get(
            "sample_counts", {}
        )
        n = int(sum(counts.values()))
        if not n:
            n = sum(1 for _ in make_stream("train", loop=False))
        if n == 0:
            raise ValueError(
                "no feature-bearing records in the train split — rebuild "
                "with --add-features"
            )
        steps_per_epoch = max(n // train_cfg.batch_size, 1)
    train_iter = iter(batches(train_stream, mix_stream))

    def train_batches(epoch):
        for _ in range(steps_per_epoch):
            try:
                yield next(train_iter)
            except StopIteration:
                return

    # built ONCE so the stream's RAM cache (cache=True for non-train
    # splits) survives across epochs — rebuilding per epoch re-decodes the
    # gzip shards every epoch (same rule as the main train_run path)
    val_stream = make_stream("validation", loop=False)

    def val_batches():
        if val_stream is None:
            return
        yield from batches(val_stream)

    pre_train = make_merge_preprocess_fn(
        cfg, augment=True, mixup_alpha=train_cfg.mixup_alpha,
        mixup_chance=train_cfg.mixup_chance,
    )
    pre_eval = make_merge_preprocess_fn(cfg, augment=False)

    example = (
        jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32),
        jnp.zeros((1, *SHORT_FEATURES_SHAPE), jnp.float32),
        jnp.zeros((1, *MID_FEATURES_SHAPE), jnp.float32),
    )
    state = create_train_state(
        spec.module, example, learning_rate=train_cfg.learning_rate,
        seed=train_cfg.seed,
    )
    state = _maybe_restore(state, weights, weight_labels, labels)
    log.info("Model %s (merge inputs) has %s params", train_cfg.model_name,
             param_count(state))
    save_metadata(
        run_dir, train_cfg.model_name, labels, cfg, ontology,
        loss_fn=train_cfg.loss, multi_label=train_cfg.multi_label,
        use_generic_bird=train_cfg.use_generic_bird,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
    )
    result = fit(
        state, train_batches, pre_train,
        epochs=epochs or train_cfg.epochs,
        steps_per_epoch=steps_per_epoch,
        val_batches=val_batches, val_preprocess=pre_eval,
        loss_name=train_cfg.loss, multi_label=train_cfg.multi_label,
        label_smoothing=train_cfg.label_smoothing,
        run_dir=run_dir,
        early_stop_patience=train_cfg.early_stop_patience,
        reduce_lr_patience=train_cfg.reduce_lr_patience,
        reduce_lr_factor=train_cfg.reduce_lr_factor,
        seed=train_cfg.seed, augment=True,
        confusion_labels=labels if train_cfg.epoch_confusion else None,
    )

    test_metrics: dict = {}
    if confusion:
        test_stream = make_stream("test", loop=False)
        if test_stream is not None:
            predict = make_predict_fn(multi_label=train_cfg.multi_label)
            y_true_all, y_pred_all = [], []
            for batch in batches(test_stream):
                xs, y = batch[:2]
                inputs, yy = pre_eval(xs, y)
                y_pred_all.append(np.asarray(predict(result.state, inputs)))
                y_true_all.append(np.asarray(yy))
            if y_true_all:
                y_true = np.concatenate(y_true_all)
                y_pred = np.concatenate(y_pred_all)
                save_raw_predictions(run_dir / "confusion", labels, y_pred,
                                     y_true)
                if train_cfg.multi_label:
                    cm, none_cm, out_labels = multi_label_confusion(
                        y_true, y_pred, labels
                    )
                    save_confusion(cm, out_labels, run_dir / "confusion")
                    save_confusion(none_cm, out_labels,
                                   run_dir / "confusion-none")
                else:
                    cm, out_labels = single_label_confusion(y_true, y_pred,
                                                            labels)
                    save_confusion(cm, out_labels, run_dir / "confusion")
                test_metrics = test_set_metrics(y_true, y_pred, labels)

    save_metadata(
        run_dir, train_cfg.model_name, labels, cfg, ontology,
        loss_fn=train_cfg.loss, multi_label=train_cfg.multi_label,
        use_generic_bird=train_cfg.use_generic_bird,
        history=result.history, test_results=test_metrics,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
    )
    return TrainRunResult(run_dir=run_dir, labels=labels,
                          history=result.history, test_metrics=test_metrics)


@dataclass
class TrainRunResult:
    run_dir: Path
    labels: list[str]
    history: dict
    test_metrics: dict = field(default_factory=dict)


def train_run(
    data_dirs: list[str | Path],
    run_name: str,
    checkpoint_root: str | Path = "./checkpoints",
    train_cfg: TrainConfig | None = None,
    featurizer: FeaturizerConfig | None = None,
    epochs: int | None = None,
    steps_per_epoch: int | None = None,
    ontology: Ontology | None = None,
    confusion: bool = True,
    keep_excluded: bool = False,
    only_features: bool = False,
    morepork_model: bool = False,
    weights: str | Path | None = None,
    weight_labels: list[str] | None = None,
    split_shards: dict[str, list[Path]] | None = None,
    backbone_weights: str | Path | None = None,
    backbone_imagenet_stats: bool = True,
) -> TrainRunResult:
    """The full training pipeline on real shard data.

    ``split_shards`` maps split name -> explicit shard-file list, overriding
    the train/validation/test subdirectory discovery — used by the k-fold CV
    path, which partitions the pooled shard files itself
    (audiomodel.py:227-233).
    """
    train_cfg = train_cfg or TrainConfig()
    cfg = featurizer or FeaturizerConfig()
    data_dirs = [Path(d) for d in data_dirs]
    run_dir = Path(checkpoint_root) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)

    space, ontology, data_meta = init_labels(
        data_dirs, ontology,
        use_generic_bird=train_cfg.use_generic_bird,
        only_features=only_features, morepork_model=morepork_model,
    )
    labels = list(space.labels)
    log.info("Training %s on %s labels: %s", run_name, len(labels), labels)

    # mesh + shardings
    mesh = None
    sharding = None
    if train_cfg.num_data_shards > 1:
        mesh = make_mesh(num_data=train_cfg.num_data_shards)
        from audio_training_tpu.parallel import batch_sharding

        sharding = batch_sharding(mesh)

    # vector-input model families (embeddings linear probe, cnn-features)
    # train from stored vectors, not the waveform->mel path
    dtype0 = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else None
    spec0 = build_model(
        train_cfg.model_name, num_labels=len(labels),
        multi_label=train_cfg.multi_label, logits_only=True, dtype=dtype0,
    )
    dual = spec0.inputs == ("mel", "mel2")
    if spec0.inputs not in (("mel",), ("mel", "mel2")):
        if "mel" in spec0.inputs:
            # merge: joint end-to-end training of the badwinner2 tower plus
            # the short/mid feature towers (audiomodel.py:674-708 builds ONE
            # Keras model over the three inputs and fits it)
            return _train_merge_run(
                run_dir, data_dirs, split_shards, space, ontology, labels,
                train_cfg, cfg, spec0, epochs, steps_per_epoch, data_meta,
                weights=weights, weight_labels=weight_labels,
                confusion=confusion,
            )
        return _train_vector_run(
            run_dir, data_dirs, split_shards, space, ontology, labels,
            train_cfg, cfg, spec0, epochs, steps_per_epoch, data_meta,
            weights=weights, weight_labels=weight_labels,
        )

    channels = cfg.channels
    pre_train = make_preprocess_fn(
        cfg, augment=True, mixup_alpha=train_cfg.mixup_alpha,
        mixup_chance=train_cfg.mixup_chance, channels=channels, dual=dual,
    )
    pre_eval = make_preprocess_fn(cfg, augment=False, channels=channels,
                                  dual=dual)

    # the geo-aware weighted_bce needs per-sample GPS in every batch
    # (tfdataset.py:1188-1212)
    with_latlng = train_cfg.loss == "weighted_bce"

    # small train splits are cached in RAM after the first decode pass and
    # the stream is kept alive across epochs (re-decoding gzip shards every
    # epoch starves the device; see docs/PERFORMANCE.md).  Big splits stream
    # from disk each epoch with per-epoch shard reshuffling.
    counts_for_cache = load_meta(data_dirs[0]).get("counts", {}).get(
        "train", {}
    ).get("sample_counts", {}) if data_dirs else {}
    est_bytes = (
        sum(counts_for_cache.values()) * cfg.samples_per_clip * 4 * 2
    )
    cache_train = bool(est_bytes) and est_bytes < 2 * 1024**3

    train_shard_groups = (
        [split_shards["train"]] if split_shards is not None else None
    )
    stream_filters = dict(
        exclude_low_samples=train_cfg.no_low_samples,
        drop_bird_only=train_cfg.multi_label and not train_cfg.use_bird_tags,
        filter_freq=train_cfg.filter_freq,
        random_butter=train_cfg.random_butter,
    )
    persistent_train = None
    if cache_train:
        persistent_train = iter(build_training_stream(
            data_dirs, "train", space, cfg.samples_per_clip,
            batch_size=train_cfg.batch_size, seed=train_cfg.seed,
            augment=True, sharding=sharding, with_latlng=with_latlng,
            shard_groups=train_shard_groups, cache=True,
            **stream_filters,
        ))

    def train_batches(epoch):
        if persistent_train is not None:
            # explicit next() (NOT yield from): closing this generator at the
            # steps_per_epoch bound must not close the persistent stream
            while True:
                try:
                    yield next(persistent_train)
                except StopIteration:
                    return
        loader = build_training_stream(
            data_dirs, "train", space, cfg.samples_per_clip,
            batch_size=train_cfg.batch_size, seed=train_cfg.seed + epoch,
            augment=True, sharding=sharding, with_latlng=with_latlng,
            shard_groups=train_shard_groups,
            workers=train_cfg.loader_workers,
            **stream_filters,
        )
        yield from loader

    # the validation streams are built ONCE so their RAM cache (non-train
    # splits cache decoded samples, pipeline.py) survives across epochs
    from audio_training_tpu.data.pipeline import BatchLoader, RecordStream, find_shards, interleave

    if split_shards is not None:
        val_shard_groups = (
            [split_shards["validation"]] if split_shards.get("validation")
            else []
        )
    else:
        val_shard_groups = [
            s for s in (find_shards(d, "validation") for d in data_dirs) if s
        ]
    val_streams = [
        RecordStream(v_shards, space, cfg.samples_per_clip,
                     seed=train_cfg.seed + i * 97, loop=False, cache=True,
                     with_latlng=with_latlng,
                     **stream_filters)
        for i, v_shards in enumerate(val_shard_groups)
    ]

    def val_batches():
        if not val_streams:
            return
        if len(val_streams) == 1:
            stream = iter(val_streams[0])
        else:
            stream = interleave([iter(s) for s in val_streams], None,
                                seed=train_cfg.seed)
        yield from BatchLoader(
            stream, batch_size=train_cfg.batch_size,
            num_labels=space.num_labels,
            samples_per_clip=cfg.samples_per_clip, sharding=sharding,
        )

    # remapped per-output-label distribution: fold source-tag counts through
    # the remap + generic-bird extra tables so outputs fed only via remapping
    # (e.g. "bird") get their true counts (the pre-remap counts would give
    # them 0 -> weight 0 -> zero gradient)
    counts = data_meta.get("counts", {}).get("train", {}).get(
        "sample_counts", {}
    )
    dist = np.zeros(len(labels), np.float64)
    for i, src_label in enumerate(space.source_labels):
        c = counts.get(src_label, 0)
        if not c:
            continue
        tgt = int(space.remap[i])
        if tgt >= 0:
            dist[tgt] += c
        extra = int(space.extra[i])
        if extra >= 0:
            dist[extra] += c

    # epoch size for steps_per_epoch
    if steps_per_epoch is None:
        if split_shards is not None:
            # fold-specific file subset: the metadata counts cover the whole
            # dataset, so count the fold's usable samples directly
            total = RecordStream(
                split_shards["train"], space, cfg.samples_per_clip
            ).count()
        else:
            total = int(sum(counts.values()))
        if not total:
            # no counts in the metadata: count usable samples directly
            # (one decode-light pass) so the looping train stream is bounded
            total = sum(
                RecordStream(find_shards(d, "train"), space,
                             cfg.samples_per_clip).count()
                for d in data_dirs
            )
        steps_per_epoch = max(total // train_cfg.batch_size, 1)

    # class weights (audiomodel.py:524-526)
    class_weights = None
    if train_cfg.use_weighting:
        w = get_weighting(dist, labels, cap_max=train_cfg.weight_max,
                          cap_min=train_cfg.weight_min)
        class_weights = jnp.asarray(weights_to_array(w, len(labels)))

    # weighted_bce derives its negative-mask from the generic-bird structure
    bird_index = labels.index("bird") if "bird" in labels else None
    specific_bird_mask = None
    geo_masks = None
    if train_cfg.loss == "weighted_bce" and bird_index is not None:
        specific_bird_mask = np.array(
            [1.0 if (l in ontology.all_birds and l != "bird") else 0.0
             for l in labels],
            np.float32,
        )
        from audio_training_tpu.train.step import build_geo_masks

        geo_masks = build_geo_masks(labels, ontology.all_birds)

    # model
    spec = spec0
    keras_backbone = None
    if backbone_weights is not None:
        # pretrained-backbone import from a LOCAL keras weight file
        # (audiomodel.get_base_model weights="imagenet",
        # audiomodel.py:972-1141; zero-egress gating like infer/embeddings)
        from audio_training_tpu.models.transplant import load_keras_backbone

        keras_backbone, backbone_args = load_keras_backbone(
            train_cfg.model_name, backbone_weights,
            input_shape=(cfg.n_mels, cfg.mel_frames, channels),
            imagenet_stats=backbone_imagenet_stats,
        )
        if backbone_args:
            spec = build_model(
                train_cfg.model_name, num_labels=len(labels),
                multi_label=train_cfg.multi_label, logits_only=True,
                dtype=dtype0, backbone_args=backbone_args,
            )
    if dual:
        raw0 = jnp.zeros((1, cfg.samples_per_clip), jnp.float32)
        example_inputs, _ = pre_eval(raw0, jnp.zeros((1, len(labels))))
    else:
        mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, channels),
                         jnp.float32)
        example_inputs = (mel0,)
    state = create_train_state(
        spec.module, example_inputs, learning_rate=train_cfg.learning_rate,
        seed=train_cfg.seed,
    )
    if keras_backbone is not None:
        from audio_training_tpu.models.transplant import (
            transplant_backbone_into_classifier,
        )

        restored = transplant_backbone_into_classifier(
            {"params": state.params, "batch_stats": state.batch_stats},
            keras_backbone,
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats", state.batch_stats),
        )
        log.info("Imported backbone weights from %s", backbone_weights)
    state = _maybe_restore(state, weights, weight_labels, labels)
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
    log.info("Model %s has %s params", train_cfg.model_name,
             param_count(state))

    save_metadata(
        run_dir, train_cfg.model_name, labels, cfg, ontology,
        loss_fn=train_cfg.loss, multi_label=train_cfg.multi_label,
        use_generic_bird=train_cfg.use_generic_bird,
        mean_sub=cfg.mean_sub,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
        extra={
            "remapped_labels": {
                l: int(space.remap[i])
                for i, l in enumerate(space.source_labels)
            },
        },
    )

    hist_path = run_dir / "weight-hists.jsonl"

    def hist_writer(epoch, logs, st, tb=None):
        # per-epoch weight-histogram artifacts for the trainable frontend
        # weights the reference streams to TensorBoard (MagTransform/PCEN
        # a-power, audiomodel.log_hist_weights, audiomodel.py:2583-2592):
        # scalar frontends record their values, larger weights a real
        # (counts, bin-edges) histogram.  Appended per epoch — watchable
        # mid-run, like run_dir/training-log.csv — and, when the fit loop
        # passes its TensorBoard event writer, streamed into the standard
        # events.out.tfevents.* file too.
        import json as _json

        entries = {}

        def visit(path, leaf):
            name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                            for p in path)
            if any(k in name for k in ("a_power", "gain", "bias", "root",
                                       "smooth")):
                arr = np.asarray(leaf).ravel()
                if arr.size <= 8:
                    entries[name] = [float(v) for v in arr]
                else:
                    counts, edges = np.histogram(arr, bins=16)
                    entries[name] = {
                        "counts": counts.tolist(),
                        "edges": [float(e) for e in edges],
                        "mean": float(arr.mean()),
                        "std": float(arr.std()),
                    }

        jax.tree_util.tree_map_with_path(visit, st.params)
        with hist_path.open("a") as f:
            f.write(_json.dumps({"epoch": epoch, **entries}) + "\n")
        if tb is not None:
            for name, entry in entries.items():
                if isinstance(entry, dict):
                    tb.add_histogram_counts(
                        f"weights/{name}", entry["counts"], entry["edges"],
                        epoch,
                    )
                elif len(entry) == 1:
                    tb.add_scalar(f"weights/{name}", entry[0], epoch)
                else:
                    tb.add_histogram_values(f"weights/{name}", entry, epoch)

    result = fit(
        state,
        train_batches,
        pre_train,
        hist_writer=hist_writer,
        epochs=epochs or train_cfg.epochs,
        steps_per_epoch=steps_per_epoch,
        val_batches=val_batches,
        val_preprocess=pre_eval,
        loss_name=train_cfg.loss,
        multi_label=train_cfg.multi_label,
        label_smoothing=train_cfg.label_smoothing,
        class_weights=class_weights,
        run_dir=run_dir,
        early_stop_patience=train_cfg.early_stop_patience,
        reduce_lr_patience=train_cfg.reduce_lr_patience,
        reduce_lr_factor=train_cfg.reduce_lr_factor,
        seed=train_cfg.seed,
        remat=train_cfg.remat,
        bird_index=bird_index,
        specific_bird_mask=specific_bird_mask,
        geo_masks=geo_masks,
        confusion_labels=labels if train_cfg.epoch_confusion else None,
    )

    if train_cfg.bn_reestimate:
        # exact one-pass BN running-stat re-estimation over eval-preprocessed
        # train batches (train/step.reestimate_batch_stats): short schedules
        # leave the momentum-0.99 EMA badly stale, collapsing eval-mode
        # quality while train-mode metrics look fine.  The refreshed final
        # state is re-saved as run_dir/chkpt (per-metric best checkpoints
        # keep their own params+stats pairs).
        from audio_training_tpu.train.checkpoints import save_state
        from audio_training_tpu.train.step import reestimate_batch_stats

        def bn_batches():
            from audio_training_tpu.data.pipeline import (
                BatchLoader,
                RecordStream,
                find_shards,
            )

            shards = []
            for d in data_dirs:
                shards.extend(find_shards(d, "train"))
            stream = iter(RecordStream(
                shards, space, cfg.samples_per_clip, seed=train_cfg.seed,
                loop=False,
            ))
            for batch in BatchLoader(
                stream, batch_size=train_cfg.batch_size,
                num_labels=space.num_labels,
                samples_per_clip=cfg.samples_per_clip,
            ):
                mel, _ = pre_eval(*batch[:2])
                yield mel

        new_bs = reestimate_batch_stats(
            spec.module, result.state.params, result.state.batch_stats,
            bn_batches(),
        )
        result = result.__class__(
            state=result.state.replace(batch_stats=new_bs),
            history=result.history, epochs_run=result.epochs_run,
        )
        save_state(run_dir / "chkpt", result.state)
        log.info("BN running stats re-estimated over the train split")

    test_metrics: dict = {}
    if confusion:
        test_metrics = run_test_confusion(
            result.state, spec, pre_eval, data_dirs, space, cfg, train_cfg,
            run_dir,
            test_shards=(
                split_shards.get("test") if split_shards is not None else None
            ),
        )

    save_metadata(
        run_dir, train_cfg.model_name, labels, cfg, ontology,
        loss_fn=train_cfg.loss, multi_label=train_cfg.multi_label,
        use_generic_bird=train_cfg.use_generic_bird,
        mean_sub=cfg.mean_sub,
        history=result.history, test_results=test_metrics,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
        extra={
            "remapped_labels": {
                l: int(space.remap[i])
                for i, l in enumerate(space.source_labels)
            },
        },
    )
    return TrainRunResult(run_dir=run_dir, labels=labels,
                          history=result.history, test_metrics=test_metrics)


def test_set_metrics(y_true: np.ndarray, y_pred: np.ndarray,
                     labels: list[str], threshold: float = 0.5) -> dict:
    """Confusion-derived test metrics (audiomodel.py:569-595, and the
    per-label tp/fp tables of cross_fold_train, audiomodel.py:320-383).

    Element-wise (pred>.5)==(true>.5) accuracy over the whole multi-label
    matrix is dominated by true negatives (~98 % for 62 labels), so instead:
    micro precision/recall/F1 over positive instances, plus the reference's
    ``%Correct`` (hit positives / total positives — its cross-fold metric).
    """
    pred_pos = y_pred > threshold
    true_pos = y_true > threshold
    tp = int((pred_pos & true_pos).sum())
    fp = int((pred_pos & ~true_pos).sum())
    fn = int((~pred_pos & true_pos).sum())
    positives = tp + fn
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / positives if positives else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if (precision + recall) else 0.0)
    per_label = {}
    for i, l in enumerate(labels):
        pos = true_pos[:, i]
        if not pos.any():
            continue
        ltp = int((pred_pos[:, i] & pos).sum())
        lfp = int((pred_pos[:, i] & ~pos).sum())
        per_label[l] = {
            "support": int(pos.sum()),
            "recall": ltp / int(pos.sum()),
            "precision": ltp / (ltp + lfp) if (ltp + lfp) else 0.0,
        }
    return {
        "test_precision": precision,
        "test_recall": recall,
        "test_f1": f1,
        # reference %Correct (audiomodel.py:383): hit positives over positives
        "test_acc": recall,
        "test_samples": int(len(y_true)),
        "per_label": per_label,
    }


def run_test_confusion(state, spec, pre_eval, data_dirs, space, cfg,
                       train_cfg, run_dir, test_shards=None) -> dict:
    """Held-out test confusion (audiomodel.py:566-595)."""
    predict = make_predict_fn(multi_label=train_cfg.multi_label)
    y_true_all, y_pred_all = [], []
    try:
        loader = build_training_stream(
            data_dirs, "test", space, cfg.samples_per_clip,
            batch_size=train_cfg.batch_size, augment=False,
            shard_groups=[test_shards] if test_shards is not None else None,
        )
        for batch in loader:
            raw, y = batch[:2]
            mel, yy = pre_eval(raw, y)
            y_pred_all.append(np.asarray(predict(state, mel)))
            y_true_all.append(np.asarray(yy))
    except (ValueError, FileNotFoundError):
        log.info("No test split found")
        return {}
    if not y_true_all:
        return {}
    y_true = np.concatenate(y_true_all)
    y_pred = np.concatenate(y_pred_all)
    labels = list(space.labels)
    save_raw_predictions(run_dir / "confusion", labels, y_pred, y_true)
    if train_cfg.multi_label:
        cm, none_cm, out_labels = multi_label_confusion(y_true, y_pred,
                                                        labels)
        save_confusion(cm, out_labels, run_dir / "confusion")
        save_confusion(none_cm, out_labels, run_dir / "confusion-none")
    else:
        cm, out_labels = single_label_confusion(y_true, y_pred, labels)
        save_confusion(cm, out_labels, run_dir / "confusion")
    return test_set_metrics(y_true, y_pred, labels)


def kfold_indices(n: int, folds: int, rng: np.random.Generator):
    """sklearn KFold(n_splits, shuffle=True) equivalent: a shuffled
    permutation split into ``folds`` contiguous validation chunks; yields
    (train_idx, val_idx) pairs."""
    perm = rng.permutation(n)
    chunks = np.array_split(perm, folds)
    for k in range(folds):
        val = chunks[k]
        train = np.concatenate([chunks[j] for j in range(folds) if j != k])
        yield train, val


def cross_fold_train(
    data_dirs, run_name, folds: int = 5, test_percent: float = 0.2, **kwargs
) -> list[TrainRunResult]:
    """K-fold cross validation (audiomodel.cross_fold_train,
    audiomodel.py:181-401): pool ALL shard files (train+validation+test),
    shuffle, hold out ``test_percent`` of the files as a fixed test set, then
    KFold the remainder — each fold trains on its train files and validates
    on its held-out fold files.  Folds are file-disjoint by construction; the
    per-fold file assignment is written to ``fold-files.json`` in each run
    dir."""
    import dataclasses

    from audio_training_tpu.data.pipeline import find_shards

    cfg = kwargs.pop("train_cfg", None) or TrainConfig()
    data_dirs = [Path(d) for d in data_dirs]
    files: list[Path] = []
    for d in data_dirs:
        for split in ("train", "validation", "test"):
            files.extend(find_shards(d, split))
    if len(files) < folds + 1:
        raise ValueError(
            f"need more than {folds} shard files for {folds}-fold CV, "
            f"have {len(files)}"
        )
    rng = np.random.default_rng(cfg.seed)
    files = [files[i] for i in rng.permutation(len(files))]
    n_test = max(int(test_percent * len(files)), 1)
    test_files = files[:n_test]  # audiomodel.py:208-212
    pool = files[n_test:]

    results = []
    for fold, (train_idx, val_idx) in enumerate(
        kfold_indices(len(pool), folds, rng)
    ):
        split_shards = {
            "train": [pool[i] for i in train_idx],
            "validation": [pool[i] for i in val_idx],
            "test": list(test_files),
        }
        fold_cfg = dataclasses.replace(cfg, seed=cfg.seed + fold * 1000)
        result = train_run(
            data_dirs, f"{run_name}-fold{fold}", train_cfg=fold_cfg,
            split_shards=split_shards, **kwargs,
        )
        (result.run_dir / "fold-files.json").write_text(json.dumps(
            {k: [str(p) for p in v] for k, v in split_shards.items()},
            indent=2,
        ))
        results.append(result)
    return results


def train_random_forest(
    data_dirs: list[str | Path],
    run_name: str,
    checkpoint_root: str | Path = "./checkpoints",
    train_cfg: TrainConfig | None = None,
    ontology: Ontology | None = None,
    **rf_kwargs,
) -> TrainRunResult:
    """``rf-features``: fit a random forest on flattened short+mid
    hand-crafted features (audiomodel.py:766-769 builds a ydf
    RandomForestLearner; tf_to_ydf flattens the dataset,
    audiomodel.py:2790-2803).  The ydf backend is used when importable
    (the reference's learner); sklearn is the fallback (ydf is not bundled
    in every image) — pass ``backend=`` in ``rf_kwargs`` to force one.
    The model pickles into the run dir with accuracy in metadata."""
    import pickle

    from audio_training_tpu.data.embeddings import FeatureStream
    from audio_training_tpu.data.pipeline import find_shards
    from audio_training_tpu.models.registry import build_random_forest

    train_cfg = train_cfg or TrainConfig(model_name="rf-features")
    run_dir = Path(checkpoint_root) / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    data_dirs = [Path(d) for d in data_dirs]
    space, ontology, data_meta = init_labels(
        data_dirs, ontology, use_generic_bird=train_cfg.use_generic_bird,
    )
    labels = list(space.labels)

    def xy(split):
        shards = []
        for d in data_dirs:
            shards.extend(find_shards(d, split))
        xs, ys = [], []
        for short, mid, y in FeatureStream(shards, space):
            xs.append(np.concatenate([short.ravel(), mid.ravel()]))
            ys.append(y)
        if not xs:
            return None, None
        return np.stack(xs), np.stack(ys)

    x_train, y_train = xy("train")
    if x_train is None:
        raise ValueError(
            "no feature records in the train split — rebuild with "
            "--add-features"
        )
    rf = build_random_forest(random_state=train_cfg.seed, **rf_kwargs)
    rf_backend = type(rf).__name__
    rf.fit(x_train, y_train)
    history: dict = {"train_accuracy": [float(rf.score(x_train, y_train))]}
    x_val, y_val = xy("validation")
    if x_val is not None:
        history["val_accuracy"] = [float(rf.score(x_val, y_val))]
    with (run_dir / "random_forest.pkl").open("wb") as f:
        pickle.dump({"model": rf, "labels": labels}, f)
    save_metadata(
        run_dir, "rf-features", labels,
        FeaturizerConfig(), ontology,
        multi_label=train_cfg.multi_label,
        training_data_meta={
            k: v for k, v in data_meta.items() if k in ("counts", "type")
        },
        extra={"rf_history": history, "rf_backend": rf_backend},
    )
    log.info("random forest trained: %s", history)
    return TrainRunResult(run_dir=run_dir, labels=labels, history=history)
