"""Harness-level unit tests: label-space init incl. merge modes, and the
driver entry points."""

import json

import numpy as np
import pytest


def _write_meta(tmp_path, labels, counts=None):
    counts = counts or {l: 100 for l in labels}
    meta = {
        "labels": labels,
        "counts": {
            "train": {"sample_counts": counts,
                      "rec_counts": {l: 60 for l in labels}},
            "validation": {"sample_counts": {l: 10 for l in labels}},
            "test": {"sample_counts": {}},
        },
    }
    (tmp_path / "training-meta.json").write_text(json.dumps(meta))
    return tmp_path


def test_init_labels_default(tmp_path):
    from audio_training_tpu.train.harness import init_labels

    _write_meta(tmp_path, ["kiwi", "morepork", "rain", "human"])
    space, ont, meta = init_labels([tmp_path])
    # morepork resolves to its eBird id; generic bird appended; the default
    # path drops standalone human/noise outputs (audiomodel.py:1768-1773)
    assert "morepo2" in space.labels
    assert "bird" in space.labels
    assert "human" not in space.labels
    assert "kiwi" in space.labels


def test_init_labels_count_admission(tmp_path):
    from audio_training_tpu.train.harness import init_labels

    # whiteh1 is not in BIRD_TRAIN_LABELS but has enough data -> admitted
    _write_meta(tmp_path, ["kiwi", "whiteh1"])
    space, ont, _ = init_labels([tmp_path])
    assert "whiteh1" in ont.bird_train_labels
    assert "whiteh1" in space.labels


def test_init_labels_only_features(tmp_path):
    from audio_training_tpu.train.harness import init_labels

    _write_meta(tmp_path, ["kiwi", "morepork", "rain", "dog"])
    space, ont, _ = init_labels([tmp_path], only_features=True)
    # everything merges into bird/animal/noise (audiomodel.py:1708-1732)
    kiwi_sid = space.source_labels.index("kiwi")
    y = space.one_hot([kiwi_sid])
    assert y[space.index_of("bird")] == 1
    assert "animal" in space.labels
    dog_sid = space.source_labels.index("dog")
    assert space.one_hot([dog_sid])[space.index_of("animal")] == 1


def test_init_labels_morepork_model(tmp_path):
    from audio_training_tpu.train.harness import init_labels

    _write_meta(tmp_path, ["kiwi", "morepork", "rain"])
    space, ont, _ = init_labels([tmp_path], morepork_model=True)
    # morepork survives as its own output; other birds fold into bird
    assert "morepo2" in space.labels
    kiwi_sid = space.source_labels.index("kiwi")
    y = space.one_hot([kiwi_sid])
    assert y[space.index_of("bird")] == 1
    assert y.sum() == 1  # kiwi does not keep its own output
    morepo_sid = space.source_labels.index("morepo2")
    assert space.one_hot([morepo_sid])[space.index_of("morepo2")] == 1


@pytest.mark.slow
def test_graft_entry_dryrun_multichip():
    """The driver's multi-chip validation runs inside the suite too.

    Run it in a FRESH subprocess (the driver's own invocation shape), not
    in-process: jaxlib 0.9.0's CPU executable (de)serialization segfaults
    on this 8-device pjit executable under deep accumulated suite state —
    in BOTH cache directions (put at ~180 tests in, then get once the
    entry was warmed) — while the identical compile in a shallow process
    is fine (see .claude/skills/verify/SKILL.md).  The subprocess
    configures no persistent cache, so neither path can trigger it.
    """
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo", capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (proc.stdout or "") + (proc.stderr or "")


@pytest.mark.slow
def test_graft_entry_fn_compiles_cpu():
    import sys

    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    fn, args = ge.entry()
    out = fn(*args)
    assert out.shape == (8, 62)


@pytest.mark.slow
def test_train_run_embeddings_model(tmp_path):
    """train_run routes the 'embeddings' linear probe through the stored-
    vector path (tfdatasetembeddings.py pipeline parity): no mel
    featurization, trains and checkpoints end-to-end."""
    import json

    import numpy as np

    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.train.harness import train_run

    rng = np.random.default_rng(0)
    data = tmp_path / "training-data"
    labels = ["kiwi", "morepork", "rain"]
    for split, n in (("train", 24), ("validation", 8)):
        recs = []
        for i in range(n):
            tag = labels[i % 3]
            # label-correlated embeddings so the probe can actually learn
            emb = rng.standard_normal(1280).astype(np.float32) * 0.1
            emb[labels.index(tag)] += 3.0
            recs.append(encode_sample(SampleRecord(
                raw=np.zeros(0, np.float32), tags=[tag],
                rec_id=f"{split}{i}", embeddings=emb,
            )))
        write_tfrecords(data / split / "00.tfrecord", recs)
    (data / "training-meta.json").write_text(json.dumps({
        "labels": labels, "type": "audio",
        "counts": {"train": {
            "sample_counts": {l: 8 for l in labels},
            "rec_counts": {l: 8 for l in labels},
        }, "validation": {
            "sample_counts": {l: 3 for l in labels},
            "rec_counts": {l: 3 for l in labels},
        }},
    }))

    cfg = TrainConfig(model_name="embeddings", batch_size=8,
                      learning_rate=0.05, epochs=3)
    result = train_run(
        [data], "embrun", checkpoint_root=tmp_path / "ckpt",
        train_cfg=cfg, featurizer=FeaturizerConfig(), epochs=3,
    )
    assert len(result.history["loss"]) == 3
    assert result.history["loss"][-1] < result.history["loss"][0]
    assert "val_loss" in result.history
    assert (result.run_dir / "metadata.txt").exists()
    assert (result.run_dir / "chkpt").exists()


@pytest.mark.slow
def test_train_run_cnn_features_model(tmp_path):
    """train_run routes 'cnn-features' through the FeatureStream path with
    tuple model inputs (tfdataset.py:1041-1111 parity)."""
    import json

    import numpy as np

    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.data.embeddings import (
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
    )
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.train.harness import train_run

    rng = np.random.default_rng(1)
    data = tmp_path / "training-data"
    labels = ["kiwi", "rain"]
    for split, n in (("train", 16), ("validation", 8)):
        recs = []
        for i in range(n):
            tag = labels[i % 2]
            short = rng.standard_normal(SHORT_FEATURES_SHAPE).astype(
                np.float32) * 0.1
            short += 2.0 * (1 if tag == "kiwi" else -1)
            mid = rng.standard_normal(MID_FEATURES_SHAPE).astype(np.float32)
            recs.append(encode_sample(SampleRecord(
                raw=np.zeros(0, np.float32), tags=[tag],
                rec_id=f"{split}{i}", short_features=short,
                mid_features=mid,
            )))
        write_tfrecords(data / split / "00.tfrecord", recs)
    (data / "training-meta.json").write_text(json.dumps({
        "labels": labels, "type": "audio",
        "counts": {"train": {
            "sample_counts": {l: 8 for l in labels},
            "rec_counts": {l: 8 for l in labels},
        }, "validation": {
            "sample_counts": {l: 4 for l in labels},
            "rec_counts": {l: 4 for l in labels},
        }},
    }))

    cfg = TrainConfig(model_name="cnn-features", batch_size=8,
                      learning_rate=0.01, epochs=2)
    result = train_run(
        [data], "featrun", checkpoint_root=tmp_path / "ckpt",
        train_cfg=cfg, featurizer=FeaturizerConfig(), epochs=2,
    )
    assert len(result.history["loss"]) == 2
    assert np.isfinite(result.history["loss"]).all()
    assert (result.run_dir / "chkpt").exists()


@pytest.mark.slow
# Parametrized over BOTH backends unconditionally so the test report names
# what actually ran: when ydf is not importable the ydf case shows up as an
# explicit skip-with-reason instead of silently vanishing from the matrix
# (the reference's learner is ydf, audiomodel.py:766-769; sklearn is the
# fallback adapter).
@pytest.mark.parametrize("backend", ["ydf", "sklearn"])
def test_train_random_forest(tmp_path, backend):
    from audio_training_tpu.models.registry import rf_backends

    if backend not in rf_backends():
        pytest.skip(
            f"rf backend {backend!r} not importable in this environment "
            f"(available: {rf_backends()}) — the reference's ydf learner "
            "path is untested here"
        )
    """rf-features: random forest over flattened hand-crafted features
    (audiomodel.py:766-769 + tf_to_ydf), on whichever backends this
    environment provides (ydf when importable — the reference's learner —
    else sklearn)."""
    import json

    import numpy as np

    from audio_training_tpu.config import TrainConfig
    from audio_training_tpu.data.embeddings import (
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
    )
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.train.harness import train_random_forest

    rng = np.random.default_rng(2)
    data = tmp_path / "training-data"
    labels = ["kiwi", "rain"]
    for split, n in (("train", 20), ("validation", 8)):
        recs = []
        for i in range(n):
            tag = labels[i % 2]
            short = rng.standard_normal(SHORT_FEATURES_SHAPE).astype(
                np.float32) * 0.1 + (2.0 if tag == "kiwi" else -2.0)
            recs.append(encode_sample(SampleRecord(
                raw=np.zeros(0, np.float32), tags=[tag],
                rec_id=f"{split}{i}", short_features=short,
                mid_features=rng.standard_normal(
                    MID_FEATURES_SHAPE).astype(np.float32),
            )))
        write_tfrecords(data / split / "00.tfrecord", recs)
    (data / "training-meta.json").write_text(json.dumps({
        "labels": labels, "type": "audio",
        "counts": {"train": {
            "sample_counts": {l: 10 for l in labels},
            "rec_counts": {l: 10 for l in labels},
        }, "validation": {
            "sample_counts": {l: 4 for l in labels},
            "rec_counts": {l: 4 for l in labels},
        }},
    }))

    result = train_random_forest(
        [data], f"rfrun-{backend}", checkpoint_root=tmp_path / "ckpt",
        train_cfg=TrainConfig(model_name="rf-features"), n_estimators=20,
        backend=backend,
    )
    assert result.history["train_accuracy"][0] > 0.9  # separable
    assert result.history["val_accuracy"][0] > 0.9
    assert (result.run_dir / "random_forest.pkl").exists()
    meta = json.loads((result.run_dir / "metadata.txt").read_text())
    assert meta["rf_backend"] in ("RandomForestClassifier", "YDFRandomForest")


@pytest.mark.slow
def test_train_run_dual_badwinner2(tmp_path, small_corpus_dataset=None):
    """dual-badwinner2 trains end-to-end through the two-view preprocess
    (tfdataset.raw_to_mel_dual parity)."""
    import json

    import numpy as np

    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.train.harness import train_run

    rng = np.random.default_rng(3)
    # 5 s clips: the dual views' fixed hops (278/280) need enough frames
    # for badwinner2's (1,9) head conv after the pools
    sr, spc = 8000, 8000 * 5
    data = tmp_path / "training-data"
    labels = ["kiwi", "rain"]
    for split, n in (("train", 8), ("validation", 4)):
        recs = []
        for i in range(n):
            tag = labels[i % 2]
            raw = (0.1 * rng.standard_normal(spc)).astype(np.float32)
            recs.append(encode_sample(SampleRecord(
                raw=raw, tags=[tag], rec_id=f"{split}{i}", sr=sr,
            )))
        write_tfrecords(data / split / "00.tfrecord", recs)
    (data / "training-meta.json").write_text(json.dumps({
        "labels": labels, "type": "audio",
        "counts": {"train": {
            "sample_counts": {l: 4 for l in labels},
            "rec_counts": {l: 4 for l in labels},
        }, "validation": {
            "sample_counts": {l: 2 for l in labels},
            "rec_counts": {l: 2 for l in labels},
        }},
    }))

    cfg = TrainConfig(model_name="dual-badwinner2", batch_size=4,
                      learning_rate=1e-3, epochs=1,
                      compute_dtype="float32")
    fz = FeaturizerConfig(sr=sr, n_fft=512, hop_length=100, n_mels=96,
                          fmin=100, fmax=3500, segment_length=5.0)
    result = train_run(
        [data], "dualrun", checkpoint_root=tmp_path / "ckpt",
        train_cfg=cfg, featurizer=fz, epochs=1, steps_per_epoch=2,
        confusion=False,
    )
    assert len(result.history["loss"]) == 1
    assert np.isfinite(result.history["loss"]).all()


@pytest.mark.slow
def test_train_run_merge_model(tmp_path):
    """'merge' trains jointly end-to-end: badwinner2 mel tower + short/mid
    feature towers as ONE model (audiomodel.py:674-708), streaming
    (raw, short_f, mid_f, y) from feature-bearing records."""
    import json

    import numpy as np

    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.data.schema import (
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
        SampleRecord,
        encode_sample,
    )
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.train.harness import train_run

    rng = np.random.default_rng(4)
    sr, spc = 8000, 8000 * 3
    data = tmp_path / "training-data"
    labels = ["kiwi", "rain"]
    for split, n in (("train", 16), ("validation", 8), ("test", 8)):
        recs = []
        for i in range(n):
            tag = labels[i % 2]
            raw = (0.1 * rng.standard_normal(spc)).astype(np.float32)
            short = rng.standard_normal(SHORT_FEATURES_SHAPE).astype(
                np.float32) * 0.1
            short += 2.0 * (1 if tag == "kiwi" else -1)
            mid = np.abs(rng.standard_normal(MID_FEATURES_SHAPE)).astype(
                np.float32)
            recs.append(encode_sample(SampleRecord(
                raw=raw, tags=[tag], rec_id=f"{split}{i}", sr=sr,
                short_features=short, mid_features=mid,
            )))
        write_tfrecords(data / split / "00.tfrecord", recs)
    (data / "training-meta.json").write_text(json.dumps({
        "labels": labels, "type": "audio",
        "counts": {"train": {
            "sample_counts": {l: 8 for l in labels},
            "rec_counts": {l: 8 for l in labels},
        }, "validation": {
            "sample_counts": {l: 4 for l in labels},
            "rec_counts": {l: 4 for l in labels},
        }},
    }))

    cfg = TrainConfig(model_name="merge", batch_size=4, learning_rate=1e-3,
                      epochs=2, compute_dtype="float32")
    fz = FeaturizerConfig(sr=sr, n_fft=512, hop_length=100, n_mels=96,
                          fmin=100, fmax=3500)
    result = train_run(
        [data], "mergerun", checkpoint_root=tmp_path / "ckpt",
        train_cfg=cfg, featurizer=fz, epochs=2, steps_per_epoch=3,
    )
    assert len(result.history["loss"]) == 2
    assert np.isfinite(result.history["loss"]).all()
    assert "val_loss" in result.history
    assert (result.run_dir / "chkpt").exists()
    # joint test-set confusion artifacts written from the three-input model
    assert (result.run_dir / "confusion.npy").exists() or list(
        result.run_dir.glob("confusion*")
    )
    assert result.test_metrics.get("test_samples", 0) > 0
