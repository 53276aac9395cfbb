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
    """The driver's multi-chip validation runs inside the suite too."""
    import sys

    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as ge
    finally:
        sys.path.pop(0)
    ge.dryrun_multichip(8)


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
