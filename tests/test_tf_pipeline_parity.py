"""Input-pipeline parity vs the ACTUAL reference tf.data graph
(tfdataset.get_dataset, /root/reference/tfdataset.py:429-506).

The same shard (written with our wire-compatible codec) flows through the
reference pipeline and through RecordStream; per-record one-hots, filters,
order and the geo possible_labels must match exactly, and the stochastic
pieces (mix_up, tfdataset.py:931-955) match statistically.  Class weights
(get_weighting, tfdataset.py:1721-1761) match as a table.

The reference module imports librosa / tensorflow_io / audiomentations /
soundfile at module level; none are bundled, so minimal stubs stand in —
none of the exercised code paths call into them.
"""

from __future__ import annotations

import os
import pathlib
import sys
import types

import numpy as np
import pytest

from conftest import tf_parity

pytestmark = tf_parity

REFERENCE = pathlib.Path("/root/reference")
SR = 48000
CLIP = SR * 3
LABELS = ["bird", "kiwi", "morepo2", "noise"]


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@pytest.fixture(scope="module")
def ref_tfdataset():
    import importlib

    import matplotlib

    matplotlib.use("Agg")

    class _Aug:  # audiomentations placeholders (never called on our paths)
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            raise NotImplementedError

    stubs = {
        "librosa": _stub("librosa"),
        "librosa.display": _stub("librosa.display"),
        "tensorflow_io": _stub("tensorflow_io"),
        "soundfile": _stub("soundfile"),
        "audiomentations": _stub(
            "audiomentations", AddBackgroundNoise=_Aug,
            PolarityInversion=_Aug, Compose=_Aug,
        ),
    }

    def fft_frequencies(sr=22050, n_fft=2048):
        return np.linspace(0, sr / 2, 1 + n_fft // 2, endpoint=True)

    stubs["librosa"].fft_frequencies = fft_frequencies
    stubs["librosa"].display = stubs["librosa.display"]

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    old_cwd = os.getcwd()
    os.chdir(REFERENCE)  # utils.py reads classes.csv relative to CWD
    sys.path.insert(0, str(REFERENCE))
    cleared = ("tfdataset", "custommel", "badwinner2", "birdsconfig",
               "utils")
    for name in cleared:
        sys.modules.pop(name, None)
    try:
        yield importlib.import_module("tfdataset")
    finally:
        sys.path.pop(0)
        os.chdir(old_cwd)
        for name in cleared:
            sys.modules.pop(name, None)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def shard48k(tmp_path_factory):
    """One GZIP shard of production-geometry records covering the parity
    branches: multi-tag, generic-bird-only in/out of the NZ box, unknown
    GPS, an excluded-tag record (filtered) and a NaN record (filtered)."""
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords

    rng = np.random.default_rng(7)

    def clip(scale=0.1):
        return (scale * rng.standard_normal(CLIP)).astype(np.float32)

    entries = [
        (["morepo2"], (-41.0, 174.5)),          # specific bird, in NZ
        (["kiwi"], (0.0, 0.0)),                  # specific bird, unknown GPS
        (["morepo2", "kiwi"], (-41.0, 174.5)),   # multi-tag
        (["bird"], (-41.0, 174.5)),              # generic-only, in NZ
        (["bird"], (48.0, 2.0)),                 # generic-only, outside NZ
        (["bird"], (0.0, 0.0)),                  # generic-only, unknown GPS
        (["noise"], (-41.0, 174.5)),
        (["kiwi"], (-41.0, 174.5)),
        (["morepo2"], (-36.0, 175.0)),
        (["video-game"], (-41.0, 174.5)),        # unknown tag -> filtered
    ]
    recs = []
    for i, (tags, (lat, lng)) in enumerate(entries):
        recs.append(encode_sample(SampleRecord(
            raw=clip(), tags=tags, text_tags=tags, rec_id=str(1000 + i),
            track_ids=[f"t{i}"], lat=lat, lng=lng, start_s=float(i),
            signal_percent=0.5,
        )))
    bad = clip()
    bad[100] = np.nan                            # NaN filter parity
    recs.append(encode_sample(SampleRecord(
        raw=bad, tags=["kiwi"], text_tags=["kiwi"], rec_id="2000",
        track_ids=["tbad"], lat=-41.0, lng=174.5,
    )))
    d = tmp_path_factory.mktemp("shard48k") / "train"
    d.mkdir()
    write_tfrecords(d / "00.tfrecord", recs, compression="GZIP")
    return d


def _our_space():
    from audio_training_tpu.taxonomy.labels import build_label_space
    from audio_training_tpu.taxonomy.ontology import load_ontology

    ontology = load_ontology()
    return ontology, build_label_space(ontology, list(LABELS))


def test_per_record_parity(ref_tfdataset, shard48k):
    """Record-for-record: same survivors in the same order, identical
    one-hots (incl. the extra generic-bird positive) and identical
    geo possible_labels (read_tfrecord, tfdataset.py:1131-1212)."""
    import tensorflow as tf

    from audio_training_tpu.data.pipeline import RecordStream
    from audio_training_tpu.train.step import (
        build_geo_masks,
        possible_from_geo,
    )

    # use_bird_tags=True keeps generic-bird-only records (default-off
    # filter at tfdataset.py:751-755; flag exposed at audiomodel.py:2311)
    # — they are the records that exercise the geo possible_labels paths
    ds, remapped, epoch_size, labels2, extra = ref_tfdataset.get_dataset(
        shard48k, list(LABELS), augment=False, shuffle=False,
        deterministic=True, cache=False, debug=True, use_bird_tags=True,
    )
    ref_rows = []
    # debug-mode tuple (read_tfrecord, tfdataset.py:1213-1228): (label,
    # embed_preds=None, signal_percent, rec_id, track_id, possible_labels,
    # low_sample, start_s, text)
    for x, y in ds:
        ref_rows.append({
            "rec_id": y[3].numpy().decode(),
            "one_hot": y[0].numpy().astype(np.float32),
            "possible": y[5].numpy().astype(np.float32),
            "raw": x.numpy(),
        })
    assert ref_rows, "reference pipeline yielded nothing"
    # the unknown-tag and NaN records must have been filtered
    ref_ids = [r["rec_id"] for r in ref_rows]
    assert "1009" not in ref_ids and "2000" not in ref_ids
    assert len(ref_ids) == 9

    ontology, space = _our_space()
    assert list(space.labels) == list(labels2)

    stream = RecordStream(
        [shard48k / "00.tfrecord"], space, CLIP,
        deterministic=True, shuffle=False, loop=False, with_latlng=True,
    )
    ours = list(stream)
    assert len(ours) == len(ref_rows)
    geo = build_geo_masks(list(space.labels), ontology.all_birds)
    for (raw, one_hot, latlng), ref in zip(ours, ref_rows):
        np.testing.assert_array_equal(
            np.asarray(one_hot), ref["one_hot"], err_msg=ref["rec_id"]
        )
        np.testing.assert_array_equal(np.asarray(raw), ref["raw"])
        possible = np.asarray(possible_from_geo(
            np.asarray(one_hot)[None], np.asarray(latlng, np.float32)[None],
            geo,
        ))[0]
        np.testing.assert_array_equal(possible, ref["possible"],
                                      err_msg=ref["rec_id"])
    del tf


def test_mixup_statistics_match(ref_tfdataset):
    """mix_up (tfdataset.py:931-955) vs our device mixup on identical
    constant batches: the realized per-row mix weight distribution must
    agree — ~`chance` of rows mixed, Beta(0.5, 0.5) weights, single-label
    y flip at l > 0.5."""
    import jax
    import tensorflow as tf

    from audio_training_tpu.ops.features import mix_up as our_mix_up

    n = 4096
    x1 = np.ones((n, 8), np.float32)
    x2 = np.zeros((n, 8), np.float32)
    y1 = np.tile(np.array([[1.0, 0.0]], np.float32), (n, 1))
    y2 = np.tile(np.array([[0.0, 1.0]], np.float32), (n, 1))

    epoch = tf.Variable(0, dtype=tf.int64, trainable=False)
    tf.random.set_seed(0)
    xr, yr = ref_tfdataset.mix_up(
        (tf.constant(x1), tf.constant(y1)),
        (tf.constant(x2), tf.constant(y2)),
        epoch, alpha=0.5,
    )
    l_ref = xr.numpy()[:, 0]  # row value IS the realized mix weight
    y_ref = yr.numpy()

    mx, my = our_mix_up(jax.random.PRNGKey(3), x1, y1, x2, y2,
                        alpha=0.5, chance=0.25, single_label=True)
    l_ours = np.asarray(mx)[:, 0]
    y_ours = np.asarray(my)

    for l_vals, y_vals, who in ((l_ref, y_ref, "ref"),
                                (l_ours, y_ours, "ours")):
        mixed = l_vals > 1e-6
        frac = mixed.mean()
        assert 0.20 < frac < 0.30, (who, frac)  # chance = 0.25
        lm = l_vals[mixed]
        # Beta(0.5, 0.5): mean 1/2, var 1/8
        assert abs(lm.mean() - 0.5) < 0.04, (who, lm.mean())
        assert abs(lm.var() - 0.125) < 0.02, (who, lm.var())
        # single-label flip: y == y1 iff l > 0.5 (ties measure-zero)
        keeps = y_vals[:, 0] == 1.0
        np.testing.assert_array_equal(keeps, l_vals > 0.5,
                                      err_msg=who)
        # value range: mixed rows stay inside [min, max] of the sources
        assert l_vals.min() >= 0.0 and l_vals.max() <= 1.0, who


def test_normalize_parity(ref_tfdataset):
    """The post-mixup per-sample waveform min-max normalize
    (tfdataset.normalize, tfdataset.py:1916-1934) vs ops.features
    .normalize_rows on the same batch."""
    import tensorflow as tf

    from audio_training_tpu.ops.features import normalize_rows

    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 500)).astype(np.float32) * 3.0
    y = np.zeros((4, 2), np.float32)
    ref_x, _ = ref_tfdataset.normalize(tf.constant(x), tf.constant(y))
    ours = np.asarray(normalize_rows(x))
    np.testing.assert_allclose(ours, ref_x.numpy(), rtol=1e-5, atol=1e-6)


def test_class_weighting_table_matches(ref_tfdataset, shard48k):
    """get_weighting on the reference dataset vs ours on our stream's
    distribution: identical {index: weight} tables
    (tfdataset.py:1721-1761)."""
    from audio_training_tpu.data.pipeline import RecordStream
    from audio_training_tpu.data.preprocess import get_weighting

    import tensorflow as tf

    ds, remapped, epoch_size, labels2, extra = ref_tfdataset.get_dataset(
        shard48k, list(LABELS), augment=False, shuffle=False,
        deterministic=True, cache=False, debug=True, use_bird_tags=True,
    )
    # get_weighting expects the BATCHED training dataset (its
    # get_distribution iterates (x, y) batches, tfdataset.py:1345-1360);
    # rebatch the debug stream's one-hots into that shape
    onehots = np.stack([y[0].numpy() for _, y in ds]).astype(np.float32)
    ref_ds = tf.data.Dataset.from_tensor_slices(
        (np.zeros((len(onehots), 1), np.float32), onehots)
    ).batch(4)
    ref_weights = ref_tfdataset.get_weighting(ref_ds, list(labels2))

    _, space = _our_space()
    stream = RecordStream(
        [shard48k / "00.tfrecord"], space, CLIP,
        deterministic=True, shuffle=False, loop=False,
    )
    dist = np.zeros(space.num_labels, np.float32)
    for _, one_hot in stream:
        dist += np.asarray(one_hot) > 0
    ours = get_weighting(dist, list(space.labels))
    assert set(ours) == set(ref_weights)
    for i in ours:
        assert ours[i] == pytest.approx(ref_weights[i], rel=1e-6), (
            i, space.labels[i]
        )
