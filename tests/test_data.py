"""Data-layer tests: proto codec, TFRecord framing, schema roundtrip,
pipeline semantics (shuffle/interleave/filters), preprocess, weighting."""

import numpy as np
import pytest

from tests.conftest import requires_tf
from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.data import example as ex
from audio_training_tpu.data import (
    RecordStream,
    SampleRecord,
    decode_sample,
    encode_sample,
    find_shards,
    get_weighting,
    make_preprocess_fn,
    read_tfrecords,
    write_tfrecords,
)
from audio_training_tpu.data._native import (
    crc32c,
    frame_record,
    get_lib,
    masked_crc,
    split_records,
)
from audio_training_tpu.data.pipeline import BatchLoader, interleave
from audio_training_tpu.taxonomy.labels import build_label_space
from audio_training_tpu.taxonomy.ontology import load_ontology


# ---------------------------------------------------------------------------
# crc32c / framing
# ---------------------------------------------------------------------------


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 zero bytes -> 0x8a9136aa
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_native_lib_builds():
    lib = get_lib()
    assert lib is not None, "native codec failed to build (g++ available?)"


def test_native_matches_python_crc():
    from audio_training_tpu.data._native import _py_crc32c

    data = bytes(range(256)) * 3 + b"tail"
    assert crc32c(data) == _py_crc32c(data)


def test_frame_and_split_roundtrip():
    records = [b"hello", b"", b"x" * 1000]
    stream = b"".join(frame_record(r) for r in records)
    out = split_records(stream, verify_crc=True)
    assert [bytes(r) for r in out] == records


def test_split_rejects_corruption():
    stream = bytearray(frame_record(b"payload"))
    stream[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(ValueError):
        split_records(bytes(stream), verify_crc=True)


# ---------------------------------------------------------------------------
# Example proto codec
# ---------------------------------------------------------------------------


def test_example_roundtrip():
    arr = np.arange(10, dtype=np.float32) * 0.5
    feats = {
        "f": ex.float_list_feature(arr),
        "b": ex.bytes_feature(b"kiwi\nbird"),
        "i": ex.int64_list_feature([1, -2, 3_000_000_000]),
        "s": ex.float_feature(2.5),
    }
    decoded = ex.decode_example(ex.encode_example(feats))
    np.testing.assert_array_equal(decoded["f"].float_array(), arr)
    assert decoded["b"].scalar_bytes() == b"kiwi\nbird"
    assert decoded["i"].int64_list() == [1, -2, 3_000_000_000]
    assert decoded["s"].scalar_float() == 2.5


@requires_tf
@pytest.mark.slow
def test_example_wire_compatible_with_tf():
    import tensorflow as tf

    arr = np.linspace(-1, 1, 100).astype(np.float32)
    ours = ex.encode_example(
        {
            "audio/raw": ex.float_list_feature(arr),
            "audio/rec_id": ex.bytes_feature(b"12345"),
            "audio/low_sample": ex.int64_feature(1),
        }
    )
    parsed = tf.train.Example.FromString(ours)
    got = np.array(parsed.features.feature["audio/raw"].float_list.value)
    np.testing.assert_array_equal(got, arr)
    assert parsed.features.feature["audio/rec_id"].bytes_list.value[0] == b"12345"
    assert parsed.features.feature["audio/low_sample"].int64_list.value[0] == 1

    # and decode TF's own serialization with our codec
    theirs = parsed.SerializeToString()
    back = ex.decode_example(theirs)
    np.testing.assert_array_equal(back["audio/raw"].float_array(), arr)


@requires_tf
@pytest.mark.slow
def test_tfrecord_file_readable_by_tf(tmp_path):
    import tensorflow as tf

    recs = [b"alpha", b"beta" * 100]
    path = tmp_path / "t.tfrecord"
    write_tfrecords(path, recs, compression="GZIP")
    ds = tf.data.TFRecordDataset([str(path)], compression_type="GZIP")
    got = [r.numpy() for r in ds]
    assert got == recs


# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------


def test_sample_schema_roundtrip():
    raw = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    s = SampleRecord(
        raw=raw,
        tags=["kiwi", "morepo2"],
        text_tags=["kiwi"],
        rec_id="r42",
        track_ids=["t1", "t2"],
        lat=-41.2,
        lng=174.7,
        signal_percent=0.8,
        low_sample=1,
        start_s=2.0,
        min_freq=500.0,
        max_freq=4000.0,
    )
    d = decode_sample(encode_sample(s))
    np.testing.assert_array_equal(d.raw, raw)
    assert d.tags == ["kiwi", "morepo2"]
    assert d.rec_id == "r42"
    assert d.track_ids == ["t1", "t2"]
    assert d.lat == pytest.approx(-41.2, abs=1e-4)
    assert d.low_sample == 1
    assert d.min_freq == 500.0


def test_sample_schema_lazy_skip_spectrogram():
    s = SampleRecord(
        raw=np.zeros(100, np.float32),
        tags=["kiwi"],
        spectogram=np.ones((10, 10), np.float32),
    )
    d = decode_sample(encode_sample(s), want_spectogram=False)
    assert d.spectogram is None
    d2 = decode_sample(encode_sample(s), want_spectogram=True)
    assert d2.spectogram.size == 100


# ---------------------------------------------------------------------------
# Pipeline
# ---------------------------------------------------------------------------


@pytest.fixture()
def tiny_dataset(tmp_path):
    """4 shards x 8 records of 1000-sample clips labelled kiwi/morepo2/noise."""
    rng = np.random.default_rng(42)
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "morepo2", "noise"])
    labels = ["kiwi", "morepo2", "noise"]
    split_dir = tmp_path / "train"
    n = 0
    for shard in range(4):
        recs = []
        for i in range(8):
            tag = labels[n % 3]
            s = SampleRecord(
                raw=rng.standard_normal(1000).astype(np.float32),
                tags=[tag],
                rec_id=f"rec{n}",
            )
            recs.append(encode_sample(s))
            n += 1
        write_tfrecords(split_dir / f"{shard}.tfrecord", recs)
    return tmp_path, space


def test_record_stream_one_epoch(tiny_dataset):
    root, space = tiny_dataset
    shards = find_shards(root, "train")
    assert len(shards) == 4
    stream = RecordStream(shards, space, samples_per_clip=1000, loop=False)
    items = list(stream)
    assert len(items) == 32
    raws, ys = zip(*items)
    assert all(r.shape == (1000,) for r in raws)
    # kiwi one-hots also light the generic bird output
    kiwi_i, bird_i = space.index_of("kiwi"), space.index_of("bird")
    kiwi_rows = [y for y in ys if y[kiwi_i] == 1]
    assert kiwi_rows and all(y[bird_i] == 1 for y in kiwi_rows)


def test_record_stream_filters_nan(tmp_path):
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "noise"])
    bad = np.full(100, np.nan, np.float32)
    good = np.zeros(100, np.float32)
    good[0] = 1
    recs = [
        encode_sample(SampleRecord(raw=bad, tags=["kiwi"])),
        encode_sample(SampleRecord(raw=good, tags=["kiwi"])),
        encode_sample(SampleRecord(raw=good, tags=["unknownlabel"])),
    ]
    write_tfrecords(tmp_path / "train" / "0.tfrecord", recs)
    stream = RecordStream(
        find_shards(tmp_path, "train"), space, 100, loop=False, shuffle=False
    )
    items = list(stream)
    assert len(items) == 1  # NaN row and unlabeled row filtered


def test_record_stream_count(tiny_dataset):
    root, space = tiny_dataset
    stream = RecordStream(find_shards(root, "train"), space, 1000, loop=False)
    assert stream.count() == 32


def test_record_stream_no_low_samples(tmp_path):
    """exclude_low_samples drops oversampled records (tfdataset.py:728-733,
    filtering on the decoded audio/low_sample flag)."""
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "noise"])
    good = np.zeros(100, np.float32)
    good[0] = 1
    recs = [
        encode_sample(SampleRecord(raw=good, tags=["kiwi"], low_sample=1)),
        encode_sample(SampleRecord(raw=good, tags=["kiwi"], low_sample=0)),
    ]
    write_tfrecords(tmp_path / "train" / "0.tfrecord", recs)
    shards = find_shards(tmp_path, "train")
    assert len(list(RecordStream(shards, space, 100, loop=False))) == 2
    assert len(list(RecordStream(
        shards, space, 100, loop=False, exclude_low_samples=True
    ))) == 1


def test_record_stream_drops_bird_only(tmp_path):
    """Samples tagged ONLY generic "bird" are dropped from multi-label
    training unless use_bird_tags (others_filter, tfdataset.py:735-755) —
    specific-species samples (whose one-hot also lights "bird" via the
    extra hit) are kept."""
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "noise"])
    good = np.zeros(100, np.float32)
    good[0] = 1
    recs = [
        encode_sample(SampleRecord(raw=good, tags=["bird"])),
        encode_sample(SampleRecord(raw=good, tags=["kiwi"])),
        encode_sample(SampleRecord(raw=good, tags=["noise"])),
    ]
    write_tfrecords(tmp_path / "train" / "0.tfrecord", recs)
    shards = find_shards(tmp_path, "train")
    assert len(list(RecordStream(shards, space, 100, loop=False))) == 3
    kept = list(RecordStream(
        shards, space, 100, loop=False, drop_bird_only=True, shuffle=False
    ))
    assert len(kept) == 2
    bird_i, kiwi_i = space.index_of("bird"), space.index_of("kiwi")
    ys = [y for _, y in kept]
    # the kiwi sample (bird lit via the extra hit) survived
    assert any(y[kiwi_i] == 1 and y[bird_i] == 1 for y in ys)
    assert not any(y[bird_i] == 1 and y.sum() == 1 for y in ys)


def test_record_stream_filter_freq_buttered(tmp_path):
    """filter_freq trains on the stored band-passed variant when the record
    carries one (tfdataset.py:1066-1078); random_butter makes it a
    per-visit coin flip."""
    ont = load_ontology()
    space = build_label_space(ont, ["bird", "kiwi", "noise"])
    plain = np.zeros(100, np.float32)
    plain[0] = 1
    band = np.full(100, 0.5, np.float32)
    recs = [
        encode_sample(SampleRecord(raw=plain, tags=["kiwi"], buttered=band)),
        encode_sample(SampleRecord(raw=plain, tags=["noise"])),  # no variant
    ]
    write_tfrecords(tmp_path / "train" / "0.tfrecord", recs)
    shards = find_shards(tmp_path, "train")

    raws = [r for r, _ in RecordStream(shards, space, 100, loop=False,
                                       shuffle=False)]
    assert all(r[1] == 0.0 for r in raws)  # default: plain raw
    raws = [r for r, _ in RecordStream(shards, space, 100, loop=False,
                                       shuffle=False, filter_freq=True)]
    assert raws[0][1] == 0.5  # buttered substituted
    assert raws[1][1] == 0.0  # record without a variant: plain
    # random_butter=1.0 always picks the variant; 0.0 means "always" too
    # (the probability gate only arms when > 0, matching random_butter=0
    # -> unconditional butter in the reference decode)
    raws = [r for r, _ in RecordStream(shards, space, 100, loop=False,
                                       shuffle=False, filter_freq=True,
                                       random_butter=1.0)]
    assert raws[0][1] == 0.5


def test_interleave_drains_all():
    a = iter([1, 2, 3])
    b = iter(["x", "y"])
    out = list(interleave([a, b], None, seed=1))
    assert sorted(map(str, out)) == sorted(["1", "2", "3", "x", "y"])


def test_batch_loader_shapes(tiny_dataset):
    root, space = tiny_dataset
    stream = iter(
        RecordStream(find_shards(root, "train"), space, 1000, loop=False)
    )
    loader = BatchLoader(
        stream, batch_size=8, num_labels=space.num_labels,
        samples_per_clip=1000,
    )
    batches = list(loader)
    assert len(batches) == 4  # 32 records / batch 8
    raw, y = batches[0]
    assert raw.shape == (8, 1000)
    assert y.shape == (8, space.num_labels)


def test_preprocess_fn_eval():
    cfg = FeaturizerConfig(n_fft=512, hop_length=100, n_mels=32)
    fn = make_preprocess_fn(cfg)
    raw = np.random.default_rng(0).standard_normal(
        (2, cfg.samples_per_clip)).astype(np.float32)
    y = np.zeros((2, 4), np.float32)
    mel, y2 = fn(raw, y)
    assert mel.shape == (2, 32, cfg.mel_frames, 1)
    np.testing.assert_array_equal(np.asarray(y2), y)


def test_preprocess_fn_augment():
    import jax

    cfg = FeaturizerConfig(n_fft=512, hop_length=100, n_mels=32)
    fn = make_preprocess_fn(cfg, augment=True)
    rng = np.random.default_rng(1)
    raw = rng.standard_normal((4, cfg.samples_per_clip)).astype(np.float32)
    raw2 = rng.standard_normal((4, cfg.samples_per_clip)).astype(np.float32)
    y = np.eye(4, dtype=np.float32)
    y2 = np.roll(y, 1, 0)
    mel, yy = fn(raw, y, raw2, y2, jax.random.PRNGKey(0))
    assert mel.shape == (4, 32, cfg.mel_frames, 1)
    assert set(np.unique(np.asarray(yy))) <= {0.0, 1.0}
    assert np.isfinite(np.asarray(mel)).all()


def test_get_weighting_caps():
    labels = ["a", "b", "c", "d"]
    dist = np.array([1000.0, 10.0, 0.0, 100.0])
    w = get_weighting(dist, labels)
    assert w[2] == 0.0  # zero-count label
    assert w[1] == 4.0  # rare label hits the cap
    # dominant label: (1/1000) * (1110/3) = 0.37, inside [0.25, 4]
    assert w[0] == pytest.approx(0.37)
    assert w[3] == pytest.approx(3.7)


def test_parallel_loader(tiny_dataset):
    from audio_training_tpu.data.parallel_loader import ParallelLoader

    root, space = tiny_dataset
    loader = ParallelLoader(
        find_shards(root, "train"), space, samples_per_clip=1000,
        batch_size=4, num_workers=2, loop=False,
    )
    batches = list(loader)
    # 32 records over 2 workers -> 8 full batches of 4 (remainders dropped)
    assert len(batches) == 8
    raw, y = batches[0]
    assert raw.shape == (4, 1000)
    assert y.shape == (4, space.num_labels)


def test_parallel_loader_mix_pairs(tiny_dataset):
    from audio_training_tpu.data.parallel_loader import ParallelLoader

    root, space = tiny_dataset
    loader = ParallelLoader(
        find_shards(root, "train"), space, samples_per_clip=1000,
        batch_size=4, num_workers=2, loop=False, mix=True,
    )
    item = next(iter(loader))
    assert len(item) == 4
    loader.close()


def test_build_training_stream_selects_parallel_loader(tiny_dataset):
    """workers>1 on a plain train split routes through the multiprocess
    loader; lat/lng (geo loss) and eval splits keep the threaded path."""
    from audio_training_tpu.data.parallel_loader import ParallelLoader
    from audio_training_tpu.data.pipeline import (
        BatchLoader,
        build_training_stream,
    )

    root, space = tiny_dataset
    loader = build_training_stream(
        [root], "train", space, samples_per_clip=1000, batch_size=4,
        augment=True, workers=2,
    )
    assert isinstance(loader, ParallelLoader)
    it = iter(loader)
    raw, y, raw2, y2 = next(it)  # augment -> mixup partner pair
    assert raw.shape == (4, 1000) and raw2.shape == (4, 1000)
    loader.close()

    geo = build_training_stream(
        [root], "train", space, samples_per_clip=1000, batch_size=4,
        augment=True, workers=2, with_latlng=True,
    )
    assert isinstance(geo, BatchLoader)
