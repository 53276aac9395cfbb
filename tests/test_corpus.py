"""Corpus-layer tests: sidecar metadata parsing, track tag/relabel handling,
sampling pools, split leakage, balancing, and the end-to-end dataset build
(WAV tree -> TFRecord shards -> stream back)."""

import json

import numpy as np
import pytest

from audio_training_tpu.config import FeaturizerConfig, SamplingConfig
from audio_training_tpu.corpus import (
    AudioDataset,
    Recording,
    Track,
    best_rms,
    create_tf_records,
    ensure_track_length,
    filter_track,
    load_data,
    load_wav,
    oversample_ds,
    resample,
    save_wav,
    space_signals,
    split_randomly,
    undersample_ds,
    validate_datasets,
    write_training_meta,
)
from audio_training_tpu.corpus.split import _add_sample
from audio_training_tpu.data import RecordStream, decode_sample, find_shards, read_tfrecords

SR = 8000
CFG = FeaturizerConfig(sr=SR, n_fft=512, hop_length=100, n_mels=32,
                       fmax=3500.0)
NO_RMS = SamplingConfig(tighten_tracks=False, filter_rms=False)


def make_meta(rec_id, tracks, duration=10.0, location=None, signal=None):
    return {
        "id": rec_id,
        "duration": duration,
        "location": location,
        "signal": signal or [],
        "Tracks": [
            {
                "id": f"t{rec_id}_{i}",
                "start": t["start"],
                "end": t["end"],
                "tags": [{"what": t["what"], "automatic": False}],
            }
            for i, t in enumerate(tracks)
        ],
    }


def write_rec(tmp_path, rec_id, tracks, duration=10.0, seed=0, **kw):
    rng = np.random.default_rng(seed)
    audio = (0.1 * rng.standard_normal(int(duration * SR))).astype(np.float32)
    for t in tracks:
        i0, i1 = int(t["start"] * SR), int(t["end"] * SR)
        tt = np.arange(i1 - i0) / SR
        audio[i0:i1] += np.sin(2 * np.pi * 1000 * tt).astype(np.float32)
    save_wav(tmp_path / f"{rec_id}.wav", audio, SR)
    meta = make_meta(rec_id, tracks, duration, **kw)
    (tmp_path / f"{rec_id}.txt").write_text(json.dumps(meta))
    return meta


# ---------------------------------------------------------------------------
# Track / Recording
# ---------------------------------------------------------------------------


def test_track_tags_and_relabel():
    meta = {
        "id": "t1", "start": 0, "end": 3,
        "tags": [{"what": "Great Spotted Kiwi", "automatic": False}],
    }
    t = Track(meta, "f.wav", "r1", None, tighten=False, filter_rms=False)
    # dataset-stage relabel: grskiw1 -> kiwi (audiodataset.py:68-78)
    assert t.human_tags == {"kiwi"}
    assert "grskiw1" in t.original_tags
    assert t.bird_track and not t.noise_track


def test_track_positions_to_freq():
    meta = {
        "id": "t1", "start": 0, "end": 3,
        "tags": [{"what": "morepork", "automatic": False}],
        "positions": [{"y": 0.1, "height": 0.2}],
    }
    t = Track(meta, "f.wav", "r1", None, tighten=False, filter_rms=False)
    assert t.min_freq == pytest.approx(0.1 * 24000)
    assert t.max_freq == pytest.approx(0.2 * 24000 + t.min_freq)


def test_filter_track():
    multi = {
        "id": "x", "start": 0, "end": 1,
        "tags": [{"what": "kiwi", "automatic": False},
                 {"what": "morepork", "automatic": False}],
    }
    t = Track(multi, "f", "r", None, tighten=False, filter_rms=False)
    assert filter_track(t)  # multi-tag rejected
    rej = {"id": "x", "start": 0, "end": 1,
           "tags": [{"what": "unidentified", "automatic": False}]}
    t2 = Track(rej, "f", "r", None, tighten=False, filter_rms=False)
    assert filter_track(t2)


def test_recording_sampling_pools():
    # 8 s track -> candidate starts every 1 s, max 4 used samples, extras in
    # pools (audiodataset.py:554-842)
    meta = make_meta("r1", [{"start": 0.5, "end": 8.5, "what": "morepork"}])
    rec = Recording(meta, "r1.wav", NO_RMS, segment_length=3.0,
                    segment_stride=1.0, rng=np.random.default_rng(0))
    # at most MAX_TRACK_SAMPLES make it through (selected starts landing in
    # the too-short tail are dropped by the min-length break, like the
    # reference, audiodataset.py:737-741)
    assert 1 <= len(rec.samples) <= 4
    assert len(rec.unused_samples) > 0
    assert len(rec.small_strides) > 0
    for s in rec.samples:
        assert s.tags == ["morepo2"]  # morepork -> ebird id
        assert s.bin_id == "r1-0"


def test_recording_short_track_one_sample():
    meta = make_meta("r2", [{"start": 1.0, "end": 3.0, "what": "kiwi"}])
    rec = Recording(meta, "r2.wav", NO_RMS, rng=np.random.default_rng(0))
    assert len(rec.samples) == 1


def test_recording_signal_percent():
    meta = make_meta(
        "r3", [{"start": 0.0, "end": 4.0, "what": "kiwi"}],
        signal=[[0.0, 2.0, 2000], [2.5, 3.0, 500]],  # second is <1kHz
    )
    rec = Recording(meta, "r3.wav", NO_RMS, rng=np.random.default_rng(0))
    t = rec.tracks[0]
    assert t.signal_percent == pytest.approx(0.5)  # 2s of 4s above 1kHz


def test_rms_filtering_missing_rms():
    meta = {"id": "r4", "Tracks": [{
        "id": "t", "start": 0, "end": 3,
        "tags": [{"what": "kiwi", "automatic": False}],
    }]}
    rec = Recording(meta, "r4.wav", SamplingConfig(filter_rms=True),
                    rng=np.random.default_rng(0))
    # bird track without rms metadata gets filtered (audiodataset.py:966-976)
    assert rec.tracks[0].rms_filtered
    assert rec.samples == []


def test_best_rms_rolling_window():
    rms = np.zeros(100)
    rms[40:60] = 1.0
    off, _ = best_rms(rms, segment_length=3, sr=1000, hop_length=100)
    # window=30; max-energy window must cover [40,60) (the reference's
    # rolling update is inclusive of one extra trailing bin, so 29 is valid)
    assert 29 <= off <= 40


def test_space_signals():
    sigs = [(0, 1), (1.05, 2), (5, 6)]
    out = space_signals(sigs, spacing=0.1)
    assert out == [(0, 2), (5, 6)]


def test_ensure_track_length():
    s, e = ensure_track_length(5.0, 5.5, 1.5,
                               rng=np.random.default_rng(0))
    assert e - s == pytest.approx(1.5)


# ---------------------------------------------------------------------------
# AudioDataset + split + balance
# ---------------------------------------------------------------------------


@pytest.fixture()
def corpus(tmp_path):
    labels = ["kiwi", "morepork", "rain"]
    n = 0
    for rec_i in range(30):
        what = labels[rec_i % 3]
        write_rec(
            tmp_path, f"rec{rec_i}",
            [{"start": 0.5, "end": 5.5, "what": what}],
            duration=8.0, seed=rec_i,
        )
        n += 1
    ds = AudioDataset("all", NO_RMS, segment_length=3.0, segment_stride=1.0)
    ds.load_meta(tmp_path)
    return ds


def test_dataset_load_meta(corpus):
    assert len(corpus.recs) == 30
    assert corpus.labels == {"kiwi", "morepo2", "rain"}
    counts = corpus.get_counts()
    assert sum(counts.values()) == len(corpus.samples)


def test_split_randomly_no_leak(corpus):
    datasets = split_randomly(corpus, seed=0)
    train, val, test = datasets
    assert train.samples and val.samples and test.samples
    validate_datasets(datasets)  # raises on leakage
    # rough proportions: train largest
    assert len(train.samples) > len(val.samples) >= len(test.samples)


def test_oversample(corpus):
    datasets = split_randomly(corpus, seed=0)
    train = datasets[0]
    before = train.get_counts()
    oversample_ds(corpus, train, rng=np.random.default_rng(0))
    after = train.get_counts()
    assert all(after[k] >= v for k, v in before.items())


def test_undersample():
    # build an unbalanced dataset: one label with many samples
    ds = AudioDataset("t", NO_RMS)
    for i in range(12):
        meta = make_meta(f"r{i}", [{"start": 0.5, "end": 7.5,
                                    "what": "kiwi" if i < 10 else "rain"}])
        rec = Recording(meta, f"r{i}.wav", NO_RMS,
                        rng=np.random.default_rng(i))
        ds.add_recording(rec)
    before = ds.get_counts()
    undersample_ds(ds, rng=np.random.default_rng(0))
    after = ds.get_counts()
    assert after["kiwi"] <= before["kiwi"]


# ---------------------------------------------------------------------------
# Writer end-to-end
# ---------------------------------------------------------------------------


def test_load_data_window():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal(SR * 10).astype(np.float32)
    d = load_data(CFG, 2.0, frames, SR, rng=rng)
    assert d.raw.shape == (SR * 3,)
    np.testing.assert_array_equal(d.raw, frames[SR * 2 : SR * 5])


def test_load_data_pads_short():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal(SR * 2).astype(np.float32)
    d = load_data(CFG, 0.0, frames, SR, end=2.0, rng=rng)
    assert d.raw.shape == (SR * 3,)
    assert d.raw_length == pytest.approx(2.0)


def test_load_data_rejects_constant():
    frames = np.zeros(SR * 5, np.float32)
    with pytest.raises(ValueError):
        load_data(CFG, 0.0, frames, SR)


def test_build_end_to_end(tmp_path, corpus):
    """The full L2->L3->L4 slice: corpus -> split -> shards -> stream."""
    from audio_training_tpu.taxonomy.labels import build_label_space
    from audio_training_tpu.taxonomy.ontology import load_ontology

    datasets = split_randomly(corpus, seed=1)
    validate_datasets(datasets)
    out = tmp_path / "training-data"
    for ds in datasets:
        n = create_tf_records(ds, out / ds.name, num_workers=1, cfg=CFG)
        assert n > 0
    meta_path = write_training_meta(out, datasets, CFG)
    meta = json.loads(meta_path.read_text())
    assert set(meta["counts"].keys()) == {"train", "validation", "test"}
    assert meta["labels"]

    # records decode with the right schema
    shard = find_shards(out, "train")[0]
    rec = next(iter(read_tfrecords(shard)))
    d = decode_sample(rec)
    assert d.raw.size == CFG.samples_per_clip
    assert d.tags

    # and stream into training batches
    ont = load_ontology()
    space = build_label_space(ont, ["bird"] + sorted(meta["labels"]))
    stream = RecordStream(find_shards(out, "train"), space,
                          CFG.samples_per_clip, loop=False)
    items = list(stream)
    assert len(items) > 10


def test_load_features_shapes():
    """Hand-crafted feature extraction for cnn-features/merge
    (audiodataset.load_features): 3 s @ 48 kHz -> (68, 60) short and
    (136, 3) mid, the shapes the reference's models consume
    (tfdataset.py:1041-1045)."""
    from audio_training_tpu.corpus.features import load_features

    rng = np.random.default_rng(0)
    sr = 48000
    sig = rng.standard_normal(sr * 3).astype(np.float32)
    short, mid = load_features(sig, sr)
    assert short.shape == (68, 60)
    assert mid.shape == (136, 3)
    assert np.isfinite(short).all() and np.isfinite(mid).all()
    # features respond to content: a tone and noise differ
    tone = np.sin(2 * np.pi * 880 * np.arange(sr * 3) / sr).astype(np.float32)
    short_t, _ = load_features(tone, sr)
    assert np.abs(short_t - short).max() > 0.01


def test_writer_add_features(tmp_path, corpus):
    """add_features stores the (68, T)/(136, T) hand-crafted features in
    each record (audiowriter.py:136-142,370)."""
    from audio_training_tpu.data.pipeline import find_shards
    from audio_training_tpu.data.schema import decode_sample
    from audio_training_tpu.data.tfrecord import read_tfrecords

    small = AudioDataset("small", NO_RMS, segment_length=3.0,
                         segment_stride=1.0)
    rec = next(iter(corpus.recs.values()))
    small.add_recording(rec)
    small.samples = list(rec.samples)[:2]
    rec_samples, rec.samples = rec.samples, small.samples
    out = tmp_path / "feat-recs"
    n = create_tf_records(small, out, num_workers=1, cfg=CFG,
                          add_features=True)
    rec.samples = rec_samples
    assert n > 0
    shard = find_shards(out)[0]
    d = decode_sample(next(iter(read_tfrecords(shard))), want_features=True)
    assert d.short_features is not None and d.mid_features is not None
    assert d.short_features.reshape(68, -1).shape[0] == 68
    assert d.mid_features.reshape(136, -1).shape[0] == 136


def test_writer_add_buttered(tmp_path, corpus):
    """--add-buttered stores a Butterworth band-passed waveform variant for
    samples with track freq bounds (the write side audiodataset.py:1301
    intended but ships commented out; feeds train --filter-freq)."""
    from audio_training_tpu.corpus.writer import process_recording
    from audio_training_tpu.data.schema import decode_sample

    rec = next(iter(corpus.recs.values()))
    for s in rec.samples:
        s.min_freq = 500.0
        s.max_freq = 2000.0
    encoded = process_recording(rec, CFG, add_buttered=True,
                                check_duration=False)
    assert encoded
    d = decode_sample(encoded[0], want_buttered=True)
    assert d.buttered is not None
    assert d.buttered.size == d.raw.size
    assert np.isfinite(d.buttered).all()
    assert not np.allclose(d.buttered, d.raw)  # band-pass changed content
    # without the flag no variant is stored
    d0 = decode_sample(
        process_recording(rec, CFG, check_duration=False)[0],
        want_buttered=True,
    )
    assert d0.buttered is None

    # malformed bounds (min >= max would raise in scipy butter) must not
    # take down the recording — samples still written, just no variant
    for s in rec.samples:
        s.min_freq = 3000.0
        s.max_freq = 2000.0
    bad = process_recording(rec, CFG, add_buttered=True,
                            check_duration=False)
    assert len(bad) == len(encoded)
    assert decode_sample(bad[0], want_buttered=True).buttered is None


def test_export_signal_data(tmp_path):
    """--create-signal-wavs (build.create_signal_data, build.py:840-912):
    per tag-key signal-region audio chunks + JSON offset index."""
    from audio_training_tpu.corpus.signal_data import export_signal_data

    rng = np.random.default_rng(0)
    root = tmp_path / "corpus"
    root.mkdir()
    # 10 s recording, one kiwi track 1-6 s, signal spans at 1.5-2.5 and
    # 3.0-4.0 s (inside the track) and 8.0-9.0 s (outside)
    audio = (0.05 * rng.standard_normal(10 * SR)).astype(np.float32)
    audio[int(1.5 * SR):int(2.5 * SR)] = 0.5
    save_wav(root / "r1.wav", audio, SR)
    meta = make_meta(
        "r1", [{"start": 1.0, "end": 6.0, "what": "kiwi"}],
        signal=[[1.5, 2.5, 2000], [3.0, 4.0, 2000], [8.0, 9.0, 2000]],
    )
    (root / "r1.txt").write_text(json.dumps(meta))

    from audio_training_tpu.corpus.audioio import load_recording

    ds = AudioDataset("all", NO_RMS)
    ds.load_meta(root)
    out = tmp_path / "sigout"
    n = export_signal_data(ds, out, sr=SR, min_seconds=0.5)
    assert n >= 1
    wavs = sorted(out.glob("kiwi-*.wav"))
    assert wavs
    frames, sr = load_recording(wavs[0], target_sr=None)
    # two overlapping spans of 1 s each -> ~2 s of concatenated signal
    assert abs(len(frames) / sr - 2.0) < 0.05
    idx = json.loads(wavs[0].with_suffix(".txt").read_text())
    (rec_key, track_map), = idx["recs"].items()
    assert rec_key == "r1"
    (span,), = [list(track_map.values())]
    assert span[0] == 0 and abs(span[1] - 2 * SR) <= 2


def test_build_signal_dataset_cli(tmp_path):
    """--signal (build.dataset_from_signal, build.py:248-330): a pre-split
    signal-WAV tree becomes TFRecord shards with filename-derived labels."""
    from audio_training_tpu.cli.build import main as build_main

    rng = np.random.default_rng(1)
    sig = tmp_path / "signals"
    for split, labels in (("train", ["kiwi", "kiwi", "rain"]),
                          ("validation", ["kiwi", "rain"])):
        d = sig / split
        d.mkdir(parents=True)
        for i, label in enumerate(labels):
            audio = (0.1 * rng.standard_normal(4 * SR)).astype(np.float32)
            save_wav(d / f"{label}-{i}.wav", audio, SR)

    rc = build_main([
        str(tmp_path / "out"), "-d", str(sig), "--signal",
        "--sr", str(SR), "--n-fft", "512", "--hop-length", "100",
        "--mels", "32", "--fmax", "3500",
        "--seg-length", "3", "--stride", "1", "--workers", "1",
    ])
    assert rc == 0
    data = tmp_path / "out" / "training-data"
    meta = json.loads((data / "training-meta.json").read_text())
    assert sorted(meta["labels"]) == ["kiwi", "rain"]
    assert meta["counts"]["train"]["sample_counts"]["kiwi"] >= 2
    train_shards = find_shards(data, "train")
    assert train_shards
    tags = set()
    for rec in read_tfrecords(train_shards[0]):
        tags.update(decode_sample(rec).tags)
    assert tags <= {"kiwi", "rain"} and tags
