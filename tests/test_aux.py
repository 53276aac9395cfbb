"""Tests for auxiliary components: metadata enrichment, external corpus
ingestion, corpus tools, embeddings pipeline, offline mixup writer, denoise,
profiling, pipeline checker."""

import json

import numpy as np
import pytest

from audio_training_tpu.corpus.audioio import save_wav

SR = 8000


def tone_wav(path, freq=1000, dur=4.0, sr=SR, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(dur * sr)) / sr
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    x += noise * rng.standard_normal(len(x)).astype(np.float32)
    save_wav(path, x, sr)
    return x


# ---------------------------------------------------------------------------
# Enrichment
# ---------------------------------------------------------------------------


def test_band_rms_parseval():
    from audio_training_tpu.corpus.enrich import band_rms
    from audio_training_tpu.detect.signals import _host_stft_mag

    rng = np.random.default_rng(0)
    x = rng.standard_normal(48000).astype(np.float32)
    mag = _host_stft_mag(x, 4096, 281)
    rms = band_rms(mag, None, None)
    # full-band rms should approximate the windowed signal rms scale
    assert rms.shape[0] == mag.shape[1]
    assert 0.05 < rms.mean() < 2.0


def test_process_rms_enriches_sidecar(tmp_path):
    from audio_training_tpu.corpus.enrich import process_rms

    tone_wav(tmp_path / "r.wav", freq=900, dur=4.0)
    meta = {
        "id": "r",
        "Tracks": [{"id": "t0", "start": 0.5, "end": 3.5,
                    "tags": [{"what": "morepork", "automatic": False}]}],
    }
    (tmp_path / "r.txt").write_text(json.dumps(meta))
    assert process_rms(tmp_path / "r.txt", target_sr=SR)
    enriched = json.loads((tmp_path / "r.txt").read_text())
    t = enriched["Tracks"][0]
    assert "bird_rms" in t and "noise_rms" in t and "upper_rms" in t
    assert len(t["bird_rms"]) > 10
    # morepork band cap applied (otherdata.py:1262-1264)
    assert len(t["bird_rms_bin"]) == 2
    # second call is a no-op
    assert not process_rms(tmp_path / "r.txt", target_sr=SR)


def test_add_signal_meta(tmp_path):
    from audio_training_tpu.corpus.enrich import add_signal_meta

    tone_wav(tmp_path / "s.wav", freq=2000, dur=5.0, noise=0.005)
    (tmp_path / "s.txt").write_text(json.dumps({"id": "s"}))
    assert add_signal_meta(tmp_path / "s.txt", target_sr=SR)
    meta = json.loads((tmp_path / "s.txt").read_text())
    assert meta["signal"]
    s = meta["signal"][0]
    assert s[2] < 2000 < s[3]  # frequency box contains the tone


def test_generate_tracks(tmp_path):
    from audio_training_tpu.corpus.enrich import generate_tracks

    x = np.zeros(int(6 * SR), np.float32)
    t = np.arange(int(1.5 * SR)) / SR
    x[SR : SR + len(t)] = np.sin(2 * np.pi * 1500 * t)
    x += 0.005 * np.random.default_rng(0).standard_normal(len(x)).astype(
        np.float32
    )
    save_wav(tmp_path / "g.wav", x, SR)
    (tmp_path / "g.txt").write_text(json.dumps({"id": "g", "label": "kiwi"}))
    assert generate_tracks(tmp_path / "g.txt", target_sr=SR)
    meta = json.loads((tmp_path / "g.txt").read_text())
    assert meta["Tracks"]
    assert meta["Tracks"][0]["tags"][0]["what"] == "kiwi"


# ---------------------------------------------------------------------------
# External corpora
# ---------------------------------------------------------------------------


def test_csv_dataset(tmp_path):
    from audio_training_tpu.corpus.otherdata import csv_dataset

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    tone_wav(audio_dir / "a.wav")
    tone_wav(audio_dir / "b.wav", freq=500)
    csv_file = tmp_path / "meta.csv"
    csv_file.write_text("filename,category\na.wav,rain\nb.wav,wind\n")
    out = tmp_path / "out"
    n = csv_dataset(csv_file, audio_dir, out)
    assert n == 2
    meta = json.loads((out / "a.txt").read_text())
    assert meta["Tracks"][0]["tags"][0]["what"] == "rain"


def test_tier1_data(tmp_path):
    from audio_training_tpu.corpus.otherdata import tier1_data

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    tone_wav(audio_dir / "x.wav", dur=6.0)
    ann = tmp_path / "ann.csv"
    ann.write_text(
        "Filename,Label,Starttime,Endtime\n"
        "x.wav,kiwi,1.0,2.5\nx.wav,kiwi,4.0,5.0\n"
    )
    out = tmp_path / "out"
    n = tier1_data(ann, audio_dir, out)
    assert n == 1
    meta = json.loads((out / "x.txt").read_text())
    assert len(meta["Tracks"]) == 2
    assert meta["Tracks"][0]["start"] == 1.0


def test_folder_dataset(tmp_path):
    from audio_training_tpu.corpus.otherdata import folder_dataset

    (tmp_path / "kiwi").mkdir()
    tone_wav(tmp_path / "kiwi" / "a.wav")
    n = folder_dataset(tmp_path)
    assert n == 1
    meta = json.loads((tmp_path / "kiwi" / "a.txt").read_text())
    assert meta["Tracks"][0]["tags"][0]["what"] == "kiwi"


def test_flickr_data(tmp_path):
    """Speech corpora ingest wholesale as ``human`` with one full-length
    track per file (otherdata.flickr_data, otherdata.py:488-572)."""
    from audio_training_tpu.corpus.otherdata import flickr_data

    audio_dir = tmp_path / "flickr_audio"
    (audio_dir / "wavs").mkdir(parents=True)
    tone_wav(audio_dir / "wavs" / "s1.wav", freq=300, dur=2.0)
    tone_wav(audio_dir / "wavs" / "s2.wav", freq=400, dur=3.0)
    (audio_dir / "wavs" / "notes.csv").write_text("not audio\n")
    n = flickr_data(audio_dir)
    assert n == 2
    meta = json.loads((audio_dir / "wavs" / "s1.txt").read_text())
    assert meta["id"] == "flickr-s1"
    track = meta["Tracks"][0]
    assert track["tags"][0]["what"] == "human"
    assert track["start"] == 0
    assert track["end"] == pytest.approx(2.0, abs=0.01)
    # loadable by the dataset model
    from audio_training_tpu.config import SamplingConfig
    from audio_training_tpu.corpus.dataset import AudioDataset

    ds = AudioDataset("flickr", SamplingConfig(tighten_tracks=False,
                                               filter_rms=False))
    ds.load_meta(audio_dir)
    assert ds.labels == {"human"}
    assert len(ds.recs) == 2


def test_chime_data(tmp_path):
    """CHiME-home chunk letters map to human/noise via majority-vote
    annotations (otherdata.chime_data, otherdata.py:624-756)."""
    from audio_training_tpu.corpus.otherdata import chime_data

    audio_dir = tmp_path / "chunks"
    audio_dir.mkdir()
    tone_wav(audio_dir / "chunk1.wav", freq=600, dur=4.0)
    tone_wav(audio_dir / "chunk2.wav", freq=700, dur=4.0)
    tone_wav(audio_dir / "chunk3.wav", freq=800, dur=4.0)
    csv_file = tmp_path / "chunks.csv"
    # c=child->human, v=TV->noise; chunk2 has only unknown letters (skipped
    # labels), chunk4 has no audio on disk
    csv_file.write_text(
        "chunk1,cv\n"
        "chunk2,zz\n"
        "chunk3,m\n"
        "chunk4,c\n"
    )
    n = chime_data(csv_file, audio_dir)
    assert n == 2
    meta1 = json.loads((audio_dir / "chunk1.txt").read_text())
    whats = sorted(t["tags"][0]["what"] for t in meta1["Tracks"])
    assert whats == ["human", "noise"]  # multi-label chunk
    meta3 = json.loads((audio_dir / "chunk3.txt").read_text())
    assert [t["tags"][0]["what"] for t in meta3["Tracks"]] == ["human"]
    assert not (audio_dir / "chunk2.txt").exists()


def test_mix_noise_snr():
    from audio_training_tpu.corpus.otherdata import mix_noise

    rng = np.random.default_rng(0)
    sig = np.sin(2 * np.pi * 440 * np.arange(SR) / SR).astype(np.float32)
    noise = rng.standard_normal(SR // 2).astype(np.float32)
    mixed = mix_noise(sig, noise, snr_db=10.0, rng=rng)
    assert mixed.shape == sig.shape
    added = mixed - sig
    snr = 10 * np.log10((sig**2).mean() / (added**2).mean())
    assert snr == pytest.approx(10.0, abs=1.0)


# ---------------------------------------------------------------------------
# Tools
# ---------------------------------------------------------------------------


def test_split_audio_files(tmp_path):
    from audio_training_tpu.corpus.tools import split_audio_files

    tone_wav(tmp_path / "long.wav", dur=10.0)
    (tmp_path / "long.txt").write_text(json.dumps({"id": "long"}))
    out = tmp_path / "chunks"
    n = split_audio_files(tmp_path, out, chunk_seconds=4.0)
    assert n == 3  # 4+4+2
    meta = json.loads((out / "long-001.txt").read_text())
    assert meta["chunk_start"] == pytest.approx(4.0)


def test_export_anonymized_metadata(tmp_path):
    from audio_training_tpu.corpus.tools import export_anonymized_metadata

    meta = {
        "id": "r1", "deviceId": 42, "groupId": 7, "duration": 10,
        "location": {"lat": -41.2865, "lng": 174.7762},
        "Tracks": [{"start": 0, "end": 2,
                    "tags": [{"what": "kiwi"}]}],
    }
    (tmp_path / "r1.txt").write_text(json.dumps(meta))
    out = tmp_path / "anon"
    n = export_anonymized_metadata(tmp_path, out)
    assert n == 1
    anon = json.loads((out / "r1.json").read_text())
    assert anon["location"]["lat"] == pytest.approx(-41.3)  # fuzzed to 0.1
    assert anon["device_uid"] != "42" and len(anon["device_uid"]) == 12
    assert anon["tracks"][0]["tags"] == ["kiwi"]


def test_audio_database(tmp_path):
    from audio_training_tpu.corpus.tools import AudioDatabase

    db = AudioDatabase(tmp_path / "recs.h5")
    assert not db.has_rec("r1")
    frames = np.arange(100, dtype=np.float32)
    db.add_rec("r1", frames, SR, {"label": "kiwi"})
    assert db.has_rec("r1")
    got, sr, meta = db.get_rec("r1")
    np.testing.assert_array_equal(got, frames)
    assert sr == SR and meta["label"] == "kiwi"


def test_label_tools():
    from audio_training_tpu.corpus.tools import (
        counts_vs_accuracy,
        label_set_diff,
        labels_to_api_names,
    )

    d = label_set_diff(["a", "b"], ["b", "c"])
    assert d == {"only_first": ["a"], "only_second": ["c"], "common": ["b"]}
    names = labels_to_api_names(["morepo2"])
    assert names[0]  # resolved to some common name
    cm = np.array([[8, 2], [1, 9]])
    rows = counts_vs_accuracy(["x", "y"], {"x": 100}, cm)
    assert rows[0]["accuracy"] == 0.8


# ---------------------------------------------------------------------------
# Embedding pipeline + offline mixup
# ---------------------------------------------------------------------------


def test_embedding_stream(tmp_path):
    from audio_training_tpu.data import SampleRecord, encode_sample, write_tfrecords
    from audio_training_tpu.data.embeddings import EmbeddingStream, resample_per_label
    from audio_training_tpu.taxonomy.labels import build_label_space
    from audio_training_tpu.taxonomy.ontology import load_ontology

    rng = np.random.default_rng(0)
    recs = []
    for i in range(6):
        recs.append(encode_sample(SampleRecord(
            raw=np.zeros(10, np.float32),
            tags=["kiwi" if i % 2 else "morepo2"],
            embeddings=rng.standard_normal(1280).astype(np.float32),
            logits=np.zeros(4, np.float32),
        )))
    write_tfrecords(tmp_path / "e.tfrecord", recs)
    space = build_label_space(load_ontology(), ["bird", "kiwi", "morepo2"])
    stream = EmbeddingStream([tmp_path / "e.tfrecord"], space)
    items = list(stream)
    assert len(items) == 6
    emb, y = items[0]
    assert emb.shape == (1280,)
    assert y.sum() >= 1
    resampled = resample_per_label(items, target=4, seed=0)
    assert len(resampled) > 0


def test_create_augmented_set(tmp_path):
    from audio_training_tpu.data import SampleRecord, encode_sample, write_tfrecords
    from audio_training_tpu.data.augmented import create_augmented_set
    from audio_training_tpu.data import read_tfrecords, decode_sample

    rng = np.random.default_rng(0)
    recs = [
        encode_sample(SampleRecord(
            raw=rng.standard_normal(1000).astype(np.float32),
            tags=[tag], rec_id=f"r{i}",
        ))
        for i, tag in enumerate(["kiwi", "morepo2", "rain", "noise"])
    ]
    src = tmp_path / "src.tfrecord"
    write_tfrecords(src, recs)
    out = tmp_path / "mixed"
    n = create_augmented_set([src], out, seed=1)
    assert n > 0
    shard = next(out.glob("*.tfrecord"))
    mixed = decode_sample(next(iter(read_tfrecords(shard))))
    assert mixed.raw.size == 1000


# ---------------------------------------------------------------------------
# Denoise / profiling / checker
# ---------------------------------------------------------------------------


def test_spectral_gate_reduces_noise():
    from audio_training_tpu.ops.denoise import spectral_gate

    rng = np.random.default_rng(0)
    t = np.arange(SR * 2) / SR
    # intermittent chirp (quiet frames exist for the noise profile)
    clean = (np.sin(2 * np.pi * 800 * t) * (t % 1.0 < 0.4)).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal(len(t)).astype(np.float32)
    out = np.asarray(spectral_gate(noisy[None], n_fft=512, hop=128))[0]
    # residual off-tone energy should drop
    spec_noisy = np.abs(np.fft.rfft(noisy))
    spec_out = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(noisy), 1 / SR)
    off_band = (freqs < 600) | (freqs > 1000)
    assert spec_out[off_band].sum() < 0.6 * spec_noisy[off_band].sum()
    tone_bin = np.argmin(abs(freqs - 800))
    assert spec_out[tone_bin] > 0.5 * spec_noisy[tone_bin]


def test_time_fn_and_memory():
    import jax.numpy as jnp

    from audio_training_tpu.models import build_model
    from audio_training_tpu.train import create_train_state
    from audio_training_tpu.utils.profiling import state_memory_bytes, time_fn

    stats = time_fn(lambda x: (x * 2).sum(), jnp.ones((100,)), iters=3)
    assert stats["mean_ms"] > 0
    spec = build_model("embeddings", num_labels=4)
    state = create_train_state(spec.module, (jnp.zeros((1, 16)),))
    mem = state_memory_bytes(state)
    assert mem["params_bytes"] > 0
    assert mem["total_bytes"] >= mem["params_bytes"]


def test_trace_summary_and_fusion_map(tmp_path):
    """device_event_summary aggregates a real jax.profiler trace;
    fusion_layer_map resolves compiled op names to layer metadata."""
    import jax
    import jax.numpy as jnp

    from audio_training_tpu.utils.profiling import (
        device_event_summary,
        fusion_layer_map,
        trace,
    )

    def fn(x):
        return jnp.tanh(x @ x.T).sum()

    x = jnp.ones((64, 64))
    run = jax.jit(fn)
    float(run(x))  # warm outside the trace
    with trace(tmp_path):
        float(run(x))
    # forced-CPU platform: device events land under the TFRT CPU pid
    rows = device_event_summary(tmp_path, device_substr="CPU")
    assert rows and all(ms >= 0 for _, ms in rows)

    lmap = fusion_layer_map(fn, x)
    assert any("dot" in op or "tanh" in op for op in lmap.values())


def test_check_pipeline():
    from audio_training_tpu.utils.debug import check_pipeline

    good = np.zeros((2, 10), np.float32)
    good[:, 0] = 1.0
    bad = np.full((1, 10), np.nan, np.float32)
    y = np.eye(2, 3, dtype=np.float32)
    res = check_pipeline(
        [(good, y), (bad, y[:1])], ["a", "b", "c"],
    )
    assert res.checked == 3
    assert res.nan_count == 1
    assert not res.ok
    assert res.label_counts.get("a") == 2  # one per batch


def test_merge_again_rules():
    from audio_training_tpu.detect.signals import Signal, merge_again

    # newcomer covers >50% of current -> replaces it (otherdata.py:209-212)
    a = Signal(0.0, 1.0, 1000, 2000, 1)
    b = Signal(0.2, 3.0, 1000, 2000, 1)
    out = merge_again([a, b])
    assert out == [b]

    # >50% freq overlap with some time overlap -> extends current end
    c = Signal(0.0, 2.0, 1000, 2000, 1)
    d = Signal(1.8, 2.5, 1100, 1900, 1)
    out = merge_again([c, d])
    assert out == [c] and c.end == 2.5

    # gap-separated tracks each appear ONCE (reference double-append fixed)
    e = Signal(0.0, 1.0, 1000, 2000, 1)
    f = Signal(5.0, 6.0, 1000, 2000, 1)
    out = merge_again([e, f])
    assert out == [e, f]


def test_signal_length_for_segment():
    from audio_training_tpu.corpus.enrich import signal_length_for_segment
    from audio_training_tpu.detect.signals import Signal

    tracks = [Signal(1.0, 2.0, 0, 100, 1), Signal(2.5, 4.0, 0, 100, 1)]
    # window [1.5, 4.5): the reference SKIPS tracks that start before the
    # window unless they also outlast it (otherdata.py:1551-1552), so only
    # track 2 counts -> 1.5 s
    assert signal_length_for_segment(tracks, 1.5, 4.5) == pytest.approx(1.5)
    # a track straddling the window end does count
    assert signal_length_for_segment(
        [Signal(1.0, 5.0, 0, 100, 1)], 1.5, 4.5
    ) == pytest.approx(3.0)
    # window past all tracks
    assert signal_length_for_segment(tracks, 5.0, 8.0) == 0.0


def test_generate_best_track(tmp_path):
    from audio_training_tpu.corpus.enrich import (
        add_signal_meta,
        generate_best_track,
    )

    # two chirp bursts; the denser region should win the best-3s window
    x = np.zeros(int(10 * SR), np.float32)
    t = np.arange(int(1.2 * SR)) / SR
    for start in (4.0, 5.5):
        i = int(start * SR)
        x[i : i + len(t)] += np.sin(2 * np.pi * 1500 * t).astype(np.float32)
    x += 0.005 * np.random.default_rng(1).standard_normal(len(x)).astype(
        np.float32
    )
    save_wav(tmp_path / "b.wav", x, SR)
    (tmp_path / "b.txt").write_text(json.dumps({"id": "b", "label": "weka"}))
    assert add_signal_meta(tmp_path / "b.txt", target_sr=SR)
    assert generate_best_track(tmp_path / "b.txt")
    meta = json.loads((tmp_path / "b.txt").read_text())
    bt = meta["best_track"]
    assert bt["tags"][0]["what"] == "weka"
    assert bt["end"] == bt["start"] + 3
    # the chosen window overlaps the signal region
    assert bt["start"] < 7.0 and bt["end"] > 4.0
    assert bt["signal_length"] > 0


def test_ingest_cli(tmp_path):
    """otherdata.main CLI surface (otherdata.py:1832-1989)."""
    import csv as csvmod

    from audio_training_tpu.cli.ingest import main as ingest_main

    # csv corpus mode
    audio_dir = tmp_path / "audio"; audio_dir.mkdir()
    tone_wav(audio_dir / "a.wav", freq=700, dur=2.0)
    csv_f = tmp_path / "meta.csv"
    with open(csv_f, "w", newline="") as f:
        w = csvmod.writer(f)
        w.writerow(["filename", "category"])
        w.writerow(["a.wav", "rain"])
    out = tmp_path / "out"
    rc = ingest_main(["-d", str(audio_dir), "--csv",
                      "--csv-file", str(csv_f), "--out", str(out)])
    assert rc == 0
    meta = json.loads((out / "a.txt").read_text())
    assert meta["Tracks"][0]["tags"][0]["what"] == "rain"

    # enrichment mode over the ingested corpus
    rc = ingest_main(["-d", str(out), "--signal", "--rms"])
    assert rc == 0
    meta = json.loads((out / "a.txt").read_text())
    assert "signal" in meta

    # missing mode errors cleanly
    assert ingest_main(["-d", str(out)]) == 1


def test_analyze_rms(tmp_path):
    """RMS quality report over enriched sidecars (otherdata.analyze_rms,
    otherdata.py:1077-1151)."""
    from audio_training_tpu.corpus.enrich import analyze_rms, process_rms

    tone_wav(tmp_path / "q.wav", freq=900, dur=5.0)
    (tmp_path / "q.txt").write_text(json.dumps({
        "id": "q",
        "Tracks": [{"id": "t0", "start": 0.0, "end": 5.0,
                    "tags": [{"what": "morepork", "automatic": False}]}],
    }))
    assert process_rms(tmp_path / "q.txt", target_sr=SR)
    report = analyze_rms(tmp_path / "q.txt")
    assert len(report) == 1
    r = report[0]
    assert r["used"] == "bird_rms"  # morepork is a bird tag
    assert r["stddev_percent"] >= 0 and isinstance(r["low_stddev"], bool)
    assert r["best_offset_s"] >= 0
    # missing sidecar -> empty report, no raise
    assert analyze_rms(tmp_path / "absent.txt") == []


def test_plot_track_rms(tmp_path):
    from audio_training_tpu.corpus.enrich import process_rms
    from audio_training_tpu.eval.plots import plot_track_rms

    tone_wav(tmp_path / "p.wav", freq=700, dur=4.0)
    (tmp_path / "p.txt").write_text(json.dumps({
        "id": "p",
        "Tracks": [{"id": "t0", "start": 0.0, "end": 4.0,
                    "tags": [{"what": "rain", "automatic": False}]}],
    }))
    assert process_rms(tmp_path / "p.txt", target_sr=SR)
    written = plot_track_rms(tmp_path / "p.txt", tmp_path / "plots")
    assert len(written) == 1 and written[0].stat().st_size > 1000


def test_redo_csv(tmp_path):
    from audio_training_tpu.corpus.otherdata import redo_csv

    audio_dir = tmp_path / "a"; audio_dir.mkdir()
    tone_wav(audio_dir / "x.wav", dur=2.0)
    src = tmp_path / "in.csv"
    src.write_text("filename,label,quality\nx.wav,kiwi,good\n")
    out = tmp_path / "out.csv"
    assert redo_csv(src, audio_dir, out) == 1
    rows = out.read_text().strip().splitlines()
    cols = rows[1].split(",")
    assert cols[0].endswith("x.wav") and audio_dir.name in cols[0]
    assert abs(float(cols[3]) - 2.0) < 0.01  # duration inserted at col 3
    # missing audio raises like the reference
    src.write_text("filename,label,quality\nmissing.wav,kiwi,good\n")
    with pytest.raises(FileNotFoundError):
        redo_csv(src, audio_dir, out)


def test_feature_stream(tmp_path):
    """FeatureStream decodes (short, mid, y) for the cnn-features models
    (tfdataset.py:1041-1111)."""
    from audio_training_tpu.data.embeddings import (
        MID_FEATURES_SHAPE,
        SHORT_FEATURES_SHAPE,
        FeatureStream,
    )
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.taxonomy.labels import build_label_space
    from audio_training_tpu.taxonomy.ontology import load_ontology

    rng = np.random.default_rng(0)
    space = build_label_space(load_ontology(), ["bird", "kiwi", "noise"])
    recs = [
        encode_sample(SampleRecord(
            raw=np.zeros(0, np.float32), tags=["kiwi"], rec_id=f"r{i}",
            short_features=rng.standard_normal(
                SHORT_FEATURES_SHAPE).astype(np.float32),
            mid_features=rng.standard_normal(
                MID_FEATURES_SHAPE).astype(np.float32),
        ))
        for i in range(3)
    ]
    shard = tmp_path / "f.tfrecord"
    write_tfrecords(shard, recs)
    items = list(FeatureStream([shard], space))
    assert len(items) == 3
    short, mid, y = items[0]
    assert short.shape == SHORT_FEATURES_SHAPE
    assert mid.shape == MID_FEATURES_SHAPE
    assert y.sum() >= 1


def test_streams_shuffle_and_determinism(tmp_path):
    """Embedding/Feature streams reshuffle between passes and are
    seed-deterministic across instances."""
    from audio_training_tpu.data.embeddings import EmbeddingStream
    from audio_training_tpu.data.schema import SampleRecord, encode_sample
    from audio_training_tpu.data.tfrecord import write_tfrecords
    from audio_training_tpu.taxonomy.labels import build_label_space
    from audio_training_tpu.taxonomy.ontology import load_ontology

    space = build_label_space(load_ontology(), ["bird", "kiwi", "noise"])
    for shard in range(3):
        recs = [
            encode_sample(SampleRecord(
                raw=np.zeros(0, np.float32), tags=["kiwi"],
                rec_id=f"s{shard}r{i}",
                embeddings=np.full(1280, shard * 10 + i, np.float32),
            ))
            for i in range(4)
        ]
        write_tfrecords(tmp_path / f"{shard}.tfrecord", recs)
    shards = sorted(tmp_path.glob("*.tfrecord"))

    def order(stream, n):
        import itertools

        return [float(e[0][0]) for e in itertools.islice(iter(stream), n)]

    a = order(EmbeddingStream(shards, space, seed=5, loop=True), 24)
    b = order(EmbeddingStream(shards, space, seed=5, loop=True), 24)
    assert a == b  # same seed -> same sequence
    assert a[:12] != a[12:24]  # second pass reshuffled
    assert sorted(a[:12]) == sorted(a[12:24])  # ... but same items
    c = order(EmbeddingStream(shards, space, seed=9, loop=True), 12)
    assert c != a[:12]  # different seed -> different order


class _FakeResp:
    def __init__(self, payload=None, content=b""):
        self._payload = payload
        self.content = content
        self.ok = True

    def json(self):
        return self._payload

    def raise_for_status(self):
        pass


class _FakeSession:
    """Minimal requests.Session stand-in: routes by URL prefix."""

    def __init__(self, routes):
        self.routes = routes  # [(prefix, response-or-callable)]
        self.calls = []

    def get(self, url, params=None, headers=None, timeout=None):
        self.calls.append((url, params, headers))
        for prefix, resp in self.routes:
            if url.startswith(prefix):
                return resp(url, params) if callable(resp) else resp
        raise AssertionError(f"unrouted URL {url}")


def test_download_xeno_canto(tmp_path):
    """Sidecar/download contract of xenodownloader.py:8-92: audio file +
    .txt JSON with weak label, scientific name, quality and location;
    file-less API entries skipped; pagination followed; max cutoff."""
    from audio_training_tpu.corpus.downloaders import (
        XENO_API,
        download_xeno_canto,
    )

    def rec(i, with_file=True):
        r = {
            "id": str(i), "en": "Morepork", "gen": "Ninox",
            "sp": "novaeseelandiae", "q": "A", "length": "0:12",
            "lat": "-36.1", "lng": "174.2", "file-name": f"{i}.mp3",
        }
        if with_file:
            r["file"] = f"https://dl.test/{i}.mp3"
        return r

    def api(url, params):
        page = params["page"]
        assert params["query"] == "morepork"
        if page == 1:
            return _FakeResp({"numPages": 2,
                              "recordings": [rec(11), rec(12, False)]})
        return _FakeResp({"numPages": 2, "recordings": [rec(13)]})

    session = _FakeSession([
        (XENO_API, api),
        ("https://dl.test/", _FakeResp(content=b"MP3DATA")),
    ])
    n = download_xeno_canto("morepork", tmp_path, max_recordings=5,
                            session=session)
    assert n == 2  # the file-less entry is skipped
    assert (tmp_path / "xc11.mp3").read_bytes() == b"MP3DATA"
    meta = json.loads((tmp_path / "xc11.txt").read_text())
    assert meta["label"] == "Morepork"
    assert meta["scientific"] == "Ninox novaeseelandiae"
    assert meta["quality"] == "A"
    assert meta["location"] == {"lat": "-36.1", "lng": "174.2"}
    assert meta["Tracks"] == []
    assert (tmp_path / "xc13.mp3").exists()  # page 2 followed

    # cutoff honored and existing files not re-downloaded
    session2 = _FakeSession([(XENO_API, api),
                             ("https://dl.test/", _FakeResp(content=b"X"))])
    assert download_xeno_canto("morepork", tmp_path, max_recordings=1,
                               session=session2) == 1
    assert (tmp_path / "xc11.mp3").read_bytes() == b"MP3DATA"  # kept


def test_download_ebird_species_lists(tmp_path):
    """ebird_species.json format (ebirdspecies.py:6-69): list of
    {code, bounds, species} entries, API token in headers."""
    from audio_training_tpu.corpus.downloaders import (
        download_ebird_species_lists,
    )

    def api(url, params):
        if "/product/spplist/" in url:
            return _FakeResp(["kiwi1", "morepo2"])
        return _FakeResp(
            {"bounds": {"minX": 166.0, "minY": -47.5,
                        "maxX": 179.0, "maxY": -34.0}}
        )

    session = _FakeSession([("https://api.ebird.org/v2", api)])
    out_file = tmp_path / "ebird_species.json"
    out = download_ebird_species_lists(
        "TESTKEY", out_file, regions=["NZ-AUK"], session=session
    )
    assert all(h["X-eBirdApiToken"] == "TESTKEY"
               for _, _, h in session.calls)
    data = json.loads(out_file.read_text())
    assert data == out["regions"]
    assert data[0]["code"] == "NZ-AUK"
    assert data[0]["bounds"] == [166.0, -47.5, 179.0, -34.0]
    assert data[0]["species"] == ["kiwi1", "morepo2"]


def test_plot_mel_and_signals(tmp_path):
    """Agg-backend plot helpers (plot_utils.py:23,116) write non-empty
    PNGs with signal rectangles placed from Signal time/freq bounds."""
    from audio_training_tpu.detect.signals import Signal
    from audio_training_tpu.eval.plots import (
        plot_mel,
        plot_mel_signals,
        plot_waveform,
    )

    rng = np.random.default_rng(0)
    mel = rng.random((20, 50)).astype(np.float32)
    p1 = tmp_path / "mel.png"
    plot_mel(mel, p1, title="t")
    assert p1.stat().st_size > 0

    sigs = [Signal(0.5, 1.2, 1000.0, 4000.0)]
    p2 = tmp_path / "sig.png"
    fig = plot_mel_signals(mel, sigs, path=p2)
    assert p2.stat().st_size > 0
    assert len(fig.axes[0].patches) == 1

    p3 = tmp_path / "wave.png"
    plot_waveform(rng.standard_normal(480).astype(np.float32), 480, p3)
    assert p3.stat().st_size > 0


# ---------------------------------------------------------------------------
# TensorBoard event files (TF-free writer, utils/tensorboard.py)
# ---------------------------------------------------------------------------


def _tiny_png():
    # minimal real PNG via matplotlib (the same producer as the confusion
    # images the fit loop streams)
    import io

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(1, 1))
    ax.imshow(np.arange(4).reshape(2, 2))
    buf = io.BytesIO()
    fig.savefig(buf, format="png")
    plt.close(fig)
    return buf.getvalue()


def test_tb_event_file_roundtrip(tmp_path):
    """Write scalars/histogram/image; parse back with our own reader."""
    from audio_training_tpu.utils.tensorboard import (
        TBEventWriter,
        png_dimensions,
        read_events,
    )

    png = _tiny_png()
    with TBEventWriter(tmp_path) as tb:
        tb.add_scalar("loss", 0.5, 0)
        tb.add_scalars({"loss": 0.25, "val_loss": 0.5, "skipme": "str"}, 1)
        tb.add_histogram_counts("weights/w", [1, 2, 3], [0.0, 1.0, 2.0, 3.0],
                                step=1)
        tb.add_histogram_values("weights/v", np.arange(100.0), step=1)
        tb.add_image("confusion", png, step=1)
        path = tb.path

    events = read_events(path)
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = {
        (e["step"], t): v
        for e in events for t, v in e.get("scalars", {}).items()
    }
    assert scalars[(0, "loss")] == 0.5
    assert scalars[(1, "loss")] == 0.25
    assert scalars[(1, "val_loss")] == 0.5
    assert (1, "skipme") not in scalars  # non-float dropped
    histos = {
        t: h for e in events for t, h in e.get("histos", {}).items()
    }
    assert histos["weights/w"]["num"] == 6.0
    assert histos["weights/w"]["bucket"] == [1.0, 2.0, 3.0]
    assert histos["weights/w"]["bucket_limit"] == [1.0, 2.0, 3.0]
    assert histos["weights/v"]["num"] == 100.0
    images = {
        t: i for e in events for t, i in e.get("images", {}).items()
    }
    img = images["confusion/image"]
    assert img["png"] == png
    assert (img["height"], img["width"]) == png_dimensions(png)


def test_tb_event_file_reads_back_through_real_tensorboard(tmp_path):
    """Oracle: the actual tensorboard package (bundled, TF-free loader)
    parses our event file — the wire format is the real one, not just
    self-consistent."""
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader,
    )
    from tensorboard.compat.proto import event_pb2

    from audio_training_tpu.utils.tensorboard import TBEventWriter

    png = _tiny_png()
    with TBEventWriter(tmp_path) as tb:
        tb.add_scalars({"loss": 0.125, "acc": 0.75}, 3)
        tb.add_histogram_counts("w", [4, 5], [0.0, 0.5, 1.0], step=3)
        tb.add_image("cm", png, step=3)
        path = tb.path

    events = [
        event_pb2.Event.FromString(raw)
        for raw in RawEventFileLoader(str(path)).Load()
    ]
    assert events[0].file_version == "brain.Event:2"
    scalars = {
        v.tag: v.simple_value
        for e in events for v in e.summary.value
        if v.HasField("simple_value")
    }
    assert scalars == {"loss": 0.125, "acc": 0.75}
    assert all(e.step == 3 for e in events[1:])
    histos = {
        v.tag: v.histo for e in events for v in e.summary.value
        if v.HasField("histo")
    }
    assert histos["w"].num == 9.0
    assert list(histos["w"].bucket) == [4.0, 5.0]
    assert list(histos["w"].bucket_limit) == [0.5, 1.0]
    images = {
        v.tag: v.image for e in events for v in e.summary.value
        if v.HasField("image")
    }
    assert images["cm/image"].encoded_image_string == png
