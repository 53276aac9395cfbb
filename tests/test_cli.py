"""CLI end-to-end: synthetic WAV corpus -> build -> train (2 epochs) ->
freeze -> predict -> weak eval.  The full reference workflow at tiny scale."""

import json

import numpy as np
import pytest

from audio_training_tpu.corpus.audioio import save_wav

# whole module is the slow tier: real (tiny) trainings end-to-end
pytestmark = pytest.mark.slow

SR = 8000


def write_corpus(root, n_recs=12):
    rng = np.random.default_rng(0)
    labels = ["kiwi", "morepork", "rain"]
    freqs = {"kiwi": 1200, "morepork": 800, "rain": 3000}
    for i in range(n_recs):
        what = labels[i % 3]
        dur = 8.0
        audio = (0.05 * rng.standard_normal(int(dur * SR))).astype(np.float32)
        t = np.arange(int(5 * SR)) / SR
        tone = np.sin(2 * np.pi * freqs[what] * t).astype(np.float32)
        audio[int(0.5 * SR) : int(5.5 * SR)] += tone
        save_wav(root / f"rec{i}.wav", audio, SR)
        meta = {
            "id": f"rec{i}",
            "duration": dur,
            "Tracks": [{
                "id": f"t{i}",
                "start": 0.5,
                "end": 5.5,
                "tags": [{"what": what, "automatic": False}],
            }],
        }
        (root / f"rec{i}.txt").write_text(json.dumps(meta))
    return labels


@pytest.fixture(scope="module")
def built_dataset(tmp_path_factory):
    from audio_training_tpu.cli.build import main as build_main

    root = tmp_path_factory.mktemp("corpus")
    out = tmp_path_factory.mktemp("out")
    write_corpus(root)
    rc = build_main([
        str(out), "-d", str(root),
        "--seg-length", "3", "--stride", "1",
        "--mels", "96", "--fmin", "100", "--fmax", "3500",
        "--hop-length", "100",
        "--dont-tighten-tracks", "--dont-filter-rms",
        "--workers", "1",
    ])
    assert rc == 0
    data_dir = out / "training-data"
    assert (data_dir / "training-meta.json").exists()
    return data_dir


@pytest.fixture(scope="module")
def built_dataset_features(tmp_path_factory):
    """Tiny corpus built with --add-features (hand-crafted short/mid feature
    tensors per record) and no resampling (--sr matches the WAVs)."""
    from audio_training_tpu.cli.build import main as build_main

    root = tmp_path_factory.mktemp("corpus_f")
    out = tmp_path_factory.mktemp("out_f")
    write_corpus(root, n_recs=9)
    rc = build_main([
        str(out), "-d", str(root),
        "--sr", str(SR), "--n-fft", "512",
        "--seg-length", "3", "--stride", "1",
        "--mels", "96", "--fmin", "100", "--fmax", "3500",
        "--hop-length", "100",
        "--dont-tighten-tracks", "--dont-filter-rms",
        "--workers", "1", "--add-features",
    ])
    assert rc == 0
    return out / "training-data"


def test_train_cli_merge_model(built_dataset_features, tmp_path):
    """End-to-end CLI training of the 'merge' model: the joint
    badwinner2+feature-towers model (audiomodel.py:674-708) trains from a
    built-with-features dataset, with the featurizer geometry picked up from
    training-meta.json."""
    from audio_training_tpu.cli.train import main as train_main

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(json.dumps({"compute_dtype": "float32"}))
    rc = train_main([
        "mergecli", "-d", str(built_dataset_features),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--model-name", "merge", "--epochs", "1", "--steps-per-epoch", "2",
        "--batch-size", "4", "--lr", "0.001",
        "-c", str(cfg_file),
    ])
    assert rc == 0
    run_dir = tmp_path / "ckpt" / "mergecli"
    meta = json.loads((run_dir / "metadata.txt").read_text())
    assert meta["name"] == "merge"
    # featurizer defaults came from the build's training-meta.json
    assert meta["sample_rate"] == SR
    assert meta["n_fft"] == 512
    assert (run_dir / "chkpt").exists()


def test_build_output_structure(built_dataset):
    meta = json.loads((built_dataset / "training-meta.json").read_text())
    assert set(meta["counts"]) == {"train", "validation", "test"}
    assert (built_dataset / "train").glob("*.tfrecord")
    # labels resolved to ebird ids
    assert "morepo2" in meta["labels"]


@pytest.fixture(scope="module")
def trained_run(built_dataset, tmp_path_factory):
    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.train.harness import train_run

    ckpt_root = tmp_path_factory.mktemp("ckpt")
    featurizer = FeaturizerConfig(
        sr=SR, n_fft=512, hop_length=100, n_mels=96, fmin=100, fmax=3500,
    )
    cfg = TrainConfig(
        model_name="badwinner2", batch_size=8, learning_rate=1e-3,
        epochs=2, compute_dtype="float32", epoch_confusion=True,
    )
    result = train_run(
        [built_dataset], "testrun", checkpoint_root=ckpt_root,
        train_cfg=cfg, featurizer=featurizer, epochs=2, steps_per_epoch=4,
    )
    return result


def test_train_run_outputs(trained_run):
    run_dir = trained_run.run_dir
    assert (run_dir / "metadata.txt").exists()
    assert (run_dir / "chkpt").exists()
    assert (run_dir / "history.json").exists()
    meta = json.loads((run_dir / "metadata.txt").read_text())
    assert meta["n_fft"] == 512
    assert meta["ebird_labels"] == trained_run.labels
    assert "history" in meta
    assert "kiwi" in trained_run.labels and "bird" in trained_run.labels
    # per-epoch validation confusion artifacts (epoch_confusion=True;
    # audiomodel.log_confusion_matrix parity)
    epoch_cms = sorted((run_dir / "epoch-confusion").glob("epoch_*.npy"))
    assert len(epoch_cms) == 2  # one per epoch
    assert (run_dir / "epoch-confusion" / "epoch_000.png").exists()
    # live observability: the scalar stream is appended per epoch (one CSV
    # row each) and the frontend weight-histogram jsonl has an entry per
    # epoch — both watchable mid-run (audiomodel.py:556-558, 2583-2592)
    csv_lines = (run_dir / "training-log.csv").read_text().splitlines()
    assert len(csv_lines) == 3  # header + 2 epochs
    header = csv_lines[0].split(",")
    assert header[0] == "epoch" and "loss" in header and "lr" in header
    assert any(h.startswith("val_") for h in header)
    hists = [json.loads(l) for l in
             (run_dir / "weight-hists.jsonl").read_text().splitlines()]
    assert [h["epoch"] for h in hists] == [0, 1]
    assert any("a_power" in k for k in hists[0])


def test_freeze_and_predict(trained_run, tmp_path):
    from audio_training_tpu.cli.freeze import main as freeze_main
    from audio_training_tpu.cli.predict import load_predictor, predict_file

    deploy = tmp_path / "deploy"
    rc = freeze_main([str(trained_run.run_dir), str(deploy), "-w", "chkpt"])
    assert rc == 0
    assert (deploy / "audioModel").exists()

    predictor, meta = load_predictor(deploy, "audioModel")
    assert predictor.cfg.n_fft == 512

    # synthetic recording with a strong tone
    rng = np.random.default_rng(1)
    t = np.arange(SR * 6) / SR
    frames = (np.sin(2 * np.pi * 1200 * t) * (t < 3)).astype(np.float32)
    frames += 0.01 * rng.standard_normal(len(frames)).astype(np.float32)
    wav = tmp_path / "test.wav"
    save_wav(wav, frames, SR)
    track_meta, speech_score = predict_file(predictor, wav)
    assert isinstance(track_meta, list)
    assert speech_score is None  # no scorer passed
    for tm in track_meta:
        assert "start" in tm and "predictions" in tm


def test_predict_cli_json_out(trained_run, tmp_path):
    from audio_training_tpu.cli.predict import main as predict_main

    rng = np.random.default_rng(2)
    t = np.arange(SR * 5) / SR
    frames = (np.sin(2 * np.pi * 900 * t) * (t % 3 < 1.5)).astype(np.float32)
    frames += 0.02 * rng.standard_normal(len(frames)).astype(np.float32)
    wav = tmp_path / "p.wav"
    save_wav(wav, frames, SR)
    out_json = tmp_path / "preds.json"
    rc = predict_main([
        str(trained_run.run_dir), "--file", str(wav), "-w", "chkpt",
        "--json-out", str(out_json),
    ])
    assert rc == 0
    assert out_json.exists()
    data = json.loads(out_json.read_text())
    assert str(wav) in data


def test_debug_cli(built_dataset):
    from audio_training_tpu.cli.debug import main as debug_main

    rc = debug_main([
        str(built_dataset), "--batches", "2", "--batch-size", "4",
        "--mels", "96", "--n-fft", "512", "--hop-length", "100",
    ])
    assert rc == 0


def test_predict_cli_denoise(trained_run, tmp_path):
    from audio_training_tpu.cli.predict import main as predict_main

    rng = np.random.default_rng(3)
    t = np.arange(SR * 4) / SR
    frames = (np.sin(2 * np.pi * 1000 * t) * (t % 2 < 1)).astype(np.float32)
    frames += 0.05 * rng.standard_normal(len(frames)).astype(np.float32)
    wav = tmp_path / "d.wav"
    save_wav(wav, frames, SR)
    rc = predict_main([
        str(trained_run.run_dir), "--file", str(wav), "-w", "chkpt",
        "--denoise",
    ])
    assert rc == 0


def test_finetune_from_weights(built_dataset, trained_run, tmp_path):
    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.train.harness import train_run

    featurizer = FeaturizerConfig(
        sr=SR, n_fft=512, hop_length=100, n_mels=96, fmin=100, fmax=3500,
    )
    cfg = TrainConfig(model_name="badwinner2", batch_size=8,
                      learning_rate=1e-3, compute_dtype="float32")
    result = train_run(
        [built_dataset], "finetune", checkpoint_root=tmp_path,
        train_cfg=cfg, featurizer=featurizer, epochs=1, steps_per_epoch=2,
        weights=trained_run.run_dir / "chkpt", confusion=False,
    )
    assert result.history["loss"]  # ran at least one epoch from the restored weights


def test_augment_cli(built_dataset, tmp_path):
    from audio_training_tpu.cli.augment import main as augment_main

    out = tmp_path / "mixed"
    rc = augment_main([str(built_dataset), str(out)])
    assert rc == 0
    assert list(out.glob("*.tfrecord"))


def test_cross_fold_train(built_dataset, tmp_path):
    from audio_training_tpu.config import FeaturizerConfig, TrainConfig
    from audio_training_tpu.train.harness import cross_fold_train

    featurizer = FeaturizerConfig(
        sr=SR, n_fft=512, hop_length=100, n_mels=96, fmin=100, fmax=3500,
    )
    cfg = TrainConfig(model_name="badwinner2", batch_size=8,
                      learning_rate=1e-3, compute_dtype="float32")
    results = cross_fold_train(
        [built_dataset], run_name="cv", folds=2, checkpoint_root=tmp_path,
        train_cfg=cfg, featurizer=featurizer, epochs=1, steps_per_epoch=2,
        confusion=False,
    )
    assert len(results) == 2
    assert (tmp_path / "cv-fold0" / "chkpt").exists()
    assert (tmp_path / "cv-fold1" / "chkpt").exists()

    # real k-fold: within a fold, train/validation/test files are disjoint;
    # across folds, every pooled file is validated exactly once and the
    # held-out test set is identical
    fold_files = [
        json.loads((tmp_path / f"cv-fold{i}" / "fold-files.json").read_text())
        for i in range(2)
    ]
    all_val = []
    for ff in fold_files:
        train, val, test = (
            set(ff["train"]), set(ff["validation"]), set(ff["test"])
        )
        assert train and val and test
        assert train.isdisjoint(val)
        assert train.isdisjoint(test)
        assert val.isdisjoint(test)
        all_val.extend(ff["validation"])
    assert fold_files[0]["test"] == fold_files[1]["test"]
    pool = set(fold_files[0]["train"]) | set(fold_files[0]["validation"])
    assert set(all_val) == pool and len(all_val) == len(pool)


def test_evaluate_cli_weak_and_compare(trained_run, tmp_path):
    from audio_training_tpu.cli.evaluate import main as evaluate_main

    # weak-label directory: <label>/<wav>
    weak_dir = tmp_path / "weak"
    rng = np.random.default_rng(5)
    for label, freq in (("kiwi", 1200), ("morepo2", 800)):
        d = weak_dir / label
        d.mkdir(parents=True)
        t = np.arange(SR * 6) / SR
        frames = (np.sin(2 * np.pi * freq * t) * (t % 3 < 1.2)).astype(
            np.float32
        )
        frames += 0.02 * rng.standard_normal(len(frames)).astype(np.float32)
        save_wav(d / "clip.wav", frames, SR)
    out_prefix = tmp_path / "conf" / "weak"
    rc = evaluate_main([
        "weak", str(trained_run.run_dir), str(weak_dir),
        "-w", "chkpt", "--out", str(out_prefix),
    ])
    assert rc == 0
    assert (out_prefix.parent / "weak-mean.npy").exists()

    # compare: two runs' confusions (self vs self -> tie)
    cm = np.array([[3, 1, 0], [0, 4, 0], [0, 0, 0]])
    for name in ("a", "b"):
        d = tmp_path / name
        d.mkdir()
        np.save(d / "confusion.npy", cm)
        (d / "metadata.txt").write_text(json.dumps(
            {"ebird_labels": ["kiwi", "morepo2"]}
        ))
    rc = evaluate_main([
        "compare", str(tmp_path / "a" / "confusion.npy"),
        str(tmp_path / "b" / "confusion.npy"),
    ])
    assert rc == 0


def test_evaluate_cli_strong_dir(trained_run, tmp_path):
    """Strong-label directory eval (audiomodel.evaluate_dir parity): sidecar
    track tags -> mean/max/counts confusions + raw dumps."""
    from audio_training_tpu.cli.evaluate import main as evaluate_main

    strong_dir = tmp_path / "strong"
    strong_dir.mkdir()
    write_corpus(strong_dir, n_recs=4)
    out_prefix = tmp_path / "conf" / "strong"
    rc = evaluate_main([
        "strong", str(trained_run.run_dir), str(strong_dir),
        "-w", "chkpt", "--out", str(out_prefix),
    ])
    assert rc == 0
    for suffix in ("mean", "max", "counts"):
        assert (out_prefix.parent / f"strong-{suffix}.npy").exists()
    assert (out_prefix.parent / "strong-raw.npy").exists()
    assert (out_prefix.parent / "strong-raw-confidences.pkl").exists()
    cm = np.load(out_prefix.parent / "strong-mean.npy")
    assert cm.sum() > 0  # tracks were actually evaluated


def test_predict_cli_folder_eval(trained_run, tmp_path):
    """best_track folder scoring (predict.predict_on_folder parity)."""
    from audio_training_tpu.cli.predict import main as predict_main

    folder = tmp_path / "folder"
    folder.mkdir()
    rng = np.random.default_rng(7)
    t = np.arange(SR * 6) / SR
    frames = (np.sin(2 * np.pi * 1200 * t) * (t < 5)).astype(np.float32)
    frames += 0.01 * rng.standard_normal(len(frames)).astype(np.float32)
    save_wav(folder / "r1.wav", frames, SR)
    (folder / "r1.txt").write_text(json.dumps({
        "id": "r1", "duration": 6.0,
        "best_track": {"start": 0.5, "end": 5.5,
                       "tags": [{"what": "kiwi"}]},
    }))
    out_json = tmp_path / "folder.json"
    rc = predict_main([
        str(trained_run.run_dir), "--folder-eval", str(folder),
        "-w", "chkpt", "--json-out", str(out_json),
    ])
    assert rc == 0
    data = json.loads(out_json.read_text())
    assert data["total_files"] == 1
    assert data["per_file"][0]["label"] == "kiwi"


def test_predict_cli_test_split(built_dataset, trained_run, tmp_path):
    """Pinned-split test evaluation (predict.predict_on_test parity):
    training-meta.json doubles as the split file (it carries rec ids per
    split, build.py:795-814)."""
    from audio_training_tpu.cli.predict import main as predict_main

    # the corpus dir is the parent fixture's raw dir; re-create a tiny one
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    write_corpus(corpus, n_recs=6)
    split = {"recs": {"train": ["rec0", "rec1"], "validation": ["rec2"],
                      "test": ["rec3", "rec4", "rec5"]}}
    split_file = tmp_path / "split.json"
    split_file.write_text(json.dumps(split))
    conf_out = tmp_path / "conf" / "test-split"
    rc = predict_main([
        str(trained_run.run_dir), "--test-split", str(split_file),
        "--data-dir", str(corpus), "-w", "chkpt",
        "--confusion-out", str(conf_out),
    ])
    assert rc == 0
    cm = np.load(conf_out.with_suffix(".npy"))
    assert cm.sum() > 0


def test_predict_cli_per_class_thresholds(trained_run, tmp_path):
    """Per-class threshold table at predict time (preeval.py:143-221 +
    predict.py:503 parity)."""
    from audio_training_tpu.cli.predict import main as predict_main

    rng = np.random.default_rng(9)
    t = np.arange(SR * 5) / SR
    frames = (np.sin(2 * np.pi * 1100 * t) * (t % 3 < 1.4)).astype(np.float32)
    frames += 0.02 * rng.standard_normal(len(frames)).astype(np.float32)
    wav = tmp_path / "pt.wav"
    save_wav(wav, frames, SR)

    def run(table):
        thresholds_file = tmp_path / "thresholds.json"
        thresholds_file.write_text(json.dumps(table))
        out_json = tmp_path / "pt.json"
        rc = predict_main([
            str(trained_run.run_dir), "--file", str(wav), "-w", "chkpt",
            "--thresholds-json", str(thresholds_file),
            "--json-out", str(out_json),
        ])
        assert rc == 0
        data = json.loads(out_json.read_text())
        return [p for tms in data.values() for tm in tms
                for p in tm["predictions"]]

    # the table must actually be APPLIED: an all-zero table accepts every
    # label; an impossible table rejects them all (raw_tag fallback)
    low = run({l: 0.0 for l in trained_run.labels})
    assert low and all(p["labels"] for p in low)
    high = run({l: 1.1 for l in trained_run.labels})
    assert high and all(not p["labels"] for p in high)


def test_folder_eval_with_generated_best_track(trained_run, tmp_path):
    """End-to-end weak-label flow: signal enrichment -> generate_best_track
    sidecar (otherdata.generate_tracks parity) -> predict_on_folder scoring
    consumes it."""
    from audio_training_tpu.cli.predict import main as predict_main
    from audio_training_tpu.corpus.enrich import enrich_folder

    folder = tmp_path / "gen_folder"
    folder.mkdir()
    rng = np.random.default_rng(11)
    # intermittent 1.2 kHz chirps in noise so detection finds signal spans
    frames = 0.01 * rng.standard_normal(SR * 8).astype(np.float32)
    t = np.arange(int(1.2 * SR)) / SR
    for start in (1.0, 2.6, 4.2):
        i = int(start * SR)
        frames[i : i + len(t)] += np.sin(2 * np.pi * 1200 * t).astype(
            np.float32
        )
    save_wav(folder / "g1.wav", frames, SR)
    (folder / "g1.txt").write_text(json.dumps({"id": "g1", "label": "kiwi"}))

    n = enrich_folder(folder, rms=False, signal=True, best_track=True)
    assert n >= 2  # signal spans + best_track both written
    meta = json.loads((folder / "g1.txt").read_text())
    assert meta["best_track"]["tags"][0]["what"] == "kiwi"

    out_json = tmp_path / "gen_folder.json"
    rc = predict_main([
        str(trained_run.run_dir), "--folder-eval", str(folder),
        "-w", "chkpt", "--json-out", str(out_json),
    ])
    assert rc == 0
    data = json.loads(out_json.read_text())
    assert data["total_files"] == 1
    assert data["per_file"][0]["label"] == "kiwi"
