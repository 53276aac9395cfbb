"""Embedding-model inference paths exercised against LOCAL saved models.

The reference reaches tensorflow_hub for Perch / YAMNet
(audiowriter.py:212-253, predict.py:380-396, predict.py:1051); zero-egress
builds can't.  These tests build tiny TF saved models with the SAME
signatures (Perch: ``infer_tf(chunks) -> {"embedding", "label"}``; YAMNet:
``model(waveform) -> (scores, embeddings, spectrogram)``) and prove the
whole local-model path works: wrapper loading, window embedding, speech
scoring, the EmbeddingPredictor track pipeline, and the predict-CLI
``embeddings`` run route.
"""

import numpy as np
import pytest

from tests.conftest import requires_tf

pytestmark = [requires_tf, pytest.mark.slow]

PERCH_SAMPLES = 5 * 32000


@pytest.fixture(scope="module")
def tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    return tf


@pytest.fixture(scope="module")
def perch_path(tf, tmp_path_factory):
    class FakePerch(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([None, PERCH_SAMPLES], tf.float32)
        ])
        def infer_tf(self, x):
            mean = tf.reduce_mean(x, axis=1, keepdims=True)
            ramp = tf.range(1280, dtype=tf.float32)[None, :] / 1280.0
            emb = mean + ramp
            label = tf.tile(mean, [1, 10])
            return {"embedding": emb, "label": label}

    path = tmp_path_factory.mktemp("perch") / "model"
    tf.saved_model.save(FakePerch(), str(path))
    return path


@pytest.fixture(scope="module")
def yamnet_path(tf, tmp_path_factory):
    class FakeYamnet(tf.Module):
        @tf.function(input_signature=[tf.TensorSpec([None], tf.float32)])
        def __call__(self, wav):
            n = tf.maximum(tf.size(wav) // 8000, 1)
            col0 = 0.25 * tf.ones([n, 1])
            rest = 0.1 * tf.ones([n, 520])
            scores = tf.concat([col0, rest], axis=1)
            emb = tf.ones([n, 1024]) * tf.reduce_mean(wav)
            spect = tf.zeros([n, 64])
            return scores, emb, spect

    path = tmp_path_factory.mktemp("yamnet") / "model"
    tf.saved_model.save(FakeYamnet(), str(path))
    return path


def test_perch_wrapper(perch_path):
    from audio_training_tpu.infer.embeddings import PerchModel

    m = PerchModel(perch_path)
    assert m.available
    frames = np.full(2 * PERCH_SAMPLES, 0.5, np.float32)
    emb, label = m.embed(frames)
    assert emb.shape == (2, 1280)
    assert label.shape == (2, 10)
    np.testing.assert_allclose(emb[0, 0], 0.5, atol=1e-6)
    # short window is zero-padded to 5 s
    one = m.embed_window(np.full(3 * 32000, 1.0, np.float32))
    assert one.shape == (1280,)
    np.testing.assert_allclose(one[0], 3.0 / 5.0, atol=1e-6)


def test_yamnet_wrapper_and_speech_score(yamnet_path):
    from audio_training_tpu.infer.embeddings import YamnetModel

    m = YamnetModel(yamnet_path)
    assert m.available
    wav = np.full(16000 * 4, 0.125, np.float32)
    emb, scores = m.embed(wav)
    assert emb.shape[1] == 1024
    assert scores.shape[1] == 521
    # fake model puts 0.25 in the speech column (index 0)
    assert m.speech_score(wav) == pytest.approx(0.25)
    one = m.embed_window(wav)
    assert one.shape == (1024,)
    np.testing.assert_allclose(one, 0.125, atol=1e-6)


def test_unavailable_model_raises():
    from audio_training_tpu.infer.embeddings import PerchModel

    m = PerchModel(None)
    assert not m.available
    with pytest.raises(RuntimeError, match="not available"):
        m.embed(np.zeros(PERCH_SAMPLES, np.float32))


@pytest.fixture(scope="module")
def linear_probe():
    import jax

    from audio_training_tpu.models import build_model

    spec = build_model("embeddings", num_labels=5, logits_only=True)
    variables = spec.module.init(
        jax.random.PRNGKey(0), np.zeros((1, 1280), np.float32)
    )
    return spec, variables


def test_embedding_predictor_tracks(perch_path, linear_probe):
    from audio_training_tpu.config import FeaturizerConfig, InferenceConfig
    from audio_training_tpu.detect.signals import Signal
    from audio_training_tpu.infer.embeddings import (
        EmbeddingPredictor,
        PerchModel,
    )

    spec, variables = linear_probe
    labels = [f"l{i}" for i in range(5)]
    pred = EmbeddingPredictor(
        PerchModel(perch_path), spec.module, variables, labels,
        FeaturizerConfig(), InferenceConfig(threshold=0.0),
    )
    rng = np.random.default_rng(3)
    sr = 8000  # non-model rate: exercises the resample path
    frames = rng.standard_normal(sr * 10).astype(np.float32)
    tracks = [Signal(2.0, 7.0, 500, 3000, 1)]
    out_tracks, results = pred.predict_recording(frames, sr, tracks=tracks)
    assert out_tracks is tracks
    assert len(results) == 1 and results[0] is not None
    # 5 s track, 3 s windows, 1 s stride -> 3 windows aggregated
    assert results[0].labels  # threshold 0 -> something above it
    meta = tracks[0].get_meta()
    assert meta["predictions"][0]["model"] == "embeddings-perch"


def test_predict_cli_embeddings_route(perch_path, linear_probe, tmp_path):
    """load_predictor returns an EmbeddingPredictor for an 'embeddings' run
    (predict.py:380-396 route selection)."""
    import orbax.checkpoint as ocp

    from audio_training_tpu.cli.predict import load_predictor
    from audio_training_tpu.config import FeaturizerConfig
    from audio_training_tpu.infer.embeddings import EmbeddingPredictor
    from audio_training_tpu.taxonomy.ontology import load_ontology
    from audio_training_tpu.train.metadata import save_metadata

    spec, variables = linear_probe
    labels = [f"l{i}" for i in range(5)]
    run = tmp_path / "run"
    save_metadata(run, "embeddings", labels, FeaturizerConfig(),
                  load_ontology())
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        (run / "val-loss").resolve(),
        {"params": variables["params"], "batch_stats": {},
         "step": np.asarray(0)},
    )
    ckptr.wait_until_finished()

    with pytest.raises(RuntimeError, match="--embedding-model"):
        load_predictor(run, "val-loss")

    pred, meta = load_predictor(run, "val-loss",
                                embedding_model=str(perch_path))
    assert isinstance(pred, EmbeddingPredictor)
    assert pred.labels == labels


def test_embedding_predictor_predict_windows(perch_path, linear_probe):
    """predict_windows — the interface strong/weak-label folder evaluation
    calls (infer/folder.py) — resamples windows to the model rate."""
    from audio_training_tpu.config import FeaturizerConfig, InferenceConfig
    from audio_training_tpu.infer.embeddings import (
        EmbeddingPredictor,
        PerchModel,
    )

    spec, variables = linear_probe
    pred = EmbeddingPredictor(
        PerchModel(perch_path), spec.module, variables,
        [f"l{i}" for i in range(5)], FeaturizerConfig(), InferenceConfig(),
    )
    rng = np.random.default_rng(4)
    windows = rng.standard_normal((3, 48000 * 3)).astype(np.float32)
    probs = pred.predict_windows(windows)  # default sr = cfg.sr (48k)
    assert probs.shape == (3, 5)
    assert np.isfinite(probs).all() and (0 <= probs).all() and (probs <= 1).all()
    assert pred.predict_windows(np.zeros((0, 10), np.float32)).shape == (0, 5)


def test_embeddings_run_folder_eval(perch_path, linear_probe, tmp_path):
    """Strong-label folder eval works for an embeddings run end-to-end
    (regression: EmbeddingPredictor lacked predict_windows and folder eval
    crashed)."""
    from audio_training_tpu.config import FeaturizerConfig, InferenceConfig
    from audio_training_tpu.corpus.audioio import save_wav
    from audio_training_tpu.infer.embeddings import (
        EmbeddingPredictor,
        PerchModel,
    )
    from audio_training_tpu.infer.folder import predict_on_folder

    spec, variables = linear_probe
    labels = [f"l{i}" for i in range(5)]
    pred = EmbeddingPredictor(
        PerchModel(perch_path), spec.module, variables, labels,
        FeaturizerConfig(), InferenceConfig(threshold=0.0),
    )
    import json

    folder = tmp_path / "folder"
    folder.mkdir()
    rng = np.random.default_rng(5)
    sr = 48000
    save_wav(folder / "r.wav",
             rng.standard_normal(sr * 6).astype(np.float32), sr)
    (folder / "r.txt").write_text(json.dumps({
        "id": "r", "duration": 6.0,
        "best_track": {"start": 0.5, "end": 5.5,
                       "tags": [{"what": "l2"}]},
    }))
    result = predict_on_folder(pred, folder, threshold=0.0)
    assert result.total_files == 1
    assert result.per_file[0]["label"] == "l2"


def test_writer_stores_perch_embeddings(perch_path, tmp_path):
    """Record-write embedding extraction (audiowriter DO_EMBEDDING,
    audiowriter.py:212,248-253,440-453) against the local fake Perch."""
    import json

    from tests.test_corpus import CFG, NO_RMS, write_rec

    from audio_training_tpu.corpus.dataset import AudioDataset
    from audio_training_tpu.corpus.writer import create_tf_records
    from audio_training_tpu.data.pipeline import find_shards
    from audio_training_tpu.data.schema import decode_sample
    from audio_training_tpu.data.tfrecord import read_tfrecords

    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    write_rec(corpus_dir, "rec0",
              [{"start": 0.5, "end": 5.5, "what": "kiwi"}],
              duration=8.0, seed=0)
    ds = AudioDataset("all", NO_RMS, segment_length=3.0, segment_stride=1.0)
    ds.load_meta(corpus_dir)

    out = tmp_path / "recs"
    n = create_tf_records(ds, out, num_workers=1, cfg=CFG,
                          embedding_model=str(perch_path))
    assert n > 0
    shard = find_shards(out)[0]
    rec = next(iter(read_tfrecords(shard)))
    d = decode_sample(rec, want_embeddings=True)
    assert d.embeddings is not None
    assert d.embeddings.ravel().shape == (1280,)
    assert np.isfinite(d.embeddings).all()
