"""Evaluation-layer tests: confusion construction, A/B compare, threshold
search, raw dumps."""

import numpy as np
import pytest

from audio_training_tpu.eval import (
    apply_thresholds,
    best_thresholds,
    combine_pre_model,
    compare_confusions,
    confusion_matrix,
    load_raw_predictions,
    multi_label_confusion,
    save_confusion,
    save_raw_predictions,
    single_label_confusion,
)


def test_single_label_confusion():
    labels = ["a", "b"]
    y_true = np.array([[1, 0], [0, 1], [1, 0]])
    y_pred = np.array([[0.9, 0.1], [0.2, 0.8], [0.4, 0.3]])
    cm, out_labels = single_label_confusion(y_true, y_pred, labels)
    assert out_labels == ["a", "b", "None"]
    assert cm[0, 0] == 1  # a correct
    assert cm[1, 1] == 1  # b correct
    assert cm[0, 2] == 1  # below threshold -> None


def test_multi_label_confusion():
    labels = ["bird", "kiwi", "noise"]
    y_true = np.array([[1, 1, 0], [0, 0, 1]])
    y_pred = np.array([[0.9, 0.8, 0.0], [0.0, 0.9, 0.1]])
    cm, none_cm, out_labels = multi_label_confusion(y_true, y_pred, labels)
    assert out_labels[-1] == "nothing"
    # sample 1: bird and kiwi correct -> diagonal
    assert cm[0, 0] == 1 and cm[1, 1] >= 1
    # sample 2: kiwi falsely predicted, charged to true label noise
    assert cm[2, 1] == 1
    # noise missed -> nothing column
    assert cm[2, -1] == 1


def test_multi_label_near_miss_none_matrix():
    labels = ["kiwi", "noise"]
    y_true = np.array([[1, 0]])
    y_pred = np.array([[0.1, 0.5]])  # nothing over 0.7; best is noise at 0.5
    cm, none_cm, out_labels = multi_label_confusion(y_true, y_pred, labels)
    assert none_cm[0, 1] == 1  # kiwi truth, confident-ish noise near-miss


def test_compare_confusions_winner():
    labels = ["kiwi", "rain", "None"]
    first = np.array([[8, 1, 1], [1, 8, 1], [0, 0, 0]])
    second = np.array([[5, 3, 2], [2, 6, 2], [0, 0, 0]])
    res = compare_confusions(first, labels[:-1], second, labels[:-1])
    assert res.winner == "first"
    assert res.total_diff == 5
    assert res.per_label["kiwi"]["first_acc"] == 80
    assert res.per_label["kiwi"]["second_acc"] == 50


def test_compare_requires_same_totals():
    labels = ["kiwi"]
    first = np.array([[5, 0]])
    second = np.array([[3, 0]])
    with pytest.raises(ValueError):
        compare_confusions(first, labels, second, labels)


def test_best_thresholds():
    rng = np.random.default_rng(0)
    n = 400
    y_true = np.zeros((n, 2))
    y_true[: n // 2, 0] = 1
    y_true[n // 2 :, 1] = 1
    # well-separated probabilities
    y_pred = np.where(y_true == 1, 0.8, 0.2) + 0.05 * rng.standard_normal(
        (n, 2)
    )
    th = best_thresholds(y_true, y_pred, ["a", "b"])
    assert 0.5 <= th["a"] <= 0.9 and 0.5 <= th["b"] <= 0.9
    decisions = apply_thresholds(y_pred, ["a", "b"], th)
    acc = (decisions == y_true).mean()
    assert acc > 0.9


def test_reference_shipped_thresholds():
    # preeval.py:143-221: 67 species thresholds + 6 pre-model thresholds,
    # percent -> fraction, clipped into [0.5, 0.9]
    from audio_training_tpu.eval import reference_shipped_thresholds

    species, pre = reference_shipped_thresholds()
    assert species.shape == (67,) and pre.shape == (6,)
    assert species.min() >= 0.5 and species.max() <= 0.9
    assert pre.min() >= 0.5 and pre.max() <= 0.9
    # spot values straight from the reference table: 90.4% -> 0.9 clip,
    # 62.1% -> 0.621, 0.0% -> 0.5 clip
    np.testing.assert_allclose(species[[1, 4, 2]], [0.9, 0.621, 0.5])
    np.testing.assert_allclose(pre[1], 0.613)


def test_reference_shipped_thresholds_dict():
    # the label-keyed view feeds apply_thresholds directly; lengths are
    # checked against the positional 67/6-entry production tables
    from audio_training_tpu.eval import (
        apply_thresholds,
        reference_shipped_thresholds,
        reference_shipped_thresholds_dict,
    )

    labels = [f"sp{i}" for i in range(67)]
    pre_labels = [f"pre{i}" for i in range(6)]
    species_d, pre_d = reference_shipped_thresholds_dict(labels, pre_labels)
    species, pre = reference_shipped_thresholds()
    assert [species_d[l] for l in labels] == list(species)
    assert [pre_d[l] for l in pre_labels] == list(pre)
    y_pred = np.tile(species, (3, 1)).astype(np.float32)
    decisions = apply_thresholds(y_pred, labels, species_d)
    assert decisions.all()  # >= threshold everywhere by construction
    with pytest.raises(ValueError):
        reference_shipped_thresholds_dict(labels[:-1])
    with pytest.raises(ValueError):
        reference_shipped_thresholds_dict(labels, pre_labels[:-1])


def test_combine_pre_model_gates_species():
    species = np.array([[0.9, 0.8], [0.9, 0.8]])
    pre = np.array([[0.1, 0.0, 0.9], [0.9, 0.0, 0.05]])  # bird,human,noise
    out = combine_pre_model(species, ["kiwi", "tui1"], pre,
                            ["bird", "human", "noise"])
    np.testing.assert_allclose(out[0], [0, 0])  # noise-gated
    np.testing.assert_allclose(out[1], [0.9, 0.8])  # bird clip untouched


def test_raw_predictions_roundtrip(tmp_path):
    labels = ["a", "b"]
    y_pred = np.random.default_rng(0).random((5, 2)).astype(np.float32)
    y_true = np.eye(5, 2, dtype=np.float32)
    f = save_raw_predictions(tmp_path / "conf", labels, y_pred, y_true,
                             tracks=[1, 2, 3, 4, 5])
    back = load_raw_predictions(f)
    assert back["labels"] == labels
    np.testing.assert_array_equal(back["y_pred"], y_pred)
    assert list(back["tracks"]) == [1, 2, 3, 4, 5]


def test_save_confusion_outputs(tmp_path):
    cm = np.array([[3, 1], [0, 4]])
    save_confusion(cm, ["x", "y"], tmp_path / "c", render=True)
    assert (tmp_path / "c.npy").exists()
    assert (tmp_path / "c.png").exists()
    np.testing.assert_array_equal(np.load(tmp_path / "c.npy"), cm)


def test_plot_signal_percent(tmp_path):
    """build --plot-signal: per-label signal-percent histogram PNGs
    (otherdata.plot_signal, otherdata.py:963-984)."""
    from types import SimpleNamespace

    from audio_training_tpu.eval.plots import plot_signal_percent

    tracks = [
        SimpleNamespace(signal_percent=0.8, human_tags={"kiwi"}),
        SimpleNamespace(signal_percent=0.3, human_tags={"kiwi", "rain"}),
        SimpleNamespace(signal_percent=None, human_tags={"rain"}),  # skipped
    ]
    dataset = SimpleNamespace(recs={"r1": SimpleNamespace(tracks=tracks)})
    written = plot_signal_percent(dataset, tmp_path)
    names = sorted(p.name for p in written)
    assert names == ["kiwi.png", "rain.png"]
    assert all(p.stat().st_size > 500 for p in written)
    assert (tmp_path / "signal-graphs" / "kiwi.png").exists()


def test_mean_model_confusion(tmp_path):
    """--model_2 parity: weighted-average ensemble over raw dumps of the
    same test stream, reference weights [0.6, 0.4]
    (audiomodel.py:1363-1386,1432-1441)."""
    import numpy as np

    from audio_training_tpu.eval import (
        load_raw_predictions,
        mean_model_confusion,
        save_raw_predictions,
    )

    labels = ["kiwi", "rain"]
    y_true = np.array([[1, 0], [0, 1], [1, 0]], np.float32)
    # model A is confident but wrong on row 2; model B fixes it: the 0.6/0.4
    # average lands on the truth (0.6*0.2 + 0.4*0.95 = 0.5 < 0.6*0.8 +...).
    pred_a = np.array([[0.9, 0.1], [0.1, 0.9], [0.2, 0.8]], np.float32)
    pred_b = np.array([[0.95, 0.05], [0.05, 0.95], [0.99, 0.01]], np.float32)
    pa = save_raw_predictions(tmp_path / "a", labels, pred_a, y_true)
    pb = save_raw_predictions(tmp_path / "b", labels, pred_b, y_true)
    dumps = [load_raw_predictions(pa), load_raw_predictions(pb)]
    cm, out_labels, y_mean = mean_model_confusion(dumps, threshold=0.4)
    assert out_labels == ["kiwi", "rain", "None"]
    np.testing.assert_allclose(y_mean, 0.6 * pred_a + 0.4 * pred_b)
    assert cm[0, 0] == 2 and cm[1, 1] == 1  # row 2 rescued by the ensemble

    # mismatched y_true = not the same stream -> refused
    pc = save_raw_predictions(tmp_path / "c", labels, pred_b,
                              np.roll(y_true, 1, 0))
    with pytest.raises(ValueError, match="y_true"):
        mean_model_confusion([dumps[0], load_raw_predictions(pc)])

    # the CLI subcommand writes the ensemble confusion artifacts
    from audio_training_tpu.cli.evaluate import main as eval_main

    out = tmp_path / "mean-model"
    rc = eval_main(["mean", str(pa), str(pb), "--threshold", "0.4",
                    "--out", str(out)])
    assert rc == 0
    assert (tmp_path / "mean-model.npy").exists()


def test_plot_helpers_write_files(tmp_path):
    """plot_utils parity surface (plot_mel/plot_mel_signals/plot_waveform)
    renders to files on the Agg backend."""
    import numpy as np

    from audio_training_tpu.detect.signals import Signal
    from audio_training_tpu.eval.plots import (
        plot_mel,
        plot_mel_signals,
        plot_waveform,
    )

    rng = np.random.default_rng(0)
    mel = rng.uniform(0, 1, (40, 100)).astype(np.float32)
    p1 = tmp_path / "mel.png"
    plot_mel(mel, p1)
    p2 = tmp_path / "sig.png"
    plot_mel_signals(mel, [Signal(0.5, 1.5, 800, 2000, 1)], path=p2)
    p3 = tmp_path / "wave.png"
    plot_waveform(rng.standard_normal(8000).astype(np.float32), 8000, p3)
    for p in (p1, p2, p3):
        assert p.exists() and p.stat().st_size > 1000
