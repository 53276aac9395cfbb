"""Inference-layer tests: windowing, bucketing, aggregation, fused
predictor end-to-end, eBird grid build + mask, freeze packaging."""

import json

import numpy as np
import pytest

from audio_training_tpu.config import FeaturizerConfig, InferenceConfig
from audio_training_tpu.detect import Signal
from audio_training_tpu.infer import (
    ModelResult,
    Predictor,
    aggregate_tracks,
    apply_species_mask,
    bucket_pad,
    build_species_grid,
    extract_track_windows,
    format_metadata,
    freeze,
    species_at,
)
from audio_training_tpu.infer.ebirdgrid import (
    add_ebird,
    binary_grid_search,
    find_region_meta,
    merge_neighbours,
    normalize_region_meta,
    set_neighbours,
)

SR = 8000  # small sr keeps windows small/fast


def _track(start, end, f0=500, f1=3000):
    return Signal(start, end, f0, f1, 1)


# ---------------------------------------------------------------------------
# Windowing
# ---------------------------------------------------------------------------


def test_windows_long_track():
    frames = np.arange(SR * 10, dtype=np.float32)
    t = _track(2.0, 7.0)  # 5 s track -> windows at 2,3,4 (end>length stops)
    b = extract_track_windows(frames, SR, [t], rng=np.random.default_rng(0))
    assert b.windows.shape[1] == SR * 3
    assert (b.track_index == 0).all()
    assert len(b.windows) == 3  # 3s windows, 1s stride over 5s
    np.testing.assert_allclose(b.offsets, [2.0, 3.0, 4.0])
    # first window should be the actual frames
    np.testing.assert_array_equal(b.windows[0], frames[SR * 2 : SR * 5])


def test_windows_short_track_centered():
    frames = np.ones(SR * 10, np.float32)
    t = _track(4.0, 5.0)  # 1 s track -> one centered 3 s window
    b = extract_track_windows(frames, SR, [t], rng=np.random.default_rng(0))
    assert len(b.windows) == 1
    assert (b.windows[0] != 0).all()  # fully inside recording, no padding


def test_windows_short_recording_pads():
    frames = np.ones(SR * 2, np.float32)  # recording shorter than a window
    t = _track(0.0, 2.0)
    b = extract_track_windows(frames, SR, [t], rng=np.random.default_rng(0))
    assert len(b.windows) == 1
    assert (b.windows[0] == 0).sum() == SR  # 1 s of zero pad
    assert b.windows[0].sum() == SR * 2


def test_windows_out_of_band_track_skipped():
    frames = np.ones(SR * 5, np.float32)
    t = _track(0.0, 3.0, f0=12000, f1=20000)  # above fmax
    b = extract_track_windows(frames, SR, [t], fmax=11000)
    assert len(b.windows) == 0
    assert b.skipped_tracks == [0]


def test_bucket_pad():
    assert bucket_pad(1, (1, 2, 4, 8)) == 1
    assert bucket_pad(3, (1, 2, 4, 8)) == 4
    assert bucket_pad(20, (1, 2, 4, 8)) == 24


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


def test_aggregate_mean_threshold():
    labels = ["kiwi", "noise"]
    probs = np.array([[0.9, 0.1], [0.8, 0.2]], np.float32)
    idx = np.zeros(2, np.int32)
    (r,) = aggregate_tracks(probs, idx, 1, labels, threshold=0.7)
    assert r.labels == ["kiwi"]
    assert r.confidences == [85]
    assert r.raw_tag is None


def test_aggregate_below_threshold_raw_tag():
    labels = ["kiwi", "noise"]
    probs = np.array([[0.6, 0.1]], np.float32)
    (r,) = aggregate_tracks(probs, np.zeros(1, np.int32), 1, labels)
    assert r.labels == []
    assert r.raw_tag == "kiwi" and r.raw_confidence == 60


def test_aggregate_max_and_votes():
    labels = ["a", "b"]
    probs = np.array([[0.9, 0.0], [0.1, 0.75]], np.float32)
    idx = np.zeros(2, np.int32)
    (r_max,) = aggregate_tracks(probs, idx, 1, labels, mode="max")
    assert set(r_max.labels) == {"a", "b"}
    (r_votes,) = aggregate_tracks(probs, idx, 1, labels, mode="votes")
    assert set(r_votes.labels) == {"a", "b"}  # each wins one window


def test_aggregate_empty_track():
    out = aggregate_tracks(
        np.zeros((0, 2), np.float32), np.zeros(0, np.int32), 1, ["a", "b"]
    )
    assert out == [None]


# ---------------------------------------------------------------------------
# Fused predictor end-to-end (tiny geometry)
# ---------------------------------------------------------------------------


def test_make_fused_infer_fn_backends_agree():
    """The one-shot fused infer API: rfft-forced and auto backends produce
    the same probabilities.  n_fft=4096 so 'auto' resolves to the
    matmul-FFT backend on CPU — a DIFFERENT implementation than the forced
    rfft one (with n_fft<4096 both would silently be rfft and the
    comparison vacuous)."""
    import jax
    import jax.numpy as jnp

    from audio_training_tpu.infer import make_fused_infer_fn
    from audio_training_tpu.models import build_model

    cfg = FeaturizerConfig(sr=16000, n_fft=4096, hop_length=281, n_mels=96,
                           fmax=7000.0)
    spec = build_model("badwinner2", num_labels=3, logits_only=True)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)
    raw = jnp.asarray(
        np.random.default_rng(5).standard_normal(
            (2, cfg.samples_per_clip)
        ).astype(np.float32)
    )
    infer_auto = make_fused_infer_fn(spec.module, variables, cfg,
                                     probabilities=True)
    infer_rfft = make_fused_infer_fn(spec.module, variables, cfg,
                                     use_pallas=False, probabilities=True)
    a = np.asarray(infer_auto(raw))
    b = np.asarray(infer_rfft(raw))
    assert a.shape == (2, 3)
    assert (a >= 0).all() and (a <= 1).all()
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_predictor_end_to_end():
    import jax.numpy as jnp

    from audio_training_tpu.models import build_model

    cfg = FeaturizerConfig(sr=SR, n_fft=512, hop_length=100, n_mels=96,
                           fmax=3500.0)
    spec = build_model("badwinner2", num_labels=3, logits_only=True)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    import jax

    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)
    pred = Predictor(
        spec.module, variables, ["kiwi", "morepo2", "noise"], cfg,
        InferenceConfig(max_window_batch=8, bucket_sizes=(1, 2, 4, 8)),
    )
    # synthetic recording with a detectable tone
    t = np.arange(SR * 8) / SR
    frames = (np.sin(2 * np.pi * 1500 * t) *
              (t % 4 < 1.2)).astype(np.float32)
    frames += 0.01 * np.random.default_rng(0).standard_normal(len(frames)).astype(np.float32)
    tracks, results = pred.predict_recording(frames, SR)
    assert len(tracks) >= 1
    real = [r for r in results if r is not None]
    assert real
    for r in real:
        assert r.labels or r.raw_tag is not None
    # predictions recorded into track meta (predict.py Track.get_meta path)
    meta = tracks[0].get_meta()
    assert meta["predictions"]


# ---------------------------------------------------------------------------
# eBird grid
# ---------------------------------------------------------------------------


def _grid_fixture(tmp_path):
    # two adjacent squares + one far square
    bounds = [
        [174.0, -41.1, 174.1, -41.0],
        [174.1, -41.1, 174.2, -41.0],
        [175.0, -40.1, 175.1, -40.0],
    ]
    csv = tmp_path / "obs.csv"
    rows = [
        "COMMON NAME\tLATITUDE\tLONGITUDE\tOBSERVATION DATE\tOBSERVATION TYPE",
        "Morepork\t-41.05\t174.05\t2024-06-15\tP",
        "Morepork\t-41.05\t174.05\t2024-06-20\tP",
        "Tui\t-41.05\t174.15\t2024-01-10\tP",
    ]
    csv.write_text("\n".join(rows))
    return bounds, csv


def test_build_species_grid(tmp_path):
    bounds, csv = _grid_fixture(tmp_path)
    out = tmp_path / "species_per_square.json"
    meta = build_species_grid(csv, square_bounds=bounds, out_path=out)
    assert out.exists()
    grid = meta["grid_meta"]
    assert len(grid) == 3
    # morepork (morepo2) counted twice in June in square 0
    assert grid[0]["species_per_month"]["morepo2"]["6"] == 2
    assert grid[1]["species_per_month"]["tui1"]["1"] == 1
    assert meta["latest_obs_date"].startswith("2024-06-20")
    # neighbours: squares 0,1 adjacent; 2 isolated
    assert 1 in grid[0]["neighbours_i"]
    assert grid[2]["neighbours_i"] == []


def test_species_mask(tmp_path):
    bounds, csv = _grid_fixture(tmp_path)
    meta = build_species_grid(csv, square_bounds=bounds)
    # neighbour merging: tui observed in the adjacent square counts
    sp = species_at(meta, -41.05, 174.05)
    assert {"morepo2", "tui1"} <= sp
    sp_jan = species_at(meta, -41.05, 174.05, month=6)
    assert "morepo2" in sp_jan and "tui1" not in sp_jan

    labels = ["morepo2", "tui1", "kiwi", "bird", "noise"]
    probs = np.ones(5, np.float32)
    masked = apply_species_mask(probs, labels, meta, -41.05, 174.05, month=6)
    np.testing.assert_array_equal(masked, [1, 0, 0, 1, 1])


def test_binary_grid_search_miss():
    squares = [{"bounds": [174.0, -41.1, 174.1, -41.0],
                "species_per_month": {}}]
    assert binary_grid_search(squares, 10.0, 0.0) is None


def test_region_meta_both_formats():
    """find_region_meta accepts the reference dict format (the shipped
    assets/ebird_species.json) AND the downloader's flattened list."""
    ref_format = {
        "NZ-WGN": {
            "region": {"code": "NZ-WGN", "name": "Wellington", "info": {
                "bounds": {"minX": 174.0, "minY": -41.5,
                           "maxX": 176.0, "maxY": -40.5}}},
            "species": ["tui1"],
        },
    }
    flat_format = [{"code": "NZ-WGN",
                    "bounds": [174.0, -41.5, 176.0, -40.5],
                    "species": ["tui1"]}]
    assert normalize_region_meta(ref_format) == flat_format
    for meta in (ref_format, flat_format):
        code, region = find_region_meta(meta, 175.0, -41.0)
        assert code == "NZ-WGN" and region["species"] == ["tui1"]
        assert find_region_meta(meta, 10.0, 0.0) == (None, None)

    # the real shipped asset passes through the normalizer
    from pathlib import Path

    import audio_training_tpu

    asset = Path(audio_training_tpu.__file__).parent / "assets" / (
        "ebird_species.json")
    shipped = normalize_region_meta(json.loads(asset.read_text()))
    assert all(r["bounds"] and len(r["bounds"]) == 4 for r in shipped)
    assert all(r["species"] for r in shipped)


def test_add_ebird(tmp_path):
    bounds, csv = _grid_fixture(tmp_path)
    meta = build_species_grid(csv, square_bounds=bounds)
    ok = add_ebird(meta, -40.05, 175.05, "kiwi")
    assert ok
    assert "kiwi" in species_at(meta, -40.05, 175.05, month=3)


# ---------------------------------------------------------------------------
# Freeze
# ---------------------------------------------------------------------------


def test_format_metadata_kiwi_expansion():
    meta = {
        "ebird_labels": ["kiwi", "morepo2", "noise"],
        "remapped_labels": {"litowl1": 1, "rain": 2, "junk": -1},
    }
    out = format_metadata(meta)
    kiwi_ids = out["ebird_ids"][0]
    # "kiwi" itself is not an eBird id, so (like the reference) only the
    # sub-species codes appear (freezemodel.py:75-99)
    assert "grskiw1" in kiwi_ids and "sobkiw3" in kiwi_ids
    assert "litowl1" in out["ebird_ids"][1]
    assert out["labels"][1]  # display name resolved


def test_freeze_packaging(tmp_path):
    run = tmp_path / "run"
    (run / "val-loss").mkdir(parents=True)
    (run / "val-loss" / "w.bin").write_bytes(b"weights")
    (run / "metadata.txt").write_text(json.dumps({
        "ebird_labels": ["kiwi"], "remapped_labels": {},
    }))
    out = freeze(run, tmp_path / "deploy")
    assert (out / "audioModel" / "w.bin").read_bytes() == b"weights"
    meta = json.loads((out / "metadata.txt").read_text())
    assert meta["frozen"] and meta["ebird_ids"]


def test_predictor_sharded_over_mesh():
    """Window batches shard over the data axis of an 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from audio_training_tpu.models import build_model
    from audio_training_tpu.parallel import make_mesh

    cfg = FeaturizerConfig(sr=SR, n_fft=512, hop_length=100, n_mels=96,
                           fmax=3500.0)
    spec = build_model("badwinner2", num_labels=3, logits_only=True)
    mel0 = jnp.zeros((1, cfg.n_mels, cfg.mel_frames, 1), jnp.float32)
    variables = spec.module.init({"params": jax.random.PRNGKey(0)}, mel0,
                                 train=False)
    mesh = make_mesh(num_data=8)
    pred = Predictor(
        spec.module, variables, ["a", "b", "c"], cfg,
        InferenceConfig(max_window_batch=16, bucket_sizes=(8, 16)),
        mesh=mesh,
    )
    rng = np.random.default_rng(0)
    windows = rng.standard_normal((10, cfg.samples_per_clip)).astype(
        np.float32
    )
    probs = pred.predict_windows(windows)
    assert probs.shape == (10, 3)
    assert np.isfinite(probs).all()

    # small window counts must pad up to the mesh size (3 -> 8), not crash
    small = pred.predict_windows(windows[:3])
    assert small.shape == (3, 3)
    assert np.isfinite(small).all()

    # sharded result matches unsharded
    pred1 = Predictor(
        spec.module, variables, ["a", "b", "c"], cfg,
        InferenceConfig(max_window_batch=16, bucket_sizes=(8, 16)),
    )
    np.testing.assert_allclose(probs, pred1.predict_windows(windows),
                               rtol=1e-4, atol=1e-5)
