"""Long-recording prediction: detection -> windows -> fused TPU pass ->
per-track aggregation.

Replaces the reference inference stack (predict.main, predict.py:726-997):
the per-track ``model.predict`` loop becomes ONE batched jit call over every
window of every track, and mean/max/count aggregation becomes a segment
reduction keyed by track index.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.config import FeaturizerConfig, InferenceConfig
from audio_training_tpu.detect import get_end, get_tracks_from_signals, signal_noise
from audio_training_tpu.infer.windows import WindowBatch, bucket_pad, extract_track_windows
from audio_training_tpu.ops.features import build_mel_weights, normalize_rows
from audio_training_tpu.ops.pallas.melspec import default_interpret, fused_power_mel
from audio_training_tpu.ops.stft import stft_centered

log = logging.getLogger(__name__)


@dataclass
class ModelResult:
    """Per-track aggregated prediction (predict.ModelResult,
    predict.py:1103-1126)."""

    model: str
    labels: list[str] = field(default_factory=list)
    confidences: list[int] = field(default_factory=list)
    raw_tag: str | None = None
    raw_confidence: int | None = None
    clarity: float | None = None

    def get_meta(self) -> dict:
        meta = {"model": self.model, "labels": self.labels,
                "confidences": self.confidences}
        if self.raw_tag is not None:
            meta["raw_tag"] = self.raw_tag
            meta["raw_confidence"] = self.raw_confidence
        return meta


class Predictor:
    """Fused inference engine for one trained model."""

    def __init__(
        self,
        module,
        variables,
        labels: list[str],
        cfg: FeaturizerConfig,
        infer_cfg: InferenceConfig | None = None,
        model_name: str = "model",
        channels: int = 1,
        mean_sub: bool = False,
        db_scale: bool = False,
        multi_label: bool = True,
        mesh=None,
    ):
        self.module = module
        self.variables = variables
        self.labels = list(labels)
        self.cfg = cfg
        self.infer_cfg = infer_cfg or InferenceConfig()
        self.model_name = model_name
        self.channels = channels
        self.mean_sub = mean_sub
        self.db_scale = db_scale
        self.multi_label = multi_label
        # optional data-parallel inference: shard window batches over the
        # mesh's data axis (params replicated); XLA handles the rest
        self._sharding = None
        if mesh is not None:
            from audio_training_tpu.parallel import batch_sharding, replicated

            self._sharding = batch_sharding(mesh)
            self.variables = jax.device_put(variables, replicated(mesh))
            variables = self.variables
        mel_w = build_mel_weights(cfg)
        self._mel_w_t = jnp.asarray(mel_w).T
        # centered (librosa) convention, fastest valid implementation: the
        # fully-fused Pallas kernel on TPU (exact parity, ~2x the XLA
        # matmul-FFT), the matmul-FFT plan elsewhere when the geometry
        # allows it, otherwise the rfft path
        self._mel_plan = None
        self._fused = None
        if cfg.n_fft == 4096:
            if jax.default_backend() == "tpu":
                from audio_training_tpu.ops.pallas.fused_featurizer import (
                    FusedFeaturizer,
                )

                try:
                    self._fused = FusedFeaturizer(
                        mel_w, cfg.n_fft, cfg.hop_length, center=True
                    )
                except ValueError:
                    pass
            if self._fused is None:
                from audio_training_tpu.ops.fftmel import MatmulMelPlan

                self._mel_plan = MatmulMelPlan(
                    mel_w, cfg.n_fft, cfg.hop_length, center=True
                )
        self._infer = self._build_infer()

    def _build_infer(self):
        cfg = self.cfg
        mel_w_t = self._mel_w_t
        mel_plan = self._mel_plan
        fused = self._fused
        channels = self.channels
        mean_sub = self.mean_sub
        db_scale = self.db_scale
        multi_label = self.multi_label

        @jax.jit
        def infer(raw):
            # inference featurizer convention (predict_utils.get_spect):
            # per-window min-max normalize, centered stft, power-2 mel
            raw = normalize_rows(raw)
            if fused is not None:
                mel = fused(raw, pcen=False)  # (B, M, T), fused Pallas
            elif mel_plan is not None:
                mel = mel_plan(raw)  # (B, M, T), matmul-FFT
            else:
                spec = stft_centered(raw, cfg.n_fft, cfg.hop_length)
                spec_t = jnp.swapaxes(spec, 1, 2)
                mel_tm = fused_power_mel(
                    jnp.real(spec_t), jnp.imag(spec_t), mel_w_t,
                    interpret=default_interpret(),
                )
                mel = jnp.swapaxes(mel_tm, 1, 2)  # (B, M, T)
            if db_scale:
                # per-sample dB reference (the reference applies
                # librosa.power_to_db per clip, predict_utils.py:216-217;
                # a batch-global max would couple predictions to batch
                # composition and to padding rows)
                amin = 1e-10
                ref_v = jnp.max(mel, axis=(1, 2), keepdims=True)
                out_db = 10.0 * jnp.log10(jnp.maximum(amin, mel))
                out_db -= 10.0 * jnp.log10(jnp.maximum(amin, ref_v))
                mel = jnp.maximum(
                    out_db,
                    jnp.max(out_db, axis=(1, 2), keepdims=True) - 80.0,
                )
            if mean_sub:
                mel = mel - mel.mean(axis=2, keepdims=True)
            x = mel[..., None]
            if channels > 1:
                x = jnp.repeat(x, channels, axis=-1)
            out = self.module.apply(self.variables, x, train=False)
            if multi_label:
                return jax.nn.sigmoid(out)
            return jax.nn.softmax(out)

        return infer

    # ------------------------------------------------------------------
    def predict_windows(self, windows: np.ndarray) -> np.ndarray:
        """Classify (N, sample) windows, padding N to a bucket so jit sees
        few shapes."""
        n = windows.shape[0]
        if n == 0:
            return np.zeros((0, len(self.labels)), np.float32)
        padded = bucket_pad(n, self.infer_cfg.bucket_sizes)
        if self._sharding is not None:
            # batch axis must divide the mesh's data axis
            shards = len(self._sharding.mesh.devices.reshape(-1))
            padded = -(-padded // shards) * shards
        if padded != n:
            # pad by repeating the last real window: all-zero rows would
            # turn into NaN under the per-window min-max normalize
            pad_rows = np.repeat(windows[-1:], padded - n, axis=0)
            windows = np.concatenate([windows, pad_rows])
        out = []
        cap = self.infer_cfg.max_window_batch
        for i in range(0, padded, cap):
            chunk = windows[i : i + cap]
            if self._sharding is not None:
                dev = jax.device_put(chunk, self._sharding)
            else:
                dev = jnp.asarray(chunk)
            out.append(np.asarray(self._infer(dev)))
        return np.concatenate(out)[:n]

    def predict_recording(
        self,
        frames: np.ndarray,
        sr: int,
        tracks: list | None = None,
        threshold: float | None = None,
    ):
        """Full pipeline: [detect tracks] -> windows -> classify ->
        aggregate.  Returns (tracks, per-track ModelResult list)."""
        threshold = threshold if threshold is not None else self.infer_cfg.threshold
        if tracks is None:
            end = get_end(frames, sr)
            signals, _ = signal_noise(frames, sr)
            tracks = get_tracks_from_signals(signals, end)
        batch = extract_track_windows(
            frames, sr, tracks,
            segment_length=self.cfg.segment_length,
            stride=self.cfg.segment_stride,
            fmin=self.cfg.fmin, fmax=self.cfg.fmax,
        )
        probs = self.predict_windows(batch.windows)
        results = aggregate_tracks(
            probs, batch.track_index, len(tracks), self.labels,
            threshold=threshold, model_name=self.model_name,
            mode=self.infer_cfg.aggregation,
        )
        for t, r in zip(tracks, results):
            if r is not None:
                t.predictions.append(r)
        return tracks, results


def aggregate_tracks(
    probs: np.ndarray,
    track_index: np.ndarray,
    num_tracks: int,
    labels: list[str],
    threshold: float | np.ndarray = 0.7,
    model_name: str = "model",
    mode: str = "mean",
) -> list[ModelResult | None]:
    """Aggregate window probabilities per track.

    ``mean``: average over windows, then threshold (predict.py:930-956).
    ``max``: per-label max over windows.
    ``votes``: count windows whose argmax clears the threshold, label wins
    with any votes (audiomodel.evaluate_dir count path, :1888-1933).
    Tracks with no windows (skipped/out-of-band) get ``None``.

    ``threshold`` may be a per-label vector — the reference ships a
    hard-coded per-class threshold table clipped to [0.5, 0.9] and applies
    it at predict time (preeval.py:143-221, predict.py:503); build one with
    :func:`audio_training_tpu.eval.thresholds.best_thresholds`.
    """
    thr = np.broadcast_to(np.asarray(threshold, np.float32),
                          (len(labels),)).copy()
    results: list[ModelResult | None] = []
    for ti in range(num_tracks):
        mask = track_index == ti
        if not mask.any():
            results.append(None)
            continue
        p = probs[mask]
        result = ModelResult(model_name)
        if mode == "max":
            agg = p.max(axis=0)
        elif mode == "votes":
            counts = np.zeros(len(labels))
            for row in p:
                mi = int(row.argmax())
                if row[mi] >= thr[mi]:
                    counts[mi] += 1
            agg = counts / max(len(p), 1)
            mean = p.mean(axis=0)
            for i, c in enumerate(counts):
                if c > 0:
                    result.labels.append(labels[i])
                    result.confidences.append(round(float(mean[i]) * 100))
            if not result.labels:
                mi = int(mean.argmax())
                result.raw_tag = labels[mi]
                result.raw_confidence = round(float(mean[mi]) * 100)
            results.append(result)
            continue
        else:
            agg = p.mean(axis=0)
        max_i = int(agg.argmax())
        for i, v in enumerate(agg):
            if v >= thr[i]:
                result.labels.append(labels[i])
                result.confidences.append(round(float(v) * 100))
        if not result.labels:
            result.raw_tag = labels[max_i]
            result.raw_confidence = round(float(agg[max_i]) * 100)
        results.append(result)
    return results
