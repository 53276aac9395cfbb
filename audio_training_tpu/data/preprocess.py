"""On-device batch preprocessing: one jit graph from raw waveform to model
input, fusing what the reference spreads over five tf.data maps
(mixup -> normalize -> stft -> mel -> channel-repeat, tfdataset.py:461-505).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.features import (
    build_mel_weights,
    mix_up,
    normalize_rows,
    raw_to_mel,
    spec_augment,
)


def make_preprocess_fn(
    cfg: FeaturizerConfig,
    augment: bool = False,
    mixup_alpha: float = 0.5,
    mixup_chance: float = 0.25,
    single_label_mix: bool = True,
    use_spec_augment: bool = False,
    channels: int = 1,
    dual: bool = False,
) -> Callable:
    """Build the jit-compiled (raw, y[, raw2, y2], key) -> (mel, y) map.

    Augmented path order matches get_dataset (tfdataset.py:466-505):
    mixup(alpha=0.5) -> per-sample waveform min-max normalize -> raw->mel.

    ``dual=True`` emits the dual-badwinner2 input pair instead of one mel
    image: two band-limited views at the reference's geometries
    (tfdataset.raw_to_mel_dual, tfdataset.py:1818-1866 — see
    ops.features.raw_to_mel_dual for the band-limit implementation note).
    """
    from audio_training_tpu.ops.featurizer_select import make_mel_fn

    if dual:
        from audio_training_tpu.ops.features import (
            build_mel_weights,
            raw_to_mel_dual,
        )

        cfg_a = FeaturizerConfig(
            sr=cfg.sr, segment_length=cfg.segment_length,
            segment_stride=cfg.segment_stride, n_fft=2048, hop_length=278,
            n_mels=cfg.n_mels, break_freq=cfg.break_freq, fmin=cfg.fmin,
            fmax=min(cfg.fmax, 3000.0),
        )
        cfg_b = FeaturizerConfig(
            sr=cfg.sr, segment_length=cfg.segment_length,
            segment_stride=cfg.segment_stride, n_fft=1024, hop_length=280,
            n_mels=cfg.n_mels, break_freq=cfg.break_freq,
            fmin=max(cfg.fmin, 500.0), fmax=cfg.fmax,
        )
        w_a = jnp.asarray(build_mel_weights(cfg_a))
        w_b = jnp.asarray(build_mel_weights(cfg_b))

        def mel_fn(raw):
            # geometry/bands passed explicitly from the SAME configs the
            # mel weights were built from (one source of truth)
            return raw_to_mel_dual(
                raw, w_a, w_b, sr=cfg.sr,
                params_a=(cfg_a.n_fft, cfg_a.hop_length),
                params_b=(cfg_b.n_fft, cfg_b.hop_length),
                band_a=(cfg_a.fmin, cfg_a.fmax),
                band_b=(cfg_b.fmin, cfg_b.fmax),
            )
    else:
        # matmul-FFT when n_fft=4096, else rfft; training uses the fast
        # (bf16 MXU) DFT precision — mixup/augmentation noise dwarfs its
        # ~2e-3 error — while eval batches stay fp32-faithful
        mel_fn = make_mel_fn(cfg,
                             precision="default" if augment else "highest")

    def to_image(raw):
        if dual:
            return mel_fn(raw)  # (view_a, view_b) images
        mel = mel_fn(raw)  # (B, M, T)
        if cfg.db_scale:
            # per-sample dB (matches the inference featurizer; see
            # infer/predictor.py)
            amin = 1e-10
            ref_v = jnp.max(mel, axis=(1, 2), keepdims=True)
            out_db = 10.0 * jnp.log10(jnp.maximum(amin, mel))
            out_db -= 10.0 * jnp.log10(jnp.maximum(amin, ref_v))
            mel = jnp.maximum(
                out_db, jnp.max(out_db, axis=(1, 2), keepdims=True) - 80.0
            )
        if cfg.mean_sub:
            mel = mel - mel.mean(axis=2, keepdims=True)
        img = mel[..., None]
        if channels > 1:
            img = jnp.repeat(img, channels, axis=-1)
        return img

    # Train: mixup on RAW clips, then per-sample min-max normalize of the
    # mix (tfdataset.py:466-505 — in the reference's training invocation
    # get_a_dataset's tail normalize never runs because load_raw defaults
    # False there, audiomodel.py:1607-1642, so the post-mixup normalize at
    # tfdataset.py:481 is the only one).
    #
    # Eval: normalized HERE although the reference's validation stream is
    # NOT (same dead load_raw default) — a reference train/val/deploy
    # inconsistency FIXED by default per the repo convention: the model
    # trains on normalized images (above) and deployment normalizes every
    # window (predict_utils.py / infer/predictor.py:127-128), so unscaled
    # val images hit BatchNorm running stats accumulated on a different
    # scale.  The synthetic-corpus quality gate caught this as eval-mode
    # collapse (tests/test_quality_gate.py).
    if augment:

        @jax.jit
        def preprocess(raw, y, raw2, y2, key):
            k1, k2 = jax.random.split(key)
            mixed, y = mix_up(
                k1, raw, y, raw2, y2,
                alpha=mixup_alpha, chance=mixup_chance,
                single_label=single_label_mix,
            )
            mixed = normalize_rows(mixed)
            mel = to_image(mixed)
            if use_spec_augment and not dual:
                mel = spec_augment(k2, mel)
            return mel, y

        return preprocess

    @jax.jit
    def preprocess_eval(raw, y):
        return to_image(normalize_rows(raw)), y

    return preprocess_eval


def make_merge_preprocess_fn(
    cfg: FeaturizerConfig,
    augment: bool = False,
    mixup_alpha: float = 0.5,
    mixup_chance: float = 0.25,
    single_label_mix: bool = True,
) -> Callable:
    """Preprocess for the ``merge`` model's three-input tuple
    ``(mel, short_f, mid_f)`` (audiomodel.py:674-708; the features parse at
    tfdataset.py:1103-1119, passed through normalize/raw_to_mel untouched,
    tfdataset.py:1916-1934, 2052-2057).

    Batches are ``((raw, short_f, mid_f), y[, partner...])``.  Under
    augmentation one mixup lambda per sample mixes ALL THREE input tensors
    plus the label — the joint-training extension of the reference's
    waveform mixup (its tf.mix_up cannot consume the feature tuple; here the
    shared-lambda mix keeps waveform and features describing the same
    virtual clip).
    """
    from audio_training_tpu.ops.featurizer_select import make_mel_fn
    from audio_training_tpu.ops.features import (
        apply_mix,
        mix_labels,
        sample_mix_weights,
    )

    mel_fn = make_mel_fn(cfg, precision="default" if augment else "highest")

    def to_image(raw):
        return mel_fn(raw)[..., None]

    if augment:

        @jax.jit
        def preprocess(xs, y, xs2, y2, key):
            raw1, short1, mid1 = xs
            raw2, short2, mid2 = xs2
            l = sample_mix_weights(
                key, raw1.shape[0], alpha=mixup_alpha, chance=mixup_chance
            )
            raw = apply_mix(l, raw1, raw2)
            short = apply_mix(l, short1, short2)
            mid = apply_mix(l, mid1, mid2)
            y = mix_labels(l, y, y2, single_label=single_label_mix)
            mel = to_image(normalize_rows(raw))
            return (mel, short, mid), y

        return preprocess

    @jax.jit
    def preprocess_eval(xs, y):
        raw, short, mid = xs
        # eval waveforms normalized like train/deploy — the same
        # reference-inconsistency fix as make_preprocess_fn's eval path
        return (to_image(normalize_rows(raw)), short, mid), y

    return preprocess_eval


# ---------------------------------------------------------------------------
# Class weighting / distribution (tfdataset.py:315-338, 1721-1761)
# ---------------------------------------------------------------------------


def get_distribution(batches, num_labels: int) -> tuple[np.ndarray, int]:
    """Per-label positive counts + total sample count over an iterable of
    (x, y) batches (tfdataset.get_distribution)."""
    dist = np.zeros(num_labels, np.float64)
    total = 0
    for _, y in batches:
        y = np.asarray(y)
        dist += y.sum(axis=0)
        total += y.shape[0]
    return dist, total


def get_weighting(
    dist: np.ndarray,
    labels: list[str],
    dont_weigh: list[str] | None = None,
    cap_max: float = 4.0,
    cap_min: float = 0.25,
) -> dict[int, float]:
    """Inverse-frequency class weights clipped to [0.25, 4]
    (tfdataset.get_weighting, tfdataset.py:1721-1761)."""
    dont_weigh = dont_weigh or []
    num_labels = len(labels)
    dist = np.asarray(dist, np.float64)
    non_zero = num_labels - int((dist == 0).sum())
    total = sum(d for d, l in zip(dist, labels) if l not in dont_weigh)
    weights: dict[int, float] = {}
    for i in range(num_labels):
        if labels[i] in dont_weigh:
            weights[i] = 1.0
        elif dist[i] == 0:
            weights[i] = 0.0
        else:
            w = (1.0 / dist[i]) * (total / max(non_zero, 1))
            weights[i] = float(np.clip(w, cap_min, cap_max))
    return weights


def weights_to_array(weights: dict[int, float], num_labels: int) -> np.ndarray:
    out = np.ones(num_labels, np.float32)
    for i, w in weights.items():
        out[i] = w
    return out
