"""Featurization op tests: raw_to_mel parity vs the TF pipeline, mixup,
normalizers, MagTransform, spec-augment, fused Pallas kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_tf
from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops import features as F
from audio_training_tpu.ops.mel import mel_filterbank
from audio_training_tpu.ops.pallas.melspec import fused_power_mel


def test_mag_transform():
    x = jnp.asarray([[0.5, 2.0]], jnp.float32)
    out = np.asarray(F.mag_transform(x, -1.0))
    sig = 1 / (1 + np.exp(1.0))
    np.testing.assert_allclose(out, np.asarray(x) ** sig, rtol=1e-5)


def test_power_to_db_matches_librosa_semantics():
    rng = np.random.default_rng(0)
    mel = rng.random((10, 20)).astype(np.float32) * 100
    out = np.asarray(F.power_to_db(mel))
    ref = 10 * np.log10(np.maximum(1e-10, mel))
    ref -= 10 * np.log10(np.maximum(1e-10, mel.max()))
    ref = np.maximum(ref, ref.max() - 80)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_normalize_rows_matches_reference_formula():
    rng = np.random.default_rng(1)
    x = rng.random((4, 160, 513)).astype(np.float32)
    out = np.asarray(F.normalize_rows(x))
    mn = x.min(-1, keepdims=True)
    sh = x - mn
    mx = sh.max(-1, keepdims=True)
    want = ((sh / mx + 1e-6) - 0.5) * 2
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)


@requires_tf
@pytest.mark.slow
def test_raw_to_mel_matches_tf_pipeline():
    """End-to-end featurizer parity vs tfdataset.raw_to_mel
    (tfdataset.py:2008-2059) built from raw TF ops."""
    import tensorflow as tf

    cfg = FeaturizerConfig(n_fft=1024, hop_length=281, n_mels=96)
    rng = np.random.default_rng(2)
    raw = rng.standard_normal((2, 48000)).astype(np.float32)
    w = F.build_mel_weights(cfg)

    stft = tf.signal.stft(
        raw, cfg.n_fft, cfg.hop_length, fft_length=cfg.n_fft,
        window_fn=tf.signal.hann_window, pad_end=True,
    )
    stft = tf.math.pow(stft, 2)
    stft = tf.transpose(stft, [0, 2, 1])
    stft = tf.math.abs(stft)
    weights = tf.repeat(tf.expand_dims(tf.constant(w), 0), 2, 0)
    want = tf.linalg.matmul(weights, stft).numpy()

    got = np.asarray(
        F.raw_to_mel(raw, w, n_fft=cfg.n_fft, hop=cfg.hop_length, channels=1)
    )[..., 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_raw_to_mel_shapes():
    cfg = FeaturizerConfig()
    raw = np.zeros((2, cfg.samples_per_clip), np.float32)
    w = F.build_mel_weights(cfg)
    out = F.raw_to_mel(raw, w, n_fft=cfg.n_fft, hop=cfg.hop_length)
    assert out.shape == (2, 160, 513, 3)  # tfdataset.py:2052-2053


def test_mixup_no_mix_when_chance_zero():
    key = jax.random.PRNGKey(0)
    x1 = jnp.ones((4, 8)) * 2
    x2 = jnp.ones((4, 8)) * 5
    y1 = jnp.eye(4)
    y2 = jnp.roll(jnp.eye(4), 1, axis=0)
    xm, ym = F.mix_up(key, x1, y1, x2, y2, chance=0.0)
    # chance 0 -> l = 0 -> output is entirely the second stream
    # (tfdataset.py:948: images_one*l + images_two*(1-l))
    np.testing.assert_allclose(np.asarray(xm), np.asarray(x2))
    np.testing.assert_allclose(np.asarray(ym), np.asarray(y2))


def test_mixup_single_label_is_hard():
    key = jax.random.PRNGKey(1)
    x1 = jnp.zeros((64, 4))
    x2 = jnp.ones((64, 4))
    y1 = jnp.tile(jnp.asarray([[1.0, 0.0]]), (64, 1))
    y2 = jnp.tile(jnp.asarray([[0.0, 1.0]]), (64, 1))
    _, ym = F.mix_up(key, x1, y1, x2, y2, chance=1.0, single_label=True)
    ym = np.asarray(ym)
    # every label is exactly one of the two one-hots, never a blend
    assert set(np.unique(ym)) <= {0.0, 1.0}
    np.testing.assert_allclose(ym.sum(-1), 1.0)


def test_spec_augment_masks_and_shape():
    key = jax.random.PRNGKey(0)
    mel = jnp.ones((2, 160, 513, 1))
    out = F.spec_augment(key, mel, mask_value=0.0)
    out = np.asarray(out)
    assert out.shape == mel.shape
    assert (out == 0).any()  # masked something
    assert (out == 1).any()  # didn't mask everything


def test_fused_power_mel_matches_einsum():
    rng = np.random.default_rng(3)
    b, t, f, m = 2, 100, 513, 64
    re = rng.standard_normal((b, t, f)).astype(np.float32)
    im = rng.standard_normal((b, t, f)).astype(np.float32)
    w = rng.random((f, m)).astype(np.float32)
    got = np.asarray(fused_power_mel(re, im, w, interpret=True))
    want = np.einsum("btf,fm->btm", re**2 + im**2, w)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_butter_bandpass_filter_passes_band():
    sr = 48000
    t = np.arange(sr, dtype=np.float32) / sr
    lo_tone = np.sin(2 * np.pi * 50 * t)
    mid_tone = np.sin(2 * np.pi * 2000 * t)
    x = lo_tone + mid_tone
    out = F.butter_bandpass_filter(x, 500, 8000, sr)
    # low tone attenuated, mid tone preserved
    spec = np.abs(np.fft.rfft(out))
    freqs = np.fft.rfftfreq(len(out), 1 / sr)
    assert spec[np.argmin(abs(freqs - 2000))] > 50 * spec[np.argmin(abs(freqs - 50))]


def test_butter_noop_when_no_cutoffs():
    x = np.ones(100, np.float32)
    np.testing.assert_array_equal(F.butter_bandpass_filter(x, 0, 0), x)


def test_raw_to_mel_dual_views():
    """Band-limited dual views (tfdataset.raw_to_mel_dual): geometry and
    band masking — energy of a 4 kHz tone lands only in view B's band."""
    import numpy as np

    from audio_training_tpu.config import FeaturizerConfig
    from audio_training_tpu.ops.features import (
        build_mel_weights,
        raw_to_mel_dual,
    )

    sr = 48000
    cfg_a = FeaturizerConfig(n_fft=2048, hop_length=278)
    cfg_b = FeaturizerConfig(n_fft=1024, hop_length=280)
    w_a = jnp.asarray(build_mel_weights(cfg_a))
    w_b = jnp.asarray(build_mel_weights(cfg_b))
    t = np.arange(sr)
    tone = np.sin(2 * np.pi * 4000 * t / sr).astype(np.float32)[None]
    a, b = raw_to_mel_dual(jnp.asarray(tone), w_a, w_b, sr=sr)
    assert a.shape[1] == cfg_a.n_mels and a.shape[-1] == 1
    assert b.shape[1] == cfg_b.n_mels
    # 4 kHz is outside view A's 0-3k band but inside view B's 0.5-15k
    assert float(jnp.max(a)) < 1e-3 * float(jnp.max(b))
