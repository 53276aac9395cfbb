"""STFT parity: tf-style framing vs tf.signal.stft, centered vs analytic."""

import numpy as np
import pytest

from tests.conftest import requires_tf
from audio_training_tpu.ops.stft import (
    hann_window,
    istft_centered,
    num_frames_centered,
    num_frames_tf,
    stft_centered,
    stft_tf_style,
)


def test_frame_counts():
    # 3 s @ 48 kHz, hop 281 -> 513 frames under both conventions
    assert num_frames_tf(144000, 281) == 513  # tfdataset.py:177
    assert num_frames_centered(144000, 281) == 513


@requires_tf
@pytest.mark.slow
def test_stft_matches_tf_signal():
    import tensorflow as tf

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 9000)).astype(np.float32)
    ours = np.asarray(stft_tf_style(x, 1024, 281))
    theirs = tf.signal.stft(
        x, 1024, 281, fft_length=1024, window_fn=tf.signal.hann_window,
        pad_end=True,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@requires_tf
@pytest.mark.slow
def test_hann_matches_tf():
    import tensorflow as tf

    np.testing.assert_allclose(
        hann_window(4096), tf.signal.hann_window(4096).numpy(), atol=1e-6
    )


def test_stft_pure_tone_peak():
    # A pure tone must peak at its frequency bin.
    sr, n_fft, hop = 48000, 4096, 281
    f0 = 1000.0
    t = np.arange(sr, dtype=np.float32) / sr
    x = np.sin(2 * np.pi * f0 * t)[None]
    spec = np.abs(np.asarray(stft_centered(x, n_fft, hop)))  # (1, F, T)
    peak_bin = spec[0, :, spec.shape[2] // 2].argmax()
    expected_bin = round(f0 * n_fft / sr)
    assert abs(int(peak_bin) - expected_bin) <= 1


def test_stft_centered_shape_order():
    x = np.zeros((3, 144000), np.float32)
    spec = stft_centered(x, 4096, 281)
    # librosa axis order: (batch, freq, time)
    assert spec.shape == (3, 2049, 513)


def test_istft_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 8000)).astype(np.float32)
    spec = stft_centered(x, 512, 128)
    rec = np.asarray(istft_centered(spec, 512, 128, 8000))
    # Interior reconstruction is near-exact; edges lose window coverage.
    np.testing.assert_allclose(rec[0, 600:-600], x[0, 600:-600], atol=1e-3)
