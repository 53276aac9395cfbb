"""Numerical-parity tests for the mel filterbank vs the reference math
(custommel.py:6-61) re-derived independently with mpmath-free numpy."""

import numpy as np
import pytest

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops import mel as M


def reference_mel_weights(sr, n_mels, fmin, fmax, n_fft, break_freq):
    """Independent re-derivation of the custom-break mel filterbank used as
    the test oracle (same math as custommel.py:18-54, librosa-style)."""
    def to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / break_freq)

    def from_mel(m):
        return break_freq * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    pts = from_mel(np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2))
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lo, c, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (fftfreqs - lo) / (c - lo)
        down = (hi - fftfreqs) / (hi - c)
        weights[i] = np.maximum(0, np.minimum(up, down))
        weights[i] *= 2.0 / (hi - lo)
    return weights.astype(np.float32)


@pytest.mark.parametrize(
    "sr,n_mels,fmin,fmax,n_fft,break_freq",
    [
        (48000, 160, 100, 11000, 4096, 1000),  # training defaults
        (48000, 160, 500, 11000, 4096, 1000),  # tfdataset.py:47 module default
        (48000, 96, 100, 11000, 1024, 1000),   # low-nfft branch
        (48000, 160, 100, 3000, 1024, 1000),   # MEL_WEIGHTS_2
        (22050, 64, 50, 8000, 2048, 1750),     # custommel default break
    ],
)
def test_mel_filterbank_matches_reference_math(
    sr, n_mels, fmin, fmax, n_fft, break_freq
):
    ours = M.mel_filterbank(sr, n_mels, fmin, fmax, n_fft, break_freq)
    ref = reference_mel_weights(sr, n_mels, fmin, fmax, n_fft, break_freq)
    assert ours.shape == (n_mels, 1 + n_fft // 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_mel_filterbank_htk_break_700_matches_librosa_formula():
    # htk mel with break 700 should reproduce the classic htk scale
    f = np.array([0.0, 700.0, 1000.0, 8000.0])
    mels = M.hz_to_mel(f, 700.0)
    expected = 2595.0 * np.log10(1.0 + f / 700.0)
    np.testing.assert_allclose(mels, expected)
    np.testing.assert_allclose(M.mel_to_hz(mels, 700.0), f, rtol=1e-10)


def test_mel_spec_host():
    rng = np.random.default_rng(0)
    stft = rng.normal(size=(2049, 16)) + 1j * rng.normal(size=(2049, 16))
    out = M.mel_spec(stft, 48000, 4096, 281, 160, 100, 11000, 1000, power=2)
    w = M.mel_filterbank(48000, 160, 100, 11000, 4096, 1000)
    np.testing.assert_allclose(out, w @ (np.abs(stft) ** 2), rtol=1e-5)


def test_featurizer_config_shapes():
    cfg = FeaturizerConfig()
    assert cfg.samples_per_clip == 144000  # tfdataset.py:1028-1030
    assert cfg.stft_bins == 2049
    assert cfg.mel_frames == 513  # tfdataset.py:177
    assert cfg.input_shape == (160, 513, 1)


def test_no_empty_filters_at_training_defaults():
    w = M.mel_filterbank(48000, 160, 100, 11000, 4096, 1000)
    assert (w.max(axis=1) > 0).all()
