"""Mel filterbank with configurable break frequency.

Numerical-parity target: the reference ``custommel.py:6-61``, which clones the
librosa mel filterbank but generalizes the mel-scale break frequency
(``hz_to_mel = 2595*log10(1 + f/break)``; librosa/HTK uses break=700).  The
filterbank is built once on the host in float64/float32 numpy and baked into
the jit-compiled featurizer as a constant — on TPU the mel projection is then
a single MXU matmul.
"""

from __future__ import annotations

import numpy as np

HTK_BREAK_FREQ = 700.0


def hz_to_mel(frequencies, break_freq: float):
    """Generalized HTK-style hz->mel (custommel.py:6-8)."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    return 2595.0 * np.log10(1.0 + frequencies / break_freq)


def mel_to_hz(mels, break_freq: float):
    mels = np.asarray(mels, dtype=np.float64)
    return break_freq * (10.0 ** (mels / 2595.0) - 1.0)


def mel_frequencies(n_mels: int, fmin: float, fmax: float, break_freq: float):
    """Uniformly spaced mel-band center frequencies (custommel.py:11-15)."""
    min_mel = hz_to_mel(fmin, break_freq)
    max_mel = hz_to_mel(fmax, break_freq)
    mels = np.linspace(min_mel, max_mel, n_mels)
    return mel_to_hz(mels, break_freq)


def fft_frequencies(sr: float, n_fft: int):
    """Center frequency of each rFFT bin (librosa.fft_frequencies)."""
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, endpoint=True)


def mel_filterbank(
    sr: float,
    n_mels: int,
    fmin: float,
    fmax: float,
    n_fft: int,
    break_freq: float = 1750.0,
) -> np.ndarray:
    """Triangular mel weights with Slaney normalization (custommel.py:18-54).

    Returns ``(n_mels, 1 + n_fft//2)`` float32.
    """
    n_mels = int(n_mels)
    weights = np.zeros((n_mels, int(1 + n_fft // 2)), dtype=np.float32)

    fftfreqs = fft_frequencies(sr=sr, n_fft=n_fft)
    centers = mel_frequencies(n_mels + 2, fmin, fmax, break_freq)

    fdiff = np.diff(centers)
    ramps = np.subtract.outer(centers, fftfreqs)

    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))

    # Slaney: approximately constant energy per channel
    enorm = 2.0 / (centers[2 : n_mels + 2] - centers[:n_mels])
    weights *= enorm[:, np.newaxis].astype(np.float32)

    if not np.all((centers[:-2] == 0) | (weights.max(axis=1) > 0)):
        import logging

        logging.getLogger(__name__).warning(
            "Empty filters detected in mel frequency basis; some channels "
            "will produce empty responses (increase sr/fmax or reduce n_mels)."
        )
    return weights


# Backwards-compatible alias matching the reference public name
# (custommel.mel_f, custommel.py:18)
mel_f = mel_filterbank


def mel_spec(
    stft,
    sr: float,
    n_fft: int,
    hop_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    break_freq: float = 1750.0,
    power: int = 2,
) -> np.ndarray:
    """Host (numpy) mel spectrogram from a complex STFT (custommel.py:57-61).

    ``stft`` is ``(freq_bins, frames)`` complex; output ``(n_mels, frames)``.
    The on-device equivalent lives in :mod:`audio_training_tpu.ops.features`.
    """
    magnitude = np.abs(stft) ** power
    mels = mel_filterbank(sr, n_mels, fmin, fmax, n_fft, break_freq)
    return mels.dot(magnitude)
