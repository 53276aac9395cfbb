"""Plotting helpers (plot_utils.py parity): mel spectrograms with optional
signal rectangles."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_mel(mel: np.ndarray, path: str | Path | None = None, title=""):
    """Log-mel image (plot_utils.plot_mel, plot_utils.py:116)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(12, 8))
    log_spec = np.log(np.asarray(mel) + np.finfo(float).eps)
    ax.pcolormesh(
        np.arange(log_spec.shape[1]), np.arange(log_spec.shape[0]), log_spec
    )
    ax.set_title(title or "Mel spectrogram")
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    if path is not None:
        fig.savefig(str(path), format="png")
        plt.close(fig)
    return fig


def plot_mel_signals(
    mel: np.ndarray,
    signals,
    sr: int = 48000,
    hop_length: int = 281,
    path: str | Path | None = None,
):
    """Mel image with signal/track rectangles (plot_utils.plot_mel_signals,
    plot_utils.py:23)."""
    plt = _plt()
    from matplotlib.patches import Rectangle

    fig = plot_mel(mel)
    ax = fig.axes[0]
    n_mels = mel.shape[0]
    for s in signals:
        x0 = s.start * sr / hop_length
        x1 = s.end * sr / hop_length
        # crude mel-bin placement from frequency fractions of Nyquist
        y0 = (s.freq_start / (sr / 2)) * n_mels
        y1 = (s.freq_end / (sr / 2)) * n_mels
        ax.add_patch(
            Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False,
                      edgecolor="red", linewidth=1.5)
        )
    if path is not None:
        fig.savefig(str(path), format="png")
        plt.close(fig)
    return fig


def plot_waveform(data: np.ndarray, sr: int, path: str | Path | None = None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(12, 4))
    t = np.arange(len(data)) / sr
    ax.plot(t, data, linewidth=0.3)
    ax.set_xlabel("seconds")
    if path is not None:
        fig.savefig(str(path), format="png")
        plt.close(fig)
    return fig
