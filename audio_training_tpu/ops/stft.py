"""Short-time Fourier transform for TPU via XLA.

Two framing conventions exist in the reference stack and both are provided:

* ``stft_tf_style`` — ``tf.signal.stft(..., pad_end=True)`` semantics used by
  the training pipeline (``tfdataset.py:2026-2034``): frames start at
  ``t*hop`` from sample 0 and the tail is zero-padded so the number of frames
  is ``ceil(n/hop)`` (513 for 3 s @ 48 kHz, hop 281).
* ``stft_centered`` — librosa semantics used by offline/inference
  featurization (``audiodataset.py:1303``, ``predict_utils.py:163-239``):
  the signal is padded by ``n_fft//2`` on both sides so frame ``t`` is
  centered at ``t*hop``; frame count is ``1 + n//hop``.

Framing is expressed as a gather with a precomputed index matrix — XLA lowers
this to an efficient dynamic-slice loop on TPU — followed by a batched real
FFT, which XLA maps to the TPU FFT implementation.  All shapes are static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — matches ``tf.signal.hann_window`` and
    librosa's default ``get_window('hann', fftbins=True)``."""
    k = np.arange(n, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


def num_frames_tf(n_samples: int, hop: int) -> int:
    return -(-n_samples // hop)


def num_frames_centered(n_samples: int, hop: int) -> int:
    return 1 + n_samples // hop


def _frame(x: jax.Array, frames: int, n_fft: int, hop: int) -> jax.Array:
    """Extract (..., frames, n_fft) windows starting at t*hop.

    TPU-friendly framing: instead of a (frames, n_fft) index gather (random
    access, ~10x slower on TPU), the signal is cut into hop-width segments
    and k = ceil(n_fft/hop) *contiguous shifted slices* of the segment array
    are stacked — frame t is then the first n_fft samples of segments
    t..t+k-1.  XLA lowers the slices to plain copies.
    """
    k = -(-n_fft // hop)  # segments spanned by one window
    total = (frames + k) * hop
    pad = total - x.shape[-1]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    seg = x.reshape(x.shape[:-1] + (frames + k, hop))
    parts = [seg[..., r : r + frames, :] for r in range(k)]
    stacked = jnp.concatenate(parts, axis=-1)  # (..., frames, k*hop)
    return stacked[..., :n_fft]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "window"))
def stft_tf_style(x: jax.Array, n_fft: int, hop: int, window: bool = True):
    """``tf.signal.stft(x, n_fft, hop, fft_length=n_fft, pad_end=True)``.

    x: (..., n_samples) real. Returns (..., frames, n_fft//2+1) complex64.
    """
    n = x.shape[-1]
    frames = num_frames_tf(n, hop)
    framed = _frame(x, frames, n_fft, hop)
    if window:
        framed = framed * hann_window(n_fft)
    return jnp.fft.rfft(framed, n=n_fft, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "window", "pad_mode")
)
def stft_centered(
    x: jax.Array,
    n_fft: int,
    hop: int,
    window: bool = True,
    pad_mode: str = "constant",
):
    """librosa-style centered STFT.

    x: (..., n_samples). Returns (..., n_fft//2+1, frames) complex64 — note
    the librosa (freq, time) axis order, matching ``librosa.stft``.
    """
    n = x.shape[-1]
    frames = num_frames_centered(n, hop)
    half = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)], mode=pad_mode)
    framed = _frame(x, frames, n_fft, hop)
    if window:
        framed = framed * hann_window(n_fft)
    spec = jnp.fft.rfft(framed, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def istft_centered(spec: jax.Array, n_fft: int, hop: int, length: int):
    """Inverse of :func:`stft_centered` with Hann overlap-add (used by the
    spectral-gating denoise path, predict.py:125-184)."""
    spec = jnp.swapaxes(spec, -1, -2)  # (..., frames, bins)
    frames = spec.shape[-2]
    w = hann_window(n_fft)
    chunks = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w

    total = (frames - 1) * hop + n_fft
    out_shape = spec.shape[:-2] + (total,)
    out = jnp.zeros(out_shape, chunks.dtype)
    win_sum = np.zeros(total, np.float64)
    wsq = (w.astype(np.float64)) ** 2
    for t in range(frames):
        win_sum[t * hop : t * hop + n_fft] += wsq
    idx = np.arange(frames)[:, None] * hop + np.arange(n_fft)[None, :]
    out = out.at[..., idx.reshape(-1)].add(chunks.reshape(*chunks.shape[:-2], -1))
    win_sum = np.where(win_sum > 1e-10, win_sum, 1.0)
    out = out / jnp.asarray(win_sum, chunks.dtype)
    half = n_fft // 2
    return out[..., half : half + length]
