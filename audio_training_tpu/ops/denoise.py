"""Spectral-gating denoise (predict.denoise_spec, predict.py:125-184 /
denoisetest.py capability): estimate a per-frequency noise profile from the
quietest frames, build a soft time-frequency mask, resynthesize.

Runs as one jit graph (stft -> mask -> istft) so batched recordings denoise
on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from audio_training_tpu.ops.stft import istft_centered, stft_centered


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "n_std", "noise_frames", "length"),
)
def spectral_gate(
    x: jax.Array,
    n_fft: int = 2048,
    hop: int = 512,
    n_std: float = 1.5,
    noise_frames: int = 32,
    length: int | None = None,
) -> jax.Array:
    """Denoise (B, samples) waveforms by gating bins below
    ``noise_mean + n_std * noise_std`` of the quietest frames' profile."""
    if length is None:
        length = x.shape[-1]
    spec = stft_centered(x, n_fft, hop)  # (B, F, T)
    mag = jnp.abs(spec)
    # noise profile: the lowest-energy frames
    frame_energy = mag.sum(axis=1)  # (B, T)
    order = jnp.argsort(frame_energy, axis=-1)[:, :noise_frames]
    quiet = jnp.take_along_axis(mag, order[:, None, :], axis=2)
    noise_mean = quiet.mean(axis=2, keepdims=True)
    noise_std = quiet.std(axis=2, keepdims=True)
    thresh = noise_mean + n_std * noise_std
    # soft sigmoid mask around the threshold
    mask = jax.nn.sigmoid((mag - thresh) / (thresh + 1e-8) * 4.0)
    return istft_centered(spec * mask, n_fft, hop, length)
