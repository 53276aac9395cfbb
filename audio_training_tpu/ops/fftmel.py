"""Matmul-FFT mel spectrogram — the speed-of-light featurizer for TPU.

``jnp.fft.rfft`` runs on the VPU and dominates the fused inference profile
(~70 ms of a 165 ms batch at B=256).  This module replaces it with a
two-stage radix-64 Cooley-Tukey DFT expressed entirely as matmuls, which XLA
places on the MXU:

    frame (4096,) -> reshape (64, 64)
    stage 1: A = D64 @ x2              (real input: 2 real matmuls)
    twiddle: B = A * e^{-2*pi*i*k1*n2/4096}
    stage 2: X[k1,k2] = sum_n2 B[k1,n2] * D64[n2,k2]
    bin k = k1 + 64*k2

and — the structural win — computes ONLY the frequency bins the mel
filterbank actually reads: with fmax=11 kHz the highest nonzero mel weight
sits at bin ~940 of 2049, so stage 2 needs 15 of 64 columns.  The power
spectrum and mel projection fold into the same einsum chain, so the full
waveform->mel map is 5 MXU matmuls with no complex FFT anywhere.

Numerical parity with the rfft path is ~1e-4 relative (f32 accumulate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.ops.stft import _frame, hann_window, num_frames_tf

RADIX = 64


def _dft_matrix(n: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    w = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _twiddle(n_fft: int, k2_cols: int) -> tuple[np.ndarray, np.ndarray]:
    k1 = np.arange(RADIX)[:, None]
    n2 = np.arange(RADIX)[None, :]
    w = np.exp(-2j * np.pi * k1 * n2 / n_fft)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def plan_bins(mel_weights: np.ndarray) -> int:
    """Number of stage-2 columns needed to cover the filterbank support."""
    support = np.flatnonzero(np.asarray(mel_weights).max(axis=0) > 0)
    max_bin = int(support[-1]) if support.size else mel_weights.shape[1] - 1
    return min(-(-(max_bin + 1) // RADIX), RADIX)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop", "k2_cols", "out_dtype", "center"),
)
def mel_power_matmul(
    raw: jax.Array,
    mel_w_packed: jax.Array,
    n_fft: int = 4096,
    hop: int = 281,
    k2_cols: int = 15,
    out_dtype=jnp.float32,
    center: bool = False,
) -> jax.Array:
    """(B, samples) waveform -> (B, M, T) mel power spectrogram.

    ``mel_w_packed`` is the (M, 64, k2_cols) filterbank with bins rearranged
    to the (k1, k2) layout (see :func:`pack_mel_weights`).  ``center=True``
    uses the librosa inference convention (constant pad by n_fft//2,
    predict_utils.get_spect); False the tf.signal training convention.
    """
    assert n_fft == RADIX * RADIX, "radix-64 plan expects n_fft=4096"
    b = raw.shape[0]
    if center:
        from audio_training_tpu.ops.stft import num_frames_centered

        frames = num_frames_centered(raw.shape[-1], hop)
        half = n_fft // 2
        raw = jnp.pad(raw, ((0, 0), (half, half)))
    else:
        frames = num_frames_tf(raw.shape[-1], hop)
    x = _frame(raw, frames, n_fft, hop) * hann_window(n_fft)
    # n = 64*n1 + n2  ->  x2[..., n1, n2]
    x2 = x.reshape(b, frames, RADIX, RADIX)

    d_re, d_im = _dft_matrix(RADIX)
    tw_re, tw_im = _twiddle(n_fft, k2_cols)
    tw_re = jnp.asarray(tw_re)
    tw_im = jnp.asarray(tw_im)

    d_re_j = jnp.asarray(d_re)
    d_im_j = jnp.asarray(d_im)
    # stage 1 over n1 (real input -> 2 real matmuls)
    a_re = jnp.einsum("fn,btnm->btfm", d_re_j, x2,
                      preferred_element_type=jnp.float32)
    a_im = jnp.einsum("fn,btnm->btfm", d_im_j, x2,
                      preferred_element_type=jnp.float32)
    # twiddle (elementwise complex)
    b_re = a_re * tw_re - a_im * tw_im
    b_im = a_re * tw_im + a_im * tw_re
    # stage 2 over n2, restricted to the k2 columns the filterbank reads
    d2_re = d_re_j[:, :k2_cols]
    d2_im = d_im_j[:, :k2_cols]
    x_re = (
        jnp.einsum("btfm,mk->btfk", b_re, d2_re,
                   preferred_element_type=jnp.float32)
        - jnp.einsum("btfm,mk->btfk", b_im, d2_im,
                     preferred_element_type=jnp.float32)
    )
    x_im = (
        jnp.einsum("btfm,mk->btfk", b_re, d2_im,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("btfm,mk->btfk", b_im, d2_re,
                     preferred_element_type=jnp.float32)
    )
    power = x_re * x_re + x_im * x_im  # (B, T, 64, k2_cols)
    mel = jnp.einsum(
        "btfk,mfk->bmt", power, mel_w_packed,
        preferred_element_type=jnp.float32,
    )
    return mel.astype(out_dtype)


def pack_mel_weights(mel_weights: np.ndarray, k2_cols: int) -> np.ndarray:
    """(M, 1 + n_fft//2) filterbank -> (M, 64, k2_cols) in (k1, k2) bin
    layout (bin k = k1 + 64*k2); bins beyond the kept columns must be zero
    weight (guaranteed by :func:`plan_bins`)."""
    m, n_bins = mel_weights.shape
    total = RADIX * k2_cols
    padded = np.zeros((m, total), np.float32)
    padded[:, : min(n_bins, total)] = mel_weights[:, :total]
    # k = k1 + 64*k2: for fixed k2 the k1 axis is the contiguous bin block
    # [64*k2, 64*k2 + 64)
    return padded.reshape(m, k2_cols, RADIX).transpose(0, 2, 1).copy()


def _pack_check():  # pragma: no cover - dev helper
    w = np.arange(2049 * 2, dtype=np.float32).reshape(2, 2049)
    p = pack_mel_weights(w, 15)
    for k in range(0, 900, 97):
        k1, k2 = k % RADIX, k // RADIX
        assert p[0, k1, k2] == w[0, k], k


class MatmulMelPlan:
    """Precomputed plan: build once per featurizer config, call on batches."""

    def __init__(self, mel_weights: np.ndarray, n_fft: int = 4096,
                 hop: int = 281, center: bool = False):
        if n_fft != RADIX * RADIX:
            raise ValueError("matmul-FFT plan requires n_fft=4096")
        self.n_fft = n_fft
        self.hop = hop
        self.center = center
        self.k2_cols = plan_bins(mel_weights)
        self.packed = jnp.asarray(pack_mel_weights(mel_weights, self.k2_cols))

    def __call__(self, raw: jax.Array, out_dtype=jnp.float32) -> jax.Array:
        return mel_power_matmul(
            raw, self.packed, n_fft=self.n_fft, hop=self.hop,
            k2_cols=self.k2_cols, out_dtype=out_dtype, center=self.center,
        )
