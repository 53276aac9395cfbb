"""Fused FFT+mel Pallas TPU kernel.

The XLA matmul-FFT path (ops/fftmel.py) materializes both DFT stages in HBM
(~10 GB of traffic per 256-clip batch).  This kernel loads each block of
framed audio once and runs window -> radix-64 DFT stages -> twiddle -> power
-> mel projection entirely in VMEM as MXU matmuls, writing only the
(rows, n_mels) mel block.  HBM traffic: the framed signal in (2.1 GB — built
by the gather-free slicer in ops/stft._frame; Mosaic cannot express the
unaligned overlapped frame loads in-kernel) and the mel image out (~50 MB).

Layout notes:
* stage 1 contracts n1 via one (64, rows*64) GEMM after an in-VMEM transpose;
* stage-2 columns are padded 15 -> 16 so the (k1*rows, 16) GEMM stays aligned;
* the mel weights arrive packed as (64*16, M_pad) in (k1, k2) bin order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_training_tpu.ops.fftmel import RADIX, _dft_matrix, _twiddle, plan_bins
from audio_training_tpu.ops.stft import _frame, hann_window, num_frames_tf

K2_PAD = 16  # stage-2 columns kept (>= the 15 the 11 kHz filterbank needs)
TILE_ROWS = 64  # frames per grid step


def _constants(n_fft: int):
    d_re, d_im = _dft_matrix(RADIX)
    tw_re, tw_im = _twiddle(n_fft, RADIX, RADIX)
    d2_re = np.zeros((RADIX, K2_PAD), np.float32)
    d2_im = np.zeros((RADIX, K2_PAD), np.float32)
    d2_re[:, :K2_PAD] = d_re[:, :K2_PAD]
    d2_im[:, :K2_PAD] = d_im[:, :K2_PAD]
    return d_re, d_im, tw_re, tw_im, d2_re, d2_im


def _kernel(frames_ref, d_ref, tw_ref, d2_ref, win_ref, melw_ref, out_ref):
    d_re = d_ref[0]
    d_im = d_ref[1]
    tw_re = tw_ref[0][:, None, :]
    tw_im = tw_ref[1][:, None, :]
    d2_re = d2_ref[0]
    d2_im = d2_ref[1]

    fr = frames_ref[:] * win_ref[0]
    x2 = fr.reshape(TILE_ROWS, RADIX, RADIX)
    y = jnp.swapaxes(x2, 0, 1).reshape(RADIX, TILE_ROWS * RADIX)
    a_re = jnp.dot(d_re, y, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    a_im = jnp.dot(d_im, y, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    a_re = a_re.reshape(RADIX, TILE_ROWS, RADIX)
    a_im = a_im.reshape(RADIX, TILE_ROWS, RADIX)
    b_re = a_re * tw_re - a_im * tw_im
    b_im = a_re * tw_im + a_im * tw_re
    z_re = b_re.reshape(RADIX * TILE_ROWS, RADIX)
    z_im = b_im.reshape(RADIX * TILE_ROWS, RADIX)
    x_re = (
        jnp.dot(z_re, d2_re, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        - jnp.dot(z_im, d2_im, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    )
    x_im = (
        jnp.dot(z_re, d2_im, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
        + jnp.dot(z_im, d2_re, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    )
    power = x_re * x_re + x_im * x_im  # (64*rows, K2_PAD)
    p = power.reshape(RADIX, TILE_ROWS, K2_PAD)
    p = jnp.swapaxes(p, 0, 1).reshape(TILE_ROWS, RADIX * K2_PAD)
    out_ref[:] = jnp.dot(p, melw_ref[:], precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "interpret"))
def fused_fft_mel_frames(
    frames: jax.Array,
    melw_flat: jax.Array,
    n_fft: int = 4096,
    interpret: bool = False,
) -> jax.Array:
    """(N, n_fft) framed audio -> (N, M_pad) mel power rows."""
    n, width = frames.shape
    assert width == n_fft == RADIX * RADIX
    n_pad = -(-n // TILE_ROWS) * TILE_ROWS
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    n_mels_pad = melw_flat.shape[1]

    d_re, d_im, tw_re, tw_im, d2_re, d2_im = _constants(n_fft)
    d_c = jnp.asarray(np.stack([d_re, d_im]))
    tw_c = jnp.asarray(np.stack([tw_re, tw_im]))
    d2_c = jnp.asarray(np.stack([d2_re, d2_im]))
    win_c = jnp.asarray(hann_window(n_fft))[None, :]

    def const_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // TILE_ROWS,),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec((2, RADIX, RADIX)),
            const_spec((2, RADIX, RADIX)),
            const_spec((2, RADIX, K2_PAD)),
            const_spec((1, n_fft)),
            pl.BlockSpec((RADIX * K2_PAD, n_mels_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, n_mels_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * (2 * RADIX**3 * 2 + 4 * RADIX**2 * K2_PAD
                               + 2 * RADIX * K2_PAD * n_mels_pad)),
            bytes_accessed=int(n_pad * n_fft * 4 + n_pad * n_mels_pad * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(frames, d_c, tw_c, d2_c, win_c, melw_flat)
    return out[:n]


class FusedFFTMelPlan:
    """Waveform -> (B, M, T) mel power via the fused FFT+mel kernel."""

    def __init__(self, mel_weights: np.ndarray, n_fft: int = 4096,
                 hop: int = 281):
        from audio_training_tpu.ops.fftmel import pack_mel_weights

        if n_fft != RADIX * RADIX:
            raise ValueError("fused kernel requires n_fft=4096")
        if plan_bins(mel_weights) > K2_PAD:
            raise ValueError(
                "filterbank support exceeds the kernel's frequency range "
                f"(needs <= bin {RADIX * K2_PAD - 1})"
            )
        self.n_fft = n_fft
        self.hop = hop
        self.n_mels = mel_weights.shape[0]
        self.m_pad = -(-self.n_mels // 128) * 128
        packed = pack_mel_weights(mel_weights, K2_PAD)  # (M, 64, K2_PAD)
        flat = packed.reshape(self.n_mels, RADIX * K2_PAD).T
        flat_pad = np.zeros((RADIX * K2_PAD, self.m_pad), np.float32)
        flat_pad[:, : self.n_mels] = flat
        self.melw_flat = jnp.asarray(flat_pad)

    def __call__(self, raw: jax.Array, interpret: bool | None = None
                 ) -> jax.Array:
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        b = raw.shape[0]
        frames = num_frames_tf(raw.shape[-1], self.hop)
        framed = _frame(raw, frames, self.n_fft, self.hop)
        out = fused_fft_mel_frames(
            framed.reshape(b * frames, self.n_fft), self.melw_flat,
            n_fft=self.n_fft, interpret=interpret,
        )
        out = out[:, : self.n_mels].reshape(b, frames, self.n_mels)
        return jnp.swapaxes(out, 1, 2)
