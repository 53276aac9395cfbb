"""Fused power-spectrum + mel-projection Pallas TPU kernel.

The training featurizer (tfdataset.raw_to_mel, tfdataset.py:2026-2051)
computes ``|stft|^2`` (B,T,F) and then a mel matmul.  Done naively, the power
spectrogram round-trips through HBM: for a batch of 32 clips that is
32*513*2049*4 B = 134 MB of intermediate traffic each way.  This kernel fuses
the squared-modulus (VPU) into the mel contraction (MXU): the complex STFT
tiles are streamed HBM->VMEM once, squared in registers, and contracted with
the resident mel weight matrix, writing only the (B,T,M) mel output.

Grid: (B, T//TILE_T).  The mel weights (F_pad, M_pad) stay resident in VMEM
across all grid steps (index_map returns the same block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def default_interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret elsewhere (CPU
    tests / virtual meshes)."""
    return jax.default_backend() != "tpu"


def _power_mel_kernel(re_ref, im_ref, w_ref, out_ref):
    re = re_ref[0]
    im = im_ref[0]
    power = re * re + im * im  # VPU, fused with the load
    out_ref[0] = jnp.dot(
        power, w_ref[:], precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("tile_t", "interpret"))
def fused_power_mel(
    stft_re: jax.Array,
    stft_im: jax.Array,
    mel_weights_t: jax.Array,
    tile_t: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """``out[b, t, m] = sum_f (re^2 + im^2)[b, t, f] * W[f, m]``.

    Args:
      stft_re / stft_im: (B, T, F) float32 — real/imag parts of the STFT.
      mel_weights_t: (F, M) float32 — transposed mel filterbank.
      tile_t: time-tile size (multiple of 8).
      interpret: run in interpreter mode (CPU tests).

    Returns (B, T, M) float32 mel power spectrogram (time-major; callers
    wanting the reference (B, M, T) layout transpose the result — a free
    layout change under XLA fusion).
    """
    b, t, f = stft_re.shape
    f2, m = mel_weights_t.shape
    assert f2 == f, (f2, f)

    t_pad = _round_up(t, tile_t)
    f_pad = _round_up(f, 128)
    m_pad = _round_up(m, 128)

    if t_pad != t or f_pad != f:
        pad = [(0, 0), (0, t_pad - t), (0, f_pad - f)]
        stft_re = jnp.pad(stft_re, pad)
        stft_im = jnp.pad(stft_im, pad)
    if f_pad != f or m_pad != m:
        mel_weights_t = jnp.pad(
            mel_weights_t, [(0, f_pad - f), (0, m_pad - m)]
        )

    grid = (b, t_pad // tile_t)
    out = pl.pallas_call(
        _power_mel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_t, f_pad),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_t, f_pad),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f_pad, m_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, m_pad), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * f_pad * m_pad + 3 * b * t_pad * f_pad,
            bytes_accessed=2 * b * t_pad * f_pad * 4 + b * t_pad * m_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(stft_re, stft_im, mel_weights_t)
    return out[:, :t, :m]


def mel_power_spectrogram(
    raw: jax.Array,
    mel_weights: jax.Array,
    n_fft: int,
    hop: int,
    interpret: bool | None = None,
) -> jax.Array:
    """Waveform (B, N) -> mel power (B, M, T) using the fused kernel.

    Drop-in accelerated replacement for the XLA einsum path in
    :func:`audio_training_tpu.ops.features.raw_to_mel` (channels handled by
    the caller).
    """
    from audio_training_tpu.ops.stft import stft_tf_style

    if interpret is None:
        interpret = default_interpret()
    spec = stft_tf_style(raw, n_fft, hop)  # (B, T, F)
    out = fused_power_mel(
        jnp.real(spec), jnp.imag(spec), mel_weights.T, interpret=interpret
    )
    return jnp.swapaxes(out, 1, 2)
