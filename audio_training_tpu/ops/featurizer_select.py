"""Featurizer backend selection.

Implementations of waveform -> (B, M, T) mel power (tf-stft convention),
fastest first:

* ``fused`` — the fully-fused Pallas kernel (framing + two-stage matmul-DFT
  + mel in VMEM, ops/pallas/fused_featurizer.py); needs n_fft=4096 and
  filterbank support within the first 1024 bins.
  ~2x the matmul-FFT at exact parity, ~4x at bf16 (measured on-chip, see
  docs/PERFORMANCE.md).
* ``matmul`` — radix-64 matmul-FFT in XLA; needs n_fft=4096.
* ``rfft`` — gather-free framing + jnp.fft.rfft + fused power/mel; works for
  any geometry (and on CPU without interpret overhead).
``auto`` picks the fastest valid one for the current backend: ``fused`` on
TPU when the geometry allows, else ``matmul``/``rfft``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.features import build_mel_weights


def make_mel_fn(
    cfg: FeaturizerConfig,
    mel_weights: np.ndarray | None = None,
    backend: str = "auto",
    precision: str = "highest",
) -> Callable[[jax.Array], jax.Array]:
    """Returns fn(raw (B, n)) -> (B, n_mels, frames) float32 mel power."""
    w = mel_weights if mel_weights is not None else build_mel_weights(cfg)
    radix_ok = cfg.n_fft == 4096

    if backend == "auto":
        if radix_ok and jax.default_backend() == "tpu":
            try:
                return make_fused_featurizer(cfg, w, precision)
            except ValueError:
                pass  # geometry outside the fused kernel's constraints
        backend = "matmul" if radix_ok else "rfft"

    if backend == "fused":
        return make_fused_featurizer(cfg, w, precision)

    if backend == "matmul":
        from audio_training_tpu.ops.fftmel import MatmulMelPlan

        plan = MatmulMelPlan(w, cfg.n_fft, cfg.hop_length,
                             precision=precision)
        return plan
    if backend == "rfft":
        from audio_training_tpu.ops.stft import stft_tf_style

        w_dev = jnp.asarray(w)

        def rfft_mel(raw):
            spec = stft_tf_style(raw, cfg.n_fft, cfg.hop_length)
            p = spec.real**2 + spec.imag**2
            return jnp.einsum(
                "mf,btf->bmt", w_dev, p,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        return rfft_mel
    raise ValueError(f"unknown featurizer backend {backend}")


def make_fused_featurizer(
    cfg: FeaturizerConfig,
    mel_weights: np.ndarray,
    precision: str = "highest",
) -> Callable[[jax.Array], jax.Array]:
    """Mel-power fn backed by the fully-fused Pallas kernel (raises
    ValueError when the geometry falls outside its constraints)."""
    from audio_training_tpu.ops.pallas.fused_featurizer import FusedFeaturizer

    fz = FusedFeaturizer(mel_weights, cfg.n_fft, cfg.hop_length,
                         precision=precision)
    return lambda raw: fz(raw, pcen=False)
