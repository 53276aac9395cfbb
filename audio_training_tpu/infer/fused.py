"""Fused waveform -> mel [-> PCEN] -> CNN logits inference.

This is the BASELINE north-star path (BASELINE.json): the whole per-window
stack that the reference runs as librosa-CPU-STFT + custommel + Keras predict
(predict.py:874-966, predict_utils.py:9-150) compiles into ONE jit graph:
featurizer (the fastest valid backend for the current device — the fully
fused Pallas framing+DFT+mel kernel on TPU at the production geometry,
matmul-FFT or rfft elsewhere; ops/featurizer_select.py) -> optional PCEN
(associative scan) -> CNN in bfloat16 -> float32 probabilities.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.featurizer_select import make_mel_fn
from audio_training_tpu.ops.pcen import pcen


def make_fused_infer_fn(
    module,
    variables,
    cfg: FeaturizerConfig,
    use_pcen: bool = False,
    use_pallas: bool = True,
    channels: int = 1,
    probabilities: bool = False,
    precision: str = "highest",
) -> Callable[[jax.Array], jax.Array]:
    """Build jit fn: raw (B, samples) float32 -> logits/probs (B, L).

    ``use_pallas=False`` forces the plain rfft+einsum featurizer (useful
    for CPU debugging); otherwise the fastest valid backend is selected
    (``ops.featurizer_select.make_mel_fn``).
    """
    mel_fn = make_mel_fn(
        cfg, backend="auto" if use_pallas else "rfft", precision=precision
    )

    @jax.jit
    def infer(raw: jax.Array) -> jax.Array:
        mel = mel_fn(raw)  # (B, M, T)
        if use_pcen:
            mel = pcen(mel, time_axis=2)
        x = mel[..., None]
        if channels > 1:
            x = jnp.repeat(x, channels, axis=-1)
        out = module.apply(variables, x, train=False)
        if probabilities:
            out = jax.nn.sigmoid(out)
        return out

    return infer
