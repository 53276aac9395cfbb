"""Fused waveform -> mel [-> PCEN] -> CNN logits inference.

This is the BASELINE north-star path (BASELINE.json): the whole per-window
stack that the reference runs as librosa-CPU-STFT + custommel + Keras predict
(predict.py:874-966, predict_utils.py:9-150) compiles into ONE jit graph:
framing gather -> rFFT -> fused power+mel (Pallas) -> optional PCEN
(associative scan) -> CNN in bfloat16 -> float32 probabilities.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.features import build_mel_weights
from audio_training_tpu.ops.pallas.melspec import default_interpret, fused_power_mel
from audio_training_tpu.ops.pcen import pcen
from audio_training_tpu.ops.stft import stft_tf_style


def make_fused_infer_fn(
    module,
    variables,
    cfg: FeaturizerConfig,
    use_pcen: bool = False,
    use_pallas: bool = True,
    channels: int = 1,
    probabilities: bool = False,
) -> Callable[[jax.Array], jax.Array]:
    """Build jit fn: raw (B, samples) float32 -> logits/probs (B, L)."""
    mel_w = jnp.asarray(build_mel_weights(cfg))
    mel_w_t = mel_w.T
    n_fft, hop = cfg.n_fft, cfg.hop_length

    @jax.jit
    def infer(raw: jax.Array) -> jax.Array:
        spec = stft_tf_style(raw, n_fft, hop)  # (B, T, F)
        if use_pallas:
            mel_tm = fused_power_mel(
                jnp.real(spec), jnp.imag(spec), mel_w_t,
                interpret=default_interpret(),
            )  # (B, T, M)
            mel = jnp.swapaxes(mel_tm, 1, 2)  # (B, M, T)
        else:
            p = spec.real**2 + spec.imag**2
            mel = jnp.einsum(
                "mf,btf->bmt", mel_w, p, preferred_element_type=jnp.float32
            )
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
