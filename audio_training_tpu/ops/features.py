"""Featurization ops: waveform -> mel image, normalizers, mixup, masking.

These are the TPU-native equivalents of the reference's per-batch ``tf.data``
maps (``tfdataset.py:1883-2059``) — pure jax functions designed to fuse into a
single jit/pjit preprocessing graph that runs on device right before the model
forward pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.mel import mel_filterbank
from audio_training_tpu.ops.stft import stft_centered, stft_tf_style

# ---------------------------------------------------------------------------
# Elementwise transforms
# ---------------------------------------------------------------------------


def mag_transform(x: jax.Array, a: jax.Array | float) -> jax.Array:
    """Trainable magnitude compression ``x**sigmoid(a)``
    (badwinner2.MagTransform, badwinner2.py:47-49)."""
    return x ** jax.nn.sigmoid(jnp.asarray(a, x.dtype))


def power_to_db(mel: jax.Array) -> jax.Array:
    """librosa.power_to_db equivalent (tfdataset.py:1906-1913): dB relative to
    the global max, floored at max-80."""
    ref_v = jnp.max(mel)
    amin = 1e-10
    out = 10.0 * jnp.log10(jnp.maximum(amin, mel))
    out = out - 10.0 * jnp.log10(jnp.maximum(amin, ref_v))
    return jnp.maximum(out, jnp.max(out) - 80.0)


def normalize_minmax(data: jax.Array) -> jax.Array:
    """Global min-max to [-1, 1] (tfdataset.py:1897-1902)."""
    max_v = jnp.max(data)
    min_v = jnp.min(data)
    return 2.0 * ((data - min_v) / (max_v - min_v)) - 1.0


def normalize_std(data: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Global standardization (tfdataset.py:1883-1893)."""
    return (data - jnp.mean(data)) / (jnp.std(data) + eps)


def normalize_rows(x: jax.Array) -> jax.Array:
    """Per-last-axis min-max used after mixup (tfdataset.normalize,
    tfdataset.py:1916-1934): subtract row min, divide by row max (of the
    shifted data), add 1e-6, then map to [-1, 1]."""
    min_v = jnp.min(x, axis=-1, keepdims=True)
    x = x - min_v
    max_v = jnp.max(x, axis=-1, keepdims=True)
    x = x / max_v + 0.000001
    return (x - 0.5) * 2.0


def normalize_waveform(x: jax.Array) -> jax.Array:
    """Waveform min-max normalization used when building records
    (audiodataset.normalize_data, audiodataset.py:1334-1341)."""
    return normalize_rows(x)


# ---------------------------------------------------------------------------
# Waveform -> mel image
# ---------------------------------------------------------------------------


def build_mel_weights(cfg: FeaturizerConfig) -> np.ndarray:
    """Host-side constant mel matrix for a featurizer config."""
    break_freq = 700.0 if cfg.htk else cfg.break_freq
    return mel_filterbank(
        cfg.sr, cfg.n_mels, cfg.fmin, cfg.fmax, cfg.n_fft, break_freq
    )


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "power", "channels")
)
def raw_to_mel(
    raw: jax.Array,
    mel_weights: jax.Array,
    n_fft: int = 4096,
    hop: int = 281,
    power: int = 2,
    channels: int = 3,
) -> jax.Array:
    """Batched waveform -> mel image, training-pipeline convention
    (tfdataset.raw_to_mel, tfdataset.py:2008-2059).

    The reference squares the *complex* STFT then takes the modulus
    (tfdataset.py:2044-2046); since ``|z^2| == |z|^2`` this equals the power
    spectrogram, which is what we compute directly (cheaper: no complex
    multiply).  Output: ``(B, n_mels, frames, channels)``.
    """
    spec = stft_tf_style(raw, n_fft, hop)  # (B, T, F) complex
    p = spec.real**2 + spec.imag**2
    if power != 2:
        p = jnp.sqrt(p) ** power
    # (n_mels, F) @ (B, F, T) -> (B, n_mels, T); MXU matmul
    image = jnp.einsum(
        "mf,btf->bmt", mel_weights.astype(p.dtype), p,
        preferred_element_type=jnp.float32,
    )
    image = image[..., None]
    if channels > 1:
        image = jnp.repeat(image, channels, axis=-1)
    return image


def mel_from_waveform_centered(
    raw: jax.Array,
    mel_weights: jax.Array,
    n_fft: int,
    hop: int,
    power: int = 1,
) -> jax.Array:
    """Inference-featurizer convention (predict_utils.get_spect,
    predict_utils.py:163-239): librosa centered STFT, magnitude ``|stft|``
    (power=1 by default there), then mel projection.

    Output: ``(B, n_mels, frames)``.
    """
    spec = stft_centered(raw, n_fft, hop)  # (B, F, T)
    mag = jnp.sqrt(spec.real**2 + spec.imag**2)
    if power != 1:
        mag = mag**power
    return jnp.einsum(
        "mf,bft->bmt", mel_weights.astype(mag.dtype), mag,
        preferred_element_type=jnp.float32,
    )


def raw_to_mel_dual(
    raw: jax.Array,
    mel_weights_a: jax.Array,
    mel_weights_b: jax.Array,
    sr: int = 48000,
    params_a: tuple[int, int] = (2048, 278),
    params_b: tuple[int, int] = (1024, 280),
    band_a: tuple[float, float] = (0.0, 3000.0),
    band_b: tuple[float, float] = (500.0, 15000.0),
) -> tuple[jax.Array, jax.Array]:
    """Two band-limited mel views for ``dual-badwinner2``
    (tfdataset.raw_to_mel_dual, tfdataset.py:1818-1866): view A is a
    0-3 kHz 2048/278 mel, view B a 500 Hz-15 kHz 1024/280 mel.

    TPU-native deviation (documented): the reference band-limits with a
    host-side butterworth via ``tf.numpy_function`` — a sequential IIR
    that cannot run inside jit.  Here the band limit is applied in the
    frequency domain by masking power-spectrum bins outside [lo, hi]
    (brick-wall vs butterworth rolloff; the mel projection then sees the
    same pass band).  Returns ``((B, M_a, T_a, 1), (B, M_b, T_b, 1))``.
    """

    def view(w, n_fft, hop, lo, hi):
        spec = stft_tf_style(raw, n_fft, hop)  # (B, T, F)
        p = spec.real**2 + spec.imag**2
        freqs = jnp.arange(n_fft // 2 + 1) * (sr / n_fft)
        mask = ((freqs >= lo) & (freqs <= hi)).astype(p.dtype)
        p = p * mask[None, None, :]
        img = jnp.einsum(
            "mf,btf->bmt", w.astype(p.dtype), p,
            preferred_element_type=jnp.float32,
        )
        return img[..., None]

    return (
        view(mel_weights_a, *params_a, *band_a),
        view(mel_weights_b, *params_b, *band_b),
    )


def raw_to_mel_multi(
    raw: jax.Array,
    weight_sets: list[jax.Array],
    stft_params: list[tuple[int, int]],
) -> jax.Array:
    """Multi-scale RGB mel (tfdataset.raw_to_mel_rgb, tfdataset.py:1938-2004):
    one channel per (mel_weights, (n_fft, hop)) pair, concatenated on the
    channel axis."""
    images = []
    for w, (n_fft, hop) in zip(weight_sets, stft_params):
        img = raw_to_mel(raw, w, n_fft=n_fft, hop=hop, channels=1)
        images.append(img)
    return jnp.concatenate(images, axis=-1)


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------


def sample_beta(key: jax.Array, size: int, alpha: float) -> jax.Array:
    """Beta(alpha, alpha) via a gamma ratio, matching the reference's
    construction (tfdataset.sample_beta_distribution, tfdataset.py:920-924)."""
    k1, k2 = jax.random.split(key)
    g1 = jax.random.gamma(k1, alpha, (size,))
    g2 = jax.random.gamma(k2, alpha, (size,))
    return g1 / (g1 + g2)


def mix_up(
    key: jax.Array,
    images_one: jax.Array,
    labels_one: jax.Array,
    images_two: jax.Array,
    labels_two: jax.Array,
    alpha: float = 0.5,
    chance: float = 0.25,
    single_label: bool = True,
):
    """Batch mixup (tfdataset.mix_up, tfdataset.py:930-955).

    Each sample mixes with probability ``chance``; mixing weight is
    Beta(alpha, alpha) (zeroed when not mixing, so the un-mixed sample is
    entirely ``images_two`` — faithfully matching the reference, where
    ``l=0`` selects image two).  ``single_label=True`` hard-thresholds the
    label weight at 0.5 instead of soft label interpolation.
    """
    batch = images_one.shape[0]
    l = sample_mix_weights(key, batch, alpha=alpha, chance=chance)
    images = apply_mix(l, images_one, images_two)
    labels = mix_labels(l, labels_one, labels_two, single_label=single_label)
    return images, labels


def sample_mix_weights(
    key: jax.Array, batch: int, alpha: float = 0.5, chance: float = 0.25
) -> jax.Array:
    """Per-sample mixup weight: Beta(alpha, alpha) gated by ``chance``
    (zero = take sample two unchanged, tfdataset.py:934-940)."""
    k1, k2 = jax.random.split(key)
    l = sample_beta(k1, batch, alpha)
    aug = (jax.random.uniform(k2, (batch,)) < chance).astype(l.dtype)
    return l * aug


def apply_mix(l: jax.Array, one: jax.Array, two: jax.Array) -> jax.Array:
    """``one * l + two * (1-l)`` with l broadcast over trailing axes.
    Shared by the waveform mix and the merge model's feature-tensor mix
    (one lambda per sample across all input tensors)."""
    x_l = l.reshape((one.shape[0],) + (1,) * (one.ndim - 1))
    return one * x_l + two * (1.0 - x_l)


def mix_labels(
    l: jax.Array,
    labels_one: jax.Array,
    labels_two: jax.Array,
    single_label: bool = True,
) -> jax.Array:
    """Label mix: hard max when ``single_label`` (tfdataset.py:948-951)."""
    y_l = l.reshape((labels_one.shape[0],) + (1,) * (labels_one.ndim - 1))
    if single_label:
        y_l = (y_l > 0.5).astype(labels_one.dtype)
    return labels_one * y_l + labels_two * (1.0 - y_l)


def spec_augment(
    key: jax.Array,
    mel: jax.Array,
    num_time_masks: int = 2,
    time_mask_width: int = 50,
    num_freq_masks: int = 2,
    freq_mask_width: int = 20,
    mask_value: float = 0.0,
):
    """SpecAugment-style time/frequency masking over ``(B, n_mels, T, ...)``.

    The reference has no SpecAugment; this is a TPU-native extra
    (static-shape masks built from broadcasted iota so it jits cleanly).
    """
    b, n_mels, frames = mel.shape[:3]
    keys = jax.random.split(key, 4)

    def make_mask(k, size, width, count):
        starts = jax.random.randint(k, (b, count, 1), 0, max(size - width, 1))
        widths = jax.random.randint(
            jax.random.fold_in(k, 1), (b, count, 1), 0, width + 1
        )
        pos = jnp.arange(size)[None, None, :]
        masked = (pos >= starts) & (pos < starts + widths)
        return jnp.any(masked, axis=1)  # (B, size)

    tmask = make_mask(keys[0], frames, time_mask_width, num_time_masks)
    fmask = make_mask(keys[1], n_mels, freq_mask_width, num_freq_masks)
    full = tmask[:, None, :] | fmask[:, :, None]  # (B, n_mels, T)
    full = full.reshape(full.shape + (1,) * (mel.ndim - 3))
    return jnp.where(full, jnp.asarray(mask_value, mel.dtype), mel)


# ---------------------------------------------------------------------------
# Host-side DSP (offline prep; matches reference CPU paths)
# ---------------------------------------------------------------------------


def butter_bandpass_sos(lowcut: float, highcut: float, fs: float, order: int = 2):
    """Design the band/low/high-pass used for per-track filtering
    (tfdataset.butter_bandpass / predict_utils, scipy host-side)."""
    from scipy.signal import butter

    nyq = 0.5 * fs
    low = lowcut / nyq
    high = highcut / nyq
    if low <= 0 and high <= 0:
        return None
    if high >= 1 or high <= 0:
        if low <= 0:
            return None
        return butter(order, low, btype="highpass", output="sos")
    if low <= 0:
        return butter(order, high, btype="lowpass", output="sos")
    if low >= high:
        # non-increasing critical frequencies would raise in scipy; the
        # reference's write side returns None for this malformed-metadata
        # case (audiodataset.py:1369-1372)
        return None
    return butter(order, [low, high], btype="bandpass", output="sos")


def butter_bandpass_filter(
    data: np.ndarray, lowcut: float, highcut: float, fs: float = 48000, order: int = 2
) -> np.ndarray:
    """Host IIR bandpass (tfdataset.butter_bandpass_filter,
    tfdataset.py:2068-2075)."""
    from scipy.signal import sosfilt

    if lowcut <= 0 and highcut <= 0:
        return data
    sos = butter_bandpass_sos(lowcut, highcut, fs, order)
    if sos is None:
        return data
    return np.float32(sosfilt(sos, data))
