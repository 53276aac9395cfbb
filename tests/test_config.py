"""FeaturizerConfig validation: fail fast on geometries the reference lets
through silently (empty mel filters above Nyquist, inverted bands, frames
that skip samples)."""

import pytest

from audio_training_tpu.config import (
    FeaturizerConfig,
    config_from_dict,
    config_to_dict,
)


def test_valid_production_config():
    cfg = FeaturizerConfig()
    assert cfg.mel_frames == 513
    assert cfg.samples_per_clip == 144000


def test_fmax_above_nyquist_raises():
    with pytest.raises(ValueError, match="Nyquist"):
        FeaturizerConfig(sr=8000)  # default fmax=11000 > 4000


def test_fmin_not_below_fmax_raises():
    with pytest.raises(ValueError, match="fmin"):
        FeaturizerConfig(fmin=5000, fmax=4000)
    with pytest.raises(ValueError, match="fmin"):
        FeaturizerConfig(fmin=4000, fmax=4000)


def test_hop_not_below_nfft_raises():
    with pytest.raises(ValueError, match="hop_length"):
        FeaturizerConfig(n_fft=256, hop_length=256)


def test_nonpositive_raises():
    with pytest.raises(ValueError):
        FeaturizerConfig(sr=0)
    with pytest.raises(ValueError):
        FeaturizerConfig(n_mels=0)


def test_roundtrip_still_works():
    cfg = FeaturizerConfig(sr=8000, n_fft=512, hop_length=100, n_mels=96,
                           fmax=3500.0)
    again = config_from_dict(FeaturizerConfig, config_to_dict(cfg))
    assert again == cfg
