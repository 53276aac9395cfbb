"""Matmul-FFT and fused-Pallas mel paths vs the reference rfft pipeline."""

import numpy as np
import pytest

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.features import build_mel_weights, raw_to_mel
from audio_training_tpu.ops.fftmel import (
    MatmulMelPlan,
    pack_mel_weights,
    plan_bins,
)

CFG = FeaturizerConfig()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return rng.standard_normal((2, CFG.samples_per_clip)).astype(np.float32)


@pytest.fixture(scope="module")
def mel_w():
    return build_mel_weights(CFG)


@pytest.fixture(scope="module")
def reference_mel(batch, mel_w):
    return np.asarray(
        raw_to_mel(batch, mel_w, n_fft=CFG.n_fft, hop=CFG.hop_length,
                   channels=1)
    )[..., 0]


def test_plan_bins_covers_fmax(mel_w):
    # 11 kHz fmax -> highest filter bin ~940 -> 15 radix-64 columns
    assert plan_bins(mel_w) == 15


def test_pack_mel_weights_layout(mel_w):
    packed = pack_mel_weights(mel_w, 15)
    for k in (0, 97, 500, 900):
        k1, k2 = k % 64, k // 64
        np.testing.assert_array_equal(packed[:, k1, k2], mel_w[:, k])


def test_matmul_plan_matches_rfft(batch, mel_w, reference_mel):
    got = np.asarray(MatmulMelPlan(mel_w, CFG.n_fft, CFG.hop_length)(batch))
    assert got.shape == reference_mel.shape
    err = np.abs(got - reference_mel) / (np.abs(reference_mel) + 1e-3)
    assert err.max() < 1e-4


def test_fused_plan_rejects_wide_filterbank():
    from audio_training_tpu.ops.pallas.fused_featurizer import FusedFeaturizer

    wide = build_mel_weights(
        FeaturizerConfig(fmax=20000)  # support beyond bin 1023
    )
    with pytest.raises(ValueError):
        FusedFeaturizer(wide)


def test_matmul_plan_other_nfft_rejected(mel_w):
    with pytest.raises(ValueError):
        MatmulMelPlan(mel_w, n_fft=2048, hop=281)
