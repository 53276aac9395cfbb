"""Parity tests for the fused waveform->mel->PCEN Pallas kernel.

Runs in interpreter mode on the CPU mesh (tests/conftest.py); compiled-mode
parity on the real chip is asserted by the TPU bench/verify flow and
documented in docs/PERFORMANCE.md.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from audio_training_tpu.config import FeaturizerConfig
from audio_training_tpu.ops.features import build_mel_weights
from audio_training_tpu.ops.fftmel import MatmulMelPlan
from audio_training_tpu.ops.pcen import pcen as pcen_ref
from audio_training_tpu.ops.pallas.fused_featurizer import (
    HB,
    K2C,
    R1,
    R2,
    FusedFeaturizer,
    _dft_constants,
    pack_mel_flat,
)


@pytest.fixture(scope="module")
def cfg():
    return FeaturizerConfig()


@pytest.fixture(scope="module")
def mel_w(cfg):
    return build_mel_weights(cfg)


@pytest.fixture(scope="module")
def raw(cfg):
    rng = np.random.default_rng(7)
    return jnp.asarray(
        rng.standard_normal((2, cfg.samples_per_clip)).astype(np.float32)
    )


def test_mel_matches_matmul_fft(cfg, mel_w, raw):
    ref = np.asarray(
        MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length, precision="highest")(
            raw
        )
    )
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    out = np.asarray(fz(raw, pcen=False, interpret=True))
    assert out.shape == (2, cfg.n_mels, cfg.mel_frames)
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


@pytest.mark.parametrize("tier", ["bf16_3x", "bf16_3x_manual"])
def test_precision_ladder_tiers_match(cfg, mel_w, raw, tier):
    """The middle dot-precision rungs (three-pass bf16 hi/lo decomposition,
    ~16 reconstructed mantissa bits) stay in the 1e-5 parity class of
    "highest" — plumbing check in interpret mode; the on-TPU ladder
    (speed + compiled parity per tier) is measured in docs/PERFORMANCE.md
    round 5 (anchor: /root/reference/custommel.py:18-61)."""
    ref = np.asarray(
        MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length, precision="highest")(
            raw
        )
    )
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length, precision=tier)
    out = np.asarray(fz(raw, pcen=False, interpret=True))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


def test_pcen_matches_scan_reference(cfg, mel_w, raw):
    mel = MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length,
                        precision="highest")(raw)
    ref = np.asarray(pcen_ref(mel, time_axis=2))
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    out = np.asarray(fz(raw, pcen=True, interpret=True))
    assert np.abs(out - ref).max() < 1e-4  # output range is [-1, 1]


def test_pcen_custom_params(cfg, mel_w, raw):
    kw = dict(gain=0.9, bias=1.5, root=3.0, smooth=0.1)
    mel = MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length,
                        precision="highest")(raw)
    ref = np.asarray(pcen_ref(mel, time_axis=2, **kw))
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest", **kw)
    out = np.asarray(fz(raw, pcen=True, interpret=True))
    assert np.abs(out - ref).max() < 1e-4


def test_conj_operators_match_npfft(mel_w):
    """The conjugate-folded two-stage operators reproduce np.fft bin
    powers and the packed mel product, in pure numpy (anchors the fold's
    math independent of the fftmel oracle)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal(R1 * R2)
    consts = _dft_constants(281)
    planes = consts["d1ri"].astype(np.float64) @ x.reshape(R1, R2)
    e_re = consts["e_re"].astype(np.float64)
    e_im = consts["e_im"].astype(np.float64)
    xri = np.stack([
        e_re[b] @ planes[b] + e_im[b] @ planes[HB + b] for b in range(HB)
    ])
    # rows = [re X(b); re X(pair); im X(b); im X(pair)]: power is one
    # half-add of the squared rows (the kernel's concat-free layout)
    sq = xri**2
    power = (sq[:, : 2 * K2C] + sq[:, 2 * K2C :]).reshape(HB * 2 * K2C)
    truth = np.abs(np.fft.fft(x)[: R1 * K2C]) ** 2
    # bin k = k1 + 32*k2 at flat b*64 + half*32 + k2 (pack_mel_flat order)
    got = np.zeros_like(truth)
    for b in range(HB):
        for half in range(2):
            k1 = b if half == 0 else (HB if b == 0 else R1 - b)
            for k2 in range(K2C):
                got[k1 + R1 * k2] = power[b * 2 * K2C + half * K2C + k2]
    np.testing.assert_allclose(got, truth, rtol=2e-4, atol=1e-7)
    # the production filterbank's support ends below bin 1024 (checked at
    # FusedFeaturizer init), so truncating the bin axis loses nothing
    np.testing.assert_allclose(
        pack_mel_flat(mel_w).astype(np.float64) @ power,
        mel_w[:, : truth.size] @ truth,
        rtol=1e-5,
    )


def test_pack_mel_flat_layout(mel_w):
    flat = pack_mel_flat(mel_w)
    assert flat.shape == (mel_w.shape[0], 1024)
    # conjugate-folded order: bin k = k1 + 32*k2 lives at
    # b*64 + half*32 + k2 with k1 = b (half 0) or 32-b / 16-at-b=0 (half 1)
    for k in [0, 1, 16, 33, 512, 940]:
        k1, k2 = k % 32, k // 32
        if k1 <= 15:
            b, half = k1, 0
        elif k1 == 16:
            b, half = 0, 1
        else:
            b, half = 32 - k1, 1
        np.testing.assert_array_equal(
            flat[:, b * 64 + half * 32 + k2], mel_w[:, k]
        )
    # every filterbank column appears exactly once (permutation, no loss)
    np.testing.assert_allclose(
        flat.sum(axis=1), mel_w[:, :1024].sum(axis=1), rtol=1e-6
    )


def test_short_clip_single_tile(cfg, mel_w):
    rng = np.random.default_rng(3)
    short = jnp.asarray(
        rng.standard_normal((1, 20000)).astype(np.float32)
    )
    ref = np.asarray(
        MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length, precision="highest")(
            short
        )
    )
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    out = np.asarray(fz(short, pcen=False, interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


def test_centered_matches_matmul_fft(cfg, mel_w, raw):
    """librosa-convention centered framing (Predictor inference path)."""
    ref = np.asarray(
        MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length, center=True,
                      precision="highest")(raw)
    )
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest", center=True)
    out = np.asarray(fz(raw, pcen=False, interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


def test_single_tile_arbitrary_hop(mel_w):
    """Single-tile clips don't need the hop*128 lane alignment the
    multi-tile path requires — any hop works for <=768-frame inputs."""
    rng = np.random.default_rng(11)
    raw = jnp.asarray(rng.standard_normal((1, 30000)).astype(np.float32))
    for hop in (160, 313):
        ref = np.asarray(
            MatmulMelPlan(mel_w, 4096, hop, precision="highest")(raw)
        )
        fz = FusedFeaturizer(mel_w, 4096, hop, precision="highest")
        out = np.asarray(fz(raw, pcen=False, interpret=True))
        assert out.shape == ref.shape
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 1e-5, (hop, rel)


@pytest.mark.slow
def test_long_clip_multi_tile(cfg, mel_w):
    """Clips over MAX_SINGLE_TILE frames fall back to 128-frame tiles;
    exercises the tile loop and the PCEN EMA carry flowing across tiles
    (decay-weighted last-column extraction, tfpcen.py:33-39 semantics)."""
    rng = np.random.default_rng(5)
    hop = 40  # many frames from little audio: 35k samples -> 875 frames
    long_clip = jnp.asarray(
        rng.standard_normal((1, 35_000)).astype(np.float32)
    )
    ref_mel = np.asarray(
        MatmulMelPlan(mel_w, cfg.n_fft, hop, precision="highest")(long_clip)
    )
    fz = FusedFeaturizer(mel_w, cfg.n_fft, hop, precision="highest")
    tile, n_tiles = fz._tiling(ref_mel.shape[-1])
    assert n_tiles > 1  # the path under test
    out = np.asarray(fz(long_clip, pcen=False, interpret=True))
    assert out.shape == ref_mel.shape
    rel = np.abs(out - ref_mel).max() / np.abs(ref_mel).max()
    assert rel < 1e-5

    ref_pcen = np.asarray(
        pcen_ref(jnp.asarray(ref_mel), time_axis=2)
    )
    got_pcen = np.asarray(fz(long_clip, pcen=True, interpret=True))
    assert np.abs(got_pcen - ref_pcen).max() < 1e-4


def test_batch_one_and_odd_batch(cfg, mel_w):
    """B=1 and odd batch sizes hit the same grid path."""
    rng = np.random.default_rng(21)
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    for b in (1, 3):
        raw = jnp.asarray(
            rng.standard_normal((b, cfg.samples_per_clip)).astype(np.float32)
        )
        out = np.asarray(fz(raw, pcen=False, interpret=True))
        assert out.shape == (b, cfg.n_mels, cfg.mel_frames)
        assert np.isfinite(out).all()


def test_normalize_and_frontend_fold(cfg, mel_w, raw):
    """The in-kernel waveform normalize + badwinner2 frontend
    (MagTransform + per-mel-row BN) matches the unfused composition:
    normalize_rows -> mel -> x**sigmoid(a) -> BN affine."""
    import jax

    from audio_training_tpu.ops.features import normalize_rows

    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    rng = np.random.default_rng(11)
    a_power = jnp.asarray([-0.7], jnp.float32)
    bn_mean = jnp.asarray(rng.normal(0.5, 0.2, cfg.n_mels), jnp.float32)
    bn_var = jnp.asarray(rng.uniform(0.5, 2.0, cfg.n_mels), jnp.float32)

    got = fz(raw, pcen=False, normalize_waveform=True,
             frontend_params=(a_power, bn_mean, bn_var))

    plan = MatmulMelPlan(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    mel = plan(normalize_rows(raw))
    g = jax.nn.sigmoid(jnp.clip(a_power, -2.0, 1.0))
    expected = jnp.power(mel, g)
    s = 1.0 / jnp.sqrt(bn_var + 1e-3)
    expected = (expected - bn_mean[None, :, None]) * s[None, :, None]

    got = np.asarray(got)
    expected = np.asarray(expected)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_frontend_pcen_mutually_exclusive(cfg, mel_w, raw):
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length)
    with pytest.raises(ValueError, match="frontend"):
        fz(raw, pcen=True,
           frontend_params=(jnp.zeros(1), jnp.zeros(cfg.n_mels),
                            jnp.ones(cfg.n_mels)))


def test_row_view_input_matches_2d(cfg, mel_w, raw):
    """The pre-reshaped (B, L//128, 128) row-major clip view — the serving
    fast path that avoids the in-scan reshape copy — is bit-identical to
    the (B, samples) input."""
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    raw3 = jnp.reshape(raw, (raw.shape[0], -1, 128))
    np.testing.assert_array_equal(
        np.asarray(fz(raw, pcen=True)), np.asarray(fz(raw3, pcen=True))
    )
    np.testing.assert_array_equal(
        np.asarray(fz(raw, pcen=False)), np.asarray(fz(raw3, pcen=False))
    )
    # the normalize_waveform fold sees the same sample count either way
    np.testing.assert_array_equal(
        np.asarray(fz(raw, pcen=False, normalize_waveform=True)),
        np.asarray(fz(raw3, pcen=False, normalize_waveform=True)),
    )
    with pytest.raises(ValueError, match="row view"):
        fz(jnp.zeros((2, 100, 64)), pcen=False)
    fzc = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                          precision="highest", center=True)
    with pytest.raises(ValueError, match="row view|center"):
        fzc(raw3, pcen=False)


def test_out_dtype_bf16_matches_cast(cfg, mel_w, raw):
    """out_dtype=bfloat16 (the serving fast path that halves the image
    write + the CNN's read) converts only at the output store: bitwise
    identical to casting the f32 output."""
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    for pcen in (False, True):
        f32 = fz(raw, pcen=pcen, normalize=False)
        b16 = fz(raw, pcen=pcen, normalize=False, out_dtype=jnp.bfloat16)
        assert b16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32.astype(jnp.bfloat16).astype(jnp.float32)),
            np.asarray(b16.astype(jnp.float32)),
        )
    # normalized PCEN: min-max runs on the bf16 output — same numeric
    # class as the bf16 CNN consuming it, result still in [-1, 1]
    out = fz(raw, pcen=True, out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    arr = np.asarray(out.astype(jnp.float32))
    assert arr.min() >= -1.0 - 1e-2 and arr.max() <= 1.0 + 1e-2


def test_step_salt_does_not_change_output(cfg, mel_w, raw):
    """step_salt occupies the unused params[7] SMEM slot: it must defeat
    XLA CSE/caching in chained benchmarks WITHOUT perturbing the math."""
    fz = FusedFeaturizer(mel_w, cfg.n_fft, cfg.hop_length,
                         precision="highest")
    base = np.asarray(fz(raw, pcen=True))
    salted = np.asarray(fz(raw, pcen=True, step_salt=jnp.float32(3.25)))
    np.testing.assert_array_equal(base, salted)
