"""Track-detection tests (vs identifytracks.py semantics) on synthetic
audio with known chirp placement."""

import numpy as np
import pytest

from audio_training_tpu.detect import (
    Signal,
    get_end,
    get_tracks_from_signals,
    merge_signals,
    signal_noise,
)
from audio_training_tpu.detect.signals import get_nfft, mel_freq, segment_overlap

SR = 48000


def chirp(duration, freq, sr=SR, amp=1.0):
    t = np.arange(int(duration * sr)) / sr
    return amp * np.sin(2 * np.pi * freq * t).astype(np.float32)


def make_recording(events, total=10.0, noise=0.005, sr=SR, seed=0):
    """events: list of (start_s, duration_s, freq_hz)."""
    rng = np.random.default_rng(seed)
    x = (noise * rng.standard_normal(int(total * sr))).astype(np.float32)
    for start, dur, f in events:
        c = chirp(dur, f, sr)
        i = int(start * sr)
        x[i : i + len(c)] += c
    return x


def test_get_nfft():
    assert get_nfft(48000) == 4096  # 2^round(log2(4800)) = 2^12
    assert get_nfft(8000) == 1024


def test_segment_overlap():
    assert segment_overlap((0, 2), (1, 3)) == 1
    assert segment_overlap((0, 1), (2, 3)) == -1  # gap -> negative


def test_mel_freq_htk():
    assert mel_freq(0) == 0
    assert mel_freq(700) == pytest.approx(2595 * np.log10(2))


def test_signal_noise_finds_chirp():
    x = make_recording([(2.0, 1.0, 2000)])
    signals, spec = signal_noise(x, SR)
    assert spec.shape[0] == 1025  # n_fft 2048
    assert len(signals) >= 1
    s = max(signals, key=lambda s: s.mass)
    assert 1.4 <= s.start <= 2.4
    assert 2.6 <= s.end <= 3.6
    assert s.freq_start < 2000 < s.freq_end


def test_signal_noise_silence():
    x = np.zeros(SR * 5, np.float32)
    signals, _ = signal_noise(x, SR)
    assert signals == []


def test_get_end_detects_silent_tail():
    x = make_recording([(1.0, 1.0, 3000)], total=10.0, noise=0.01)
    x[SR * 6 :] = 0.0  # constant-pad tail
    end = get_end(x, SR)
    assert 5.0 <= end <= 7.0


def test_get_end_full_recording():
    x = make_recording([(1.0, 1.0, 3000)], total=5.0, noise=0.01)
    assert get_end(x, SR) == pytest.approx(5.0)


def test_merge_signals_merges_overlapping():
    a = Signal(0.0, 1.0, 1000, 2000, 10)
    b = Signal(0.5, 1.5, 1100, 2100, 5)
    merged, did = merge_signals([a, b])
    assert did and len(merged) == 1
    s = merged[0]
    assert s.start == 0.0 and s.end == 1.5
    assert s.mass == 15


def test_merge_signals_keeps_distant():
    a = Signal(0.0, 1.0, 1000, 2000, 10)
    b = Signal(8.0, 9.0, 1000, 2000, 5)
    merged, did = merge_signals([a, b])
    assert not did and len(merged) == 2


def test_get_tracks_drops_short_and_narrow():
    short = Signal(0.0, 0.2, 1000, 2000, 1)  # < 0.35 s
    narrow = Signal(5.0, 6.0, 5000, 5050, 1)  # < 50 mel range
    good = Signal(2.0, 3.0, 1000, 2500, 10)
    tracks = get_tracks_from_signals([short, narrow, good], end=10.0)
    assert len(tracks) == 1
    t = tracks[0]
    # enlarged 1.4x around the original box (identifytracks.py:257)
    assert t.start < 2.0 and t.end > 3.0


def test_get_tracks_splits_long():
    long_sig = Signal(0.0, 14.0, 1000, 3000, 10)
    tracks = get_tracks_from_signals([long_sig], end=20.0)
    assert len(tracks) == 3  # ceil(14/6) pieces after enlargement clamps
    assert all(t.length <= 6.01 for t in tracks)
    # pieces tile the enlarged interval
    assert tracks[0].start == pytest.approx(0.0, abs=0.01)


def test_end_to_end_two_tracks():
    x = make_recording([(1.0, 1.2, 2000), (6.0, 1.0, 5000)], total=10.0)
    end = get_end(x, SR)
    signals, _ = signal_noise(x, SR)
    tracks = get_tracks_from_signals(signals, end)
    assert len(tracks) >= 2
    starts = sorted(t.start for t in tracks)
    assert starts[0] < 2.0 and any(5.0 < s < 7.0 for s in starts)


def test_signal_meta():
    s = Signal(1.0, 2.0, 500, 1500, 3)
    meta = s.get_meta()
    assert meta["start"] == 1.0
    assert meta["positions"][0]["y"] == pytest.approx(500 / 24000)


# ---------------------------------------------------------------------------
# Cross-oracle parity vs the actual reference identifytracks.py
# ---------------------------------------------------------------------------


def _librosa_stub():
    """Minimal librosa shim (librosa is not bundled) implementing exactly
    the two functions the reference detection path calls, with librosa's
    conventions (centered constant-pad hann stft; linear rfft freqs) —
    written independently of the package's own host-stft helper."""
    import types

    m = types.ModuleType("librosa")

    def stft(y, n_fft=2048, hop_length=512, **kw):
        half = n_fft // 2
        x = np.pad(np.asarray(y, np.float32), (half, half))
        n_frames = 1 + (len(x) - n_fft) // hop_length
        starts = np.arange(n_frames) * hop_length
        idx = starts[:, None] + np.arange(n_fft)[None, :]
        k = np.arange(n_fft)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * k / n_fft)
        return np.fft.rfft(x[idx] * win, axis=1).T

    def fft_frequencies(sr=22050, n_fft=2048):
        return np.linspace(0, sr / 2, 1 + n_fft // 2, endpoint=True)

    m.stft = stft
    m.fft_frequencies = fft_frequencies
    return m


@pytest.fixture(scope="module")
def reference_identifytracks():
    """Import /root/reference/identifytracks.py with the librosa shim."""
    import importlib
    import pathlib
    import sys

    ref = pathlib.Path("/root/reference")
    if not ref.exists():
        pytest.skip("reference tree not present")
    pytest.importorskip("cv2")
    import matplotlib

    matplotlib.use("Agg")
    had_librosa = "librosa" in sys.modules
    if not had_librosa:
        sys.modules["librosa"] = _librosa_stub()
    sys.path.insert(0, str(ref))
    try:
        for name in ("custommel", "plot_utils", "identifytracks"):
            sys.modules.pop(name, None)
        module = importlib.import_module("identifytracks")
        yield module
    finally:
        sys.path.pop(0)
        for name in ("custommel", "plot_utils", "identifytracks"):
            sys.modules.pop(name, None)
        if not had_librosa:
            sys.modules.pop("librosa", None)


@pytest.mark.slow
@pytest.mark.parametrize("seed,events", [
    (0, [(1.0, 1.2, 2000), (6.0, 1.0, 5000)]),
    (1, [(0.5, 0.6, 1500), (1.3, 0.8, 1800), (4.0, 2.5, 6000),
         (7.5, 0.4, 900)]),
    (2, [(2.0, 7.5, 3000)]),          # long track: split >6 s path
    (3, [(1.0, 0.2, 4000)]),          # short blip: min-length drop path
])
def test_detection_cross_oracle(reference_identifytracks, seed, events):
    """detect/signals vs the REFERENCE identifytracks on identical
    synthetic recordings: identical Signal boxes (signal_noise,
    identifytracks.py:51-143) and identical track spans after the
    order-sensitive merge loops (get_tracks_from_signals,
    identifytracks.py:162-301)."""
    ref = reference_identifytracks
    x = make_recording(events, total=10.0, seed=seed)

    ref_end = ref.get_end(x, SR)
    our_end = get_end(x, SR)
    assert our_end == pytest.approx(ref_end, abs=1e-9)

    ref_signals, _ = ref.signal_noise(x, SR)
    our_signals, _ = signal_noise(x, SR)
    assert len(our_signals) == len(ref_signals)
    for ours, theirs in zip(our_signals, ref_signals):
        assert ours.start == pytest.approx(theirs.start, abs=1e-9)
        assert ours.end == pytest.approx(theirs.end, abs=1e-9)
        assert ours.freq_start == pytest.approx(theirs.freq_start, rel=1e-6)
        assert ours.freq_end == pytest.approx(theirs.freq_end, rel=1e-6)
        assert ours.mass == theirs.mass

    ref_tracks = ref.get_tracks_from_signals(
        [ref.Signal(s.start, s.end, s.freq_start, s.freq_end, s.mass)
         for s in ref_signals],
        ref_end,
    )
    our_tracks = get_tracks_from_signals(
        [Signal(s.start, s.end, s.freq_start, s.freq_end, s.mass)
         for s in our_signals],
        our_end,
    )
    assert len(our_tracks) == len(ref_tracks)
    for ours, theirs in zip(our_tracks, ref_tracks):
        assert ours.start == pytest.approx(theirs.start, abs=1e-9)
        assert ours.end == pytest.approx(theirs.end, abs=1e-9)
        assert ours.freq_start == pytest.approx(theirs.freq_start, rel=1e-6)
        assert ours.freq_end == pytest.approx(theirs.freq_end, rel=1e-6)
