"""PCEN parity vs the reference tfpcen.py layer (run on CPU TF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import requires_tf
from audio_training_tpu.ops.pcen import ema_scan, normalize_minmax_global, pcen


def ema_loop(x, w, init):
    """Straight-line oracle for the associative-scan EMA."""
    out = np.zeros_like(x)
    state = init
    for t in range(x.shape[0]):
        state = w * x[t] + (1 - w) * state
        out[t] = state
    return out


def test_ema_scan_matches_loop():
    rng = np.random.default_rng(0)
    x = rng.random((37, 5)).astype(np.float32)
    init = x[0]
    got = np.asarray(ema_scan(x, 0.04, init, axis=0))
    want = ema_loop(x, 0.04, init)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ema_scan_batched_time_middle():
    rng = np.random.default_rng(1)
    x = rng.random((2, 50, 7)).astype(np.float32)  # (batch, time, filters)
    init = x[:, 0]
    got = np.asarray(ema_scan(x, 0.1, init, axis=1))
    for b in range(2):
        want = ema_loop(x[b], 0.1, x[b, 0])
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def reference_pcen_numpy(x, gain=0.98, bias=2.0, root=2.0, smooth=0.04,
                         eps=1e-6):
    """Oracle re-deriving tfpcen.PCEN.call (tfpcen.py:89-99) in numpy."""
    b = x.shape[0]
    m = np.zeros_like(x)
    for i in range(b):
        m[i] = ema_loop(x[i], smooth, x[i, 0])
    gain = min(gain, 1.0)
    root = max(root, 1.0)
    one_over_root = 1.0 / root
    out = (x / (eps + m) ** gain + bias) ** one_over_root - bias**one_over_root
    mx, mn = out.max(), out.min()
    return 2 * ((out - mn) / (mx - mn)) - 1


def test_pcen_matches_numpy_oracle():
    rng = np.random.default_rng(2)
    x = rng.random((3, 60, 16)).astype(np.float32) * 10
    got = np.asarray(pcen(x, time_axis=1))
    want = reference_pcen_numpy(x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@requires_tf
@pytest.mark.slow
def test_pcen_matches_tf_reference_semantics():
    """Re-create the reference layer math with TF ops (tf.scan EMA + the
    PCEN formula from tfpcen.py:89-99) and compare."""
    import tensorflow as tf

    rng = np.random.default_rng(4)
    x = rng.random((2, 40, 8)).astype(np.float32) * 5

    w = tf.constant([0.04])
    initial_state = tf.gather(x, 0, axis=1)
    scanned = tf.scan(
        lambda a, xi: w * xi + (1.0 - w) * a,
        tf.transpose(x, (1, 0, 2)),
        initializer=initial_state,
    )
    m = tf.transpose(scanned, (1, 0, 2))
    gain, bias, root, eps = 0.98, 2.0, 2.0, 1e-6
    out = (x / (eps + m) ** gain + bias) ** (1 / root) - bias ** (1 / root)
    mx = tf.reduce_max(out)
    mn = tf.reduce_min(out)
    want = (2 * ((out - mn) / (mx - mn)) - 1).numpy()

    got = np.asarray(pcen(x, time_axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_normalize_minmax_global_range():
    rng = np.random.default_rng(5)
    x = rng.random((4, 5)).astype(np.float32) * 7 - 3
    out = np.asarray(normalize_minmax_global(x))
    assert out.min() == pytest.approx(-1, abs=1e-6)
    assert out.max() == pytest.approx(1, abs=1e-6)


def test_ema_toeplitz_matches_scan():
    from audio_training_tpu.ops.pcen import ema_scan, ema_toeplitz

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 4, (3, 16, 97)).astype(np.float32))
    init = x[..., 0]
    for w in (0.04, 0.3, 1.0):
        a = np.asarray(ema_scan(x, jnp.float32(w), init, axis=-1))
        b = np.asarray(ema_toeplitz(x, jnp.float32(w), init, axis=-1))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


def test_ema_toeplitz_grad_through_smooth():
    """The Toeplitz operator is built from ``w`` in-graph, so the trainable
    smooth coefficient still gets gradients (tfpcen trains it)."""
    from audio_training_tpu.ops.pcen import ema_scan, ema_toeplitz

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(0, 4, (2, 8, 33)).astype(np.float32))
    init = x[..., 0]

    def loss_t(w):
        return ema_toeplitz(x, w, init, axis=-1).sum()

    def loss_s(w):
        return ema_scan(x, w, init, axis=-1).sum()

    gt = float(jax.grad(loss_t)(jnp.float32(0.04)))
    gs = float(jax.grad(loss_s)(jnp.float32(0.04)))
    assert abs(gt - gs) / max(abs(gs), 1e-6) < 1e-3


def test_pcen_method_dispatch():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 4, (2, 40, 30)).astype(np.float32))
    a = np.asarray(pcen(x, method="scan"))
    b = np.asarray(pcen(x, method="toeplitz"))
    c = np.asarray(pcen(x, method="auto"))
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c, b, rtol=0, atol=0)
