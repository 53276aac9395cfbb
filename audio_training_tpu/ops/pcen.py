"""Trainable per-channel energy normalization (PCEN) — TPU-native.

Numerical-parity target: the reference ``tfpcen.py`` (adapted there from
google-research leaf-audio).  The reference computes the EMA smoother with a
sequential ``tf.scan`` over the time axis (``tfpcen.py:36-39``) — 513
dependent steps, hostile to TPU.  Here the first-order IIR

    m_t = w * x_t + (1 - w) * m_{t-1}

is rewritten as a composition of affine maps ``m_t = a_t * m_{t-1} + b_t``
with ``a_t = 1-w, b_t = w*x_t`` and evaluated with
``jax.lax.associative_scan`` (Blelchock-style, O(log T) depth), which XLA
vectorizes across the batch/mel lanes.  The affine composition rule is
``(a2, b2) ∘ (a1, b1) = (a1*a2, a2*b1 + b2)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ema_scan(x: jax.Array, w: jax.Array, init: jax.Array, axis: int = -1):
    """Exponential moving average along ``axis``.

    Matches ``tfpcen.ExponentialMovingAverage.call`` (tfpcen.py:33-39): the
    recurrence starts from ``init`` (the reference passes frame 0 of the
    input) and the first output element is ``w*x_0 + (1-w)*init``.

    x: any shape; w: scalar (clipped to [0,1]); init: x with ``axis`` removed.
    """
    w = jnp.clip(w, 0.0, 1.0)
    x = jnp.moveaxis(x, axis, 0)
    a = jnp.full_like(x, 1.0 - w)
    b = w * x
    # Fold the initial state into the first element so the scan is uniform.
    b = b.at[0].add((1.0 - w) * init)
    a = a.at[0].set(jnp.zeros_like(a[0]))

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, m = jax.lax.associative_scan(combine, (a, b), axis=0)
    return jnp.moveaxis(m, 0, axis)


def ema_toeplitz(x: jax.Array, w: jax.Array, init: jax.Array,
                 axis: int = -1):
    """Same EMA as :func:`ema_scan`, evaluated as ONE lower-triangular
    Toeplitz matmul on the MXU (the trick the fused featurizer kernel uses,
    ops/pallas/fused_featurizer.py):

        m_t = sum_{j<=t} w*(1-w)^(t-j) * x_j + (1-w)^(t+1) * init

    For T=513 this is a (..., T) @ (T, T) contraction — ~20x faster than
    the associative scan on TPU and exactly differentiable through ``w``
    (the operator is built from it in-graph).  O(T^2) memory/FLOPs caps it
    to short time axes; :func:`ema` auto-dispatches.
    """
    w = jnp.clip(w, 0.0, 1.0).astype(jnp.float32)
    t_len = x.shape[axis]
    d = 1.0 - w
    logd = jnp.log(jnp.maximum(d, 1e-30))
    jj = jax.lax.broadcasted_iota(jnp.int32, (t_len, t_len), 0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (t_len, t_len), 1)
    dt = (tt - jj).astype(jnp.float32)
    op = jnp.where(tt >= jj, w * jnp.exp(dt * logd), 0.0)  # [j, t]
    x32 = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    m = jax.lax.dot_general(
        x32, op, dimension_numbers=(((x32.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    decay = jnp.exp((jnp.arange(t_len, dtype=jnp.float32) + 1.0) * logd)
    m = m + init.astype(jnp.float32)[..., None] * decay
    return jnp.moveaxis(m.astype(x.dtype), -1, axis)


# O(T^2) operator memory stays trivial up to this length; beyond it the
# O(log T) scan wins on memory and the matmul advantage fades.
_TOEPLITZ_MAX_T = 1024


def ema(x: jax.Array, w: jax.Array, init: jax.Array, axis: int = -1,
        method: str = "auto"):
    """EMA dispatcher: ``toeplitz`` (MXU matmul) for short time axes,
    ``scan`` (associative scan) otherwise."""
    if method == "auto":
        method = "toeplitz" if x.shape[axis] <= _TOEPLITZ_MAX_T else "scan"
    if method == "toeplitz":
        return ema_toeplitz(x, w, init, axis=axis)
    return ema_scan(x, w, init, axis=axis)


def pcen(
    x: jax.Array,
    gain: jax.Array | float = 0.98,
    bias: jax.Array | float = 2.0,
    root: jax.Array | float = 2.0,
    smooth: jax.Array | float = 0.04,
    eps: float = 1e-6,
    time_axis: int = -2,
    normalize: bool = True,
    method: str = "auto",
):
    """PCEN with trainable scalars, parity with ``tfpcen.PCEN.call``
    (tfpcen.py:89-99).

    The reference layer operates on ``[batch, time, filters]`` with the EMA
    over the time axis initialized from the first time frame, then applies

        out = (x / (eps + M)**gain + bias)**(1/root) - bias**(1/root)

    followed by a *global* min-max normalization to [-1, 1].

    ``x`` here is ``(..., time, filters)`` by default; set ``time_axis`` for
    other layouts.
    """
    gain = jnp.minimum(jnp.asarray(gain, x.dtype), 1.0)
    root = jnp.maximum(jnp.asarray(root, x.dtype), 1.0)
    init = jnp.take(x, 0, axis=time_axis)
    m = ema(x, jnp.asarray(smooth, x.dtype), init, axis=time_axis,
            method=method)
    one_over_root = 1.0 / root
    out = (x / (eps + m) ** gain + bias) ** one_over_root - bias**one_over_root
    if normalize:
        out = normalize_minmax_global(out)
    return out


def normalize_minmax_global(data: jax.Array) -> jax.Array:
    """Global min-max to [-1, 1] (tfpcen.py:105-110)."""
    max_v = jnp.max(data)
    min_v = jnp.min(data)
    return 2.0 * ((data - min_v) / (max_v - min_v)) - 1.0
