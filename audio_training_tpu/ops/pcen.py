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


def pcen(
    x: jax.Array,
    gain: jax.Array | float = 0.98,
    bias: jax.Array | float = 2.0,
    root: jax.Array | float = 2.0,
    smooth: jax.Array | float = 0.04,
    eps: float = 1e-6,
    time_axis: int = -2,
    normalize: bool = True,
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
    m = ema_scan(x, jnp.asarray(smooth, x.dtype), init, axis=time_axis)
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
