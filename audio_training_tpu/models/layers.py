"""Shared Flax layers: trainable frontends and pooling.

Keras-convention shims so logits can match the TF reference within tolerance:
BatchNorm uses epsilon 1e-3 / momentum 0.99 (Keras defaults), convs default to
glorot-uniform kernels and zero bias, LeakyReLU slope is explicit.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from audio_training_tpu.ops.features import mag_transform
from audio_training_tpu.ops.pcen import ema, normalize_minmax_global

# Keras BatchNormalization defaults
BN_EPS = 1e-3
BN_MOMENTUM = 0.99

glorot = nn.initializers.glorot_uniform()
orthogonal = nn.initializers.orthogonal()


def leaky_relu(x: jax.Array, alpha: float = 0.01) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=alpha)


def _valid_conv(x, w, precision):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _condense_conv(precision, x, w):
    """VALID NHWC/HWIO conv whose BACKWARD computes the data gradient as
    oh-unfolded MXU dots instead of XLA's transposed conv.

    Why: inside the real train graph, XLA's dgrad emitter for badwinner2's
    tall-kernel "big condense" (44x3 over a 48-row input -> 5 output rows)
    picks a catastrophic window config — measured 22.4 ms/step at B=128
    (~20 TFLOP/s) against 6.7 ms for the SAME fwd+dx+dw in isolation
    (probe method in docs/PERFORMANCE.md round 3c).  With only OH output
    rows, dx contracts (oh, co) against an oh-unfolded weight
    ``wu[oh, ih, kw, ci, co] = w[ih-oh, kw, ci, co]`` — KW dots with
    K = OH*CO, plus KW shifted pads along the time axis.  Same math
    reassociated (dw is bitwise identical — it keeps the standard wgrad
    conv; dx differs at bf16 reassociation tolerance, ~4e-3 relative).
    The forward is the plain conv, unchanged — inference graphs and logit
    parity are untouched.
    """
    return _valid_conv(x, w, precision)


def _condense_fwd(precision, x, w):
    return _valid_conv(x, w, precision), (x, w)


def _condense_bwd(precision, res, g):
    x, w = res
    kh, kw_sz, ci, co = w.shape
    b, ih, iw, _ = x.shape
    oh, ow = ih - kh + 1, iw - kw_sz + 1
    # dw: the standard wgrad conv (measured fine in-graph)
    _, vjp_w = jax.vjp(lambda w_: _valid_conv(x, w_, precision), w)
    (dw,) = vjp_w(g)
    # dx: oh-unfolded dots
    wu = jnp.stack(
        [jnp.pad(w, ((o, ih - kh - o), (0, 0), (0, 0), (0, 0)))
         for o in range(oh)]
    )  # (OH, IH, KW, CI, CO)
    dx = jnp.zeros((b, ih, iw, ci), g.dtype)
    for k in range(kw_sz):
        # contract (oh, co): g (B, OH, OW, CO) . wu_k (OH, IH, CI, CO)
        part = jax.lax.dot_general(
            g, wu[:, :, k], (((1, 3), (0, 3)), ((), ())),
            precision=precision,
        )  # (B, OW, IH, CI)
        part = jnp.transpose(part, (0, 2, 1, 3))
        dx = dx + jnp.pad(part, ((0, 0), (0, 0), (k, iw - ow - k), (0, 0)))
    return dx, dw


_condense_conv.defvjp(_condense_fwd, _condense_bwd)


class DotBwdConv(nn.Module):
    """nn.Conv-compatible VALID stride-1 conv using :func:`_condense_conv`.
    Parameter names/shapes match ``nn.Conv`` (kernel HWIO + bias) so the
    surrounding :class:`Conv` wrapper can swap it in (named "Conv_0")
    without changing checkpoints, transplants, or parity tests."""

    features: int
    kernel_size: tuple
    kernel_init: Callable = glorot
    dtype: Any = None
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return _condense_conv(self.precision, x, kernel) + bias


class KerasBatchNorm(nn.Module):
    """BatchNorm with Keras defaults; ``feature_axis=-1`` is the usual
    channels BN, ``feature_axis=1`` reproduces the per-mel-row BN of
    badwinner2 (``BatchNormalization(axis=1)``, badwinner2.py:233)."""

    feature_axis: int = -1
    use_scale: bool = True
    use_bias: bool = True
    # Keras default 1e-3; keras.applications ResNets pass 1.001e-5
    epsilon: float = BN_EPS
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            axis=self.feature_axis,
            momentum=BN_MOMENTUM,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class MagTransform(nn.Module):
    """Trainable magnitude compression ``x**sigmoid(a)`` with ``a`` clipped to
    [-2, 1] (badwinner2.MagTransform, badwinner2.py:32-49; the Keras version
    clips via a MinMaxNorm weight constraint, here we clip in the forward)."""

    init_value: float = -1.0

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "a_power", nn.initializers.constant(self.init_value), (1,), jnp.float32
        )
        a = jnp.clip(a, -2.0, 1.0)
        return mag_transform(x, a.astype(x.dtype))


class PCENLayer(nn.Module):
    """Trainable per-channel energy normalization (tfpcen.PCEN,
    tfpcen.py:43-99), operating on ``(batch, time, filters)`` or, with
    ``time_axis=2``, on mel images ``(batch, mel, time[, channel])``.

    The EMA smoother runs as an O(log T) associative scan instead of the
    reference's sequential ``tf.scan`` (see ops/pcen.py).
    """

    eps: float = 1e-6
    time_axis: int = 1

    @nn.compact
    def __call__(self, x):
        gain = self.param("gain", nn.initializers.constant(0.98), (1,), jnp.float32)
        bias = self.param("bias", nn.initializers.constant(2.0), (1,), jnp.float32)
        root = self.param("root", nn.initializers.constant(2.0), (1,), jnp.float32)
        smooth = self.param(
            "smooth", nn.initializers.constant(0.04), (1,), jnp.float32
        )
        # the reference also defines an unused clipped "a-power" weight
        # (tfpcen.py:78-87); omitted here since call() never reads it.
        gain = jnp.minimum(gain, 1.0).astype(x.dtype)
        root = jnp.maximum(root, 1.0).astype(x.dtype)
        bias = bias.astype(x.dtype)
        init = jnp.take(x, 0, axis=self.time_axis)
        # MXU Toeplitz matmul for short time axes, scan otherwise
        m = ema(x, smooth.astype(x.dtype), init, axis=self.time_axis)
        one_over_root = 1.0 / root
        out = (x / (self.eps + m) ** gain + bias) ** one_over_root - (
            bias**one_over_root
        )
        return normalize_minmax_global(out)


def logmeanexp(
    x: jax.Array, axis: int, sharpness: float = 5.0, keepdims: bool = True
) -> jax.Array:
    """Log-mean-exp pooling (badwinner2.LMELayer, badwinner2.py:343-355;
    wr_resnet_bird.logmeanexp, resnet/wr_resnet_bird.py:83-87)."""
    n = x.shape[axis]
    lse = jax.scipy.special.logsumexp(x * sharpness, axis=axis, keepdims=keepdims)
    return (lse - jnp.log(n)) / sharpness


class LMELayer(nn.Module):
    sharpness: float = 5.0
    axis: int = 1

    def __call__(self, x):
        return logmeanexp(x, axis=self.axis, sharpness=self.sharpness)


class Conv(nn.Module):
    """Keras-style Conv2D: NHWC, valid padding by default, glorot-uniform
    kernel, zero bias.

    Precision note: jax's DEFAULT conv precision on TPU is bf16
    multiplication even for f32 activations.  When no compute dtype is set
    (the fp32 logit-parity configuration) the conv runs at HIGHEST so f32
    means f32; an explicit bf16 dtype opts into fast MXU math.
    """

    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: str = "VALID"
    kernel_init: Callable = glorot
    dtype: Any = None
    # dx_dots: custom dots-based data gradient for tall-kernel condense
    # convs (see _condense_conv) — VALID stride-1 only, forward unchanged
    dx_dots: bool = False

    @nn.compact
    def __call__(self, x):
        precision = (
            jax.lax.Precision.HIGHEST if self.dtype is None else None
        )
        if self.dx_dots:
            if tuple(self.strides) != (1, 1) or self.padding != "VALID":
                raise ValueError("dx_dots requires VALID stride-1 convs")
            # named "Conv_0" so the param tree is identical to the nn.Conv
            # path (checkpoints / transplant / parity oracles unchanged)
            return DotBwdConv(
                features=self.features,
                kernel_size=tuple(self.kernel),
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                precision=precision,
                name="Conv_0",
            )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.strides),
            padding=self.padding,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            precision=precision,
        )(x)


def max_pool(x: jax.Array, window: Sequence[int]) -> jax.Array:
    """Keras MaxPool2D semantics: stride = window, valid padding.

    Keep the reduce-window form: a crop->reshape->max rewrite (exactly
    equivalent for stride == window) measured 10 ms SLOWER end-to-end at
    batch 256 on TPU — the reshape breaks producer fusion with the conv
    chain, while XLA fuses the reduce-window pool into it."""
    w = tuple(window)
    return nn.max_pool(x, window_shape=w, strides=w, padding="VALID")


def avg_pool(x: jax.Array, window: Sequence[int], padding: str = "VALID") -> jax.Array:
    w = tuple(window)
    return nn.avg_pool(x, window_shape=w, strides=w, padding=padding)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """GlobalAveragePooling2D over (H, W) of NHWC."""
    return jnp.mean(x, axis=(1, 2))
