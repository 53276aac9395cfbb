"""Generic CNN backbones in Flax (capability parity with the Keras
``tf.keras.applications`` zoo the reference dispatches to in
``audiomodel.get_base_model``, audiomodel.py:972-1141).

These run headless (``include_top=False`` equivalent): input NHWC mel image,
output a (B, H', W', C') feature map; the adapter in
:mod:`audio_training_tpu.models.registry` wraps them with the PCEN/MagTransform
frontend + GAP + dropout + Dense head (audiomodel.py:784-820).

ImageNet-pretrained weights are not bundled (zero-egress build); weights can
be restored from a local orbax checkpoint instead.  Architectures implemented
natively: ResNet50/101/152 (+v2 pre-activation), VGG16/19, MobileNetV2,
DenseNet121, EfficientNet-B0/B1/B5, EfficientNetV2-B0/B3/S/M, InceptionV3,
InceptionResNetV2.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from audio_training_tpu.models.layers import Conv, KerasBatchNorm, max_pool


# ---------------------------------------------------------------------------
# ResNet v1 / v2
# ---------------------------------------------------------------------------


RESNET_BN_EPS = 1.001e-5  # keras.applications.resnet BN epsilon


class BottleneckV1(nn.Module):
    """keras.applications residual_block_v1: 1x1/3x3/1x1 bottleneck with a
    conv shortcut, stride on the first 1x1, BN eps 1.001e-5.

    Module creation follows the keras functional graph's TOPOLOGICAL layer
    order (1_conv, 1_bn, 2_conv, 2_bn, 0_conv, 3_conv, 0_bn, 3_bn — the
    shortcut interleaves mid-block) so the positional weight transplant
    (models/transplant.py) pairs layer-for-layer with
    ``tf.keras.applications.ResNet50(...).layers``."""

    filters: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        y = Conv(f, (1, 1), strides=(self.stride, self.stride), padding="SAME",
                 dtype=self.dtype)(x)
        y = KerasBatchNorm(epsilon=RESNET_BN_EPS, dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(f, (3, 3), padding="SAME", dtype=self.dtype)(y)
        y = KerasBatchNorm(epsilon=RESNET_BN_EPS, dtype=self.dtype)(y, train)
        y = nn.relu(y)
        shortcut = x
        if self.project:
            shortcut = Conv(4 * f, (1, 1),
                            strides=(self.stride, self.stride),
                            padding="SAME", dtype=self.dtype)(shortcut)
        y = Conv(4 * f, (1, 1), padding="SAME", dtype=self.dtype)(y)
        if self.project:
            shortcut = KerasBatchNorm(epsilon=RESNET_BN_EPS,
                                      dtype=self.dtype)(shortcut, train)
        y = KerasBatchNorm(epsilon=RESNET_BN_EPS, dtype=self.dtype)(y, train)
        return nn.relu(y + shortcut)


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck (ResNet50V2)."""

    filters: int
    stride: int = 1
    project: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        pre = KerasBatchNorm(dtype=self.dtype)(x, train)
        pre = nn.relu(pre)
        shortcut = x
        if self.project:
            shortcut = Conv(4 * f, (1, 1),
                            strides=(self.stride, self.stride),
                            padding="SAME", dtype=self.dtype)(pre)
        y = Conv(f, (1, 1), padding="SAME", dtype=self.dtype)(pre)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(f, (3, 3), strides=(self.stride, self.stride), padding="SAME",
                 dtype=self.dtype)(y)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = Conv(4 * f, (1, 1), padding="SAME", dtype=self.dtype)(y)
        return y + shortcut


class ResNet(nn.Module):
    """Headless ResNet; stage_sizes (3,4,6,3)=50, (3,4,23,3)=101,
    (3,8,36,3)=152.  ``v2=True`` uses pre-activation blocks."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    v2: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # keras stem: ZeroPadding((3,3)) + VALID 7x7/2 (NOT SAME — the
        # symmetric pad differs from XLA's (2,3) SAME pad on even inputs),
        # then ZeroPadding((1,1)) + VALID 3x3/2 max pool
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                 dtype=self.dtype)(x)
        if not self.v2:
            x = KerasBatchNorm(epsilon=RESNET_BN_EPS, dtype=self.dtype)(
                x, train)
            x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        block = BottleneckV2 if self.v2 else BottleneckV1
        for stage, n_blocks in enumerate(self.stage_sizes):
            f = 64 * (2**stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = block(f, stride=stride, project=(b == 0),
                          dtype=self.dtype)(x, train)
        if self.v2:
            x = KerasBatchNorm(epsilon=RESNET_BN_EPS, dtype=self.dtype)(
                x, train)
            x = nn.relu(x)
        return x


# ---------------------------------------------------------------------------
# VGG
# ---------------------------------------------------------------------------


class VGG(nn.Module):
    """Headless VGG16/19 conv trunk."""

    blocks: Sequence[int] = (2, 2, 3, 3, 3)  # VGG16; (2,2,4,4,4) = VGG19
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        if self.dtype is not None:
            x = x.astype(self.dtype)
        widths = [64, 128, 256, 512, 512]
        for w, n in zip(widths, self.blocks):
            for _ in range(n):
                x = Conv(w, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = nn.relu(x)
            x = max_pool(x, (2, 2))
        return x


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    filters: int
    stride: int = 1
    expand: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = Conv(in_ch * self.expand, (1, 1), padding="SAME",
                     dtype=self.dtype)(y)
            y = KerasBatchNorm(dtype=self.dtype)(y, train)
            y = nn.relu6(y)
        y = nn.Conv(y.shape[-1], (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", feature_group_count=y.shape[-1],
                    dtype=self.dtype)(y)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu6(y)
        y = Conv(self.filters, (1, 1), padding="SAME", dtype=self.dtype)(y)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        if self.stride == 1 and in_ch == self.filters:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = Conv(32, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu6(x)
        # (expand, filters, repeats, stride)
        spec = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        for t, c, n, s in spec:
            for i in range(n):
                x = InvertedResidual(c, stride=s if i == 0 else 1, expand=t,
                                     dtype=self.dtype)(x, train)
        x = Conv(1280, (1, 1), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        return nn.relu6(x)


# ---------------------------------------------------------------------------
# DenseNet121
# ---------------------------------------------------------------------------


class DenseNet(nn.Module):
    """keras.applications DenseNet semantics: explicit (3,3)/(1,1) stem pads
    with VALID conv/pool (the symmetric pads differ from XLA SAME on even
    inputs) and BN eps 1.001e-5 throughout."""

    blocks: Sequence[int] = (6, 12, 24, 16)  # 121
    growth: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        eps = RESNET_BN_EPS  # densenet uses the same 1.001e-5
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                 dtype=self.dtype)(x)
        x = KerasBatchNorm(epsilon=eps, dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        for bi, n in enumerate(self.blocks):
            for _ in range(n):
                y = KerasBatchNorm(epsilon=eps, dtype=self.dtype)(x, train)
                y = nn.relu(y)
                y = Conv(4 * self.growth, (1, 1), padding="SAME",
                         dtype=self.dtype)(y)
                y = KerasBatchNorm(epsilon=eps, dtype=self.dtype)(y, train)
                y = nn.relu(y)
                y = Conv(self.growth, (3, 3), padding="SAME", dtype=self.dtype)(y)
                x = jnp.concatenate([x, y], axis=-1)
            if bi != len(self.blocks) - 1:
                x = KerasBatchNorm(epsilon=eps, dtype=self.dtype)(x, train)
                x = nn.relu(x)
                x = Conv(x.shape[-1] // 2, (1, 1), padding="SAME",
                         dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = KerasBatchNorm(epsilon=eps, dtype=self.dtype)(x, train)
        return nn.relu(x)


# ---------------------------------------------------------------------------
# EfficientNet B / V2
# ---------------------------------------------------------------------------


class SqueezeExcite(nn.Module):
    reduce_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.reduce_ch, (1, 1), padding="SAME", dtype=self.dtype)(s)
        s = nn.silu(s)
        s = Conv(x.shape[-1], (1, 1), padding="SAME", dtype=self.dtype)(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    filters: int
    kernel: int = 3
    stride: int = 1
    expand: int = 6
    se_ratio: float = 0.25
    fused: bool = False  # EfficientNetV2 fused-MBConv
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        mid = in_ch * self.expand
        if self.fused and self.expand == 1:
            # keras FusedMBConvBlock, expand==1: ONE kxk strided conv
            # straight to the output filters + BN + activation (no separate
            # project conv)
            y = Conv(self.filters, (self.kernel, self.kernel),
                     strides=(self.stride, self.stride), padding="SAME",
                     dtype=self.dtype)(y)
            y = KerasBatchNorm(dtype=self.dtype)(y, train)
            y = nn.silu(y)
            if self.stride == 1 and in_ch == self.filters:
                y = y + x
            return y
        if self.fused:
            y = Conv(mid, (self.kernel, self.kernel),
                     strides=(self.stride, self.stride), padding="SAME",
                     dtype=self.dtype)(y)
            y = KerasBatchNorm(dtype=self.dtype)(y, train)
            y = nn.silu(y)
        else:
            if self.expand != 1:
                y = Conv(mid, (1, 1), padding="SAME", dtype=self.dtype)(y)
                y = KerasBatchNorm(dtype=self.dtype)(y, train)
                y = nn.silu(y)
            y = nn.Conv(mid, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        feature_group_count=mid, dtype=self.dtype)(y)
            y = KerasBatchNorm(dtype=self.dtype)(y, train)
            y = nn.silu(y)
        if self.se_ratio and not self.fused:
            y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                              dtype=self.dtype)(y)
        y = Conv(self.filters, (1, 1), padding="SAME", dtype=self.dtype)(y)
        y = KerasBatchNorm(dtype=self.dtype)(y, train)
        if self.stride == 1 and in_ch == self.filters:
            y = y + x
        return y


def _round_filters(f: int, width: float) -> int:
    f = f * width
    new_f = max(8, int(f + 4) // 8 * 8)
    if new_f < 0.9 * f:
        new_f += 8
    return int(new_f)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(r * depth))


class EfficientNet(nn.Module):
    """EfficientNet-B* via compound scaling; (width, depth): B0=(1.0,1.0),
    B1=(1.0,1.1), B5=(1.6,2.2).

    The keras.applications graph bakes input preprocessing into the model:
    ``Rescaling(1/255)`` then a ``Normalization`` layer (identity with
    ``weights=None``; ImageNet mean/var when pretrained weights are loaded,
    plus an extra ``1/sqrt(std)`` rescale).  ``norm_mean``/``norm_var`` hold
    those constants for weight imports; the stride-2 ``correct_pad`` +
    VALID convs of the keras graph are numerically identical to XLA SAME
    padding (asymmetric (k//2-1, k//2) on even inputs), so SAME is used.
    """

    width: float = 1.0
    depth: float = 1.0
    rescale: bool = True  # keras Rescaling(1/255) stem layer
    norm_mean: tuple = ()  # per-channel; empty = identity normalization
    norm_var: tuple = ()
    extra_rescale: tuple = ()  # imagenet 1/sqrt(std) (keras issue #49930)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.rescale:
            x = x / 255.0
        if self.norm_mean:
            mean = jnp.asarray(self.norm_mean, x.dtype)
            var = jnp.asarray(self.norm_var, x.dtype)
            x = (x - mean) / jnp.sqrt(var)
        if self.extra_rescale:
            x = x * jnp.asarray(self.extra_rescale, x.dtype)
        x = Conv(_round_filters(32, self.width), (3, 3), strides=(2, 2),
                 padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.silu(x)
        # (expand, filters, repeats, stride, kernel)
        spec = [(1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
                (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
                (6, 320, 1, 1, 3)]
        for t, c, n, s, k in spec:
            c = _round_filters(c, self.width)
            for i in range(_round_repeats(n, self.depth)):
                x = MBConv(c, kernel=k, stride=s if i == 0 else 1, expand=t,
                           dtype=self.dtype)(x, train)
        x = Conv(_round_filters(1280, self.width), (1, 1), padding="SAME",
                 dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        return nn.silu(x)


class EfficientNetV2(nn.Module):
    """EfficientNetV2 with fused early stages; variant in {b0, b3, s, m}.

    keras.applications.EfficientNetV2* semantics, including the baked-in
    input preprocessing (include_preprocessing=True, the default): the
    B variants on 3-channel input apply Rescaling(1/255) + a Normalization
    layer with ImageNet mean/var CONSTANTS (no weights); everything else
    applies Rescaling(1/128, offset=-1).  Stems take
    round_filters(block1 input_filters); B3 scales by (width 1.2,
    depth 1.4) including its 1536 head.
    """

    variant: str = "b0"
    preprocess: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.preprocess:
            if self.variant.startswith("b") and x.shape[-1] == 3:
                x = x / 255.0
                mean = jnp.asarray((0.485, 0.456, 0.406), x.dtype)
                var = jnp.asarray(
                    (0.229**2, 0.224**2, 0.225**2), x.dtype
                )
                x = (x - mean) / jnp.sqrt(var)
            else:
                x = x / 128.0 - 1.0
        specs = {
            # (expand, filters, repeats, stride, kernel, fused);
            # stem/head filters follow keras round_filters
            "b0": [(1, 16, 1, 1, 3, True), (4, 32, 2, 2, 3, True),
                   (4, 48, 2, 2, 3, True), (4, 96, 3, 2, 3, False),
                   (6, 112, 5, 1, 3, False), (6, 192, 8, 2, 3, False)],
            "b3": [(1, 16, 2, 1, 3, True), (4, 40, 3, 2, 3, True),
                   (4, 56, 3, 2, 3, True), (4, 112, 5, 2, 3, False),
                   (6, 136, 7, 1, 3, False), (6, 232, 12, 2, 3, False)],
            "s": [(1, 24, 2, 1, 3, True), (4, 48, 4, 2, 3, True),
                  (4, 64, 4, 2, 3, True), (4, 128, 6, 2, 3, False),
                  (6, 160, 9, 1, 3, False), (6, 256, 15, 2, 3, False)],
            "m": [(1, 24, 3, 1, 3, True), (4, 48, 5, 2, 3, True),
                  (4, 80, 5, 2, 3, True), (4, 160, 7, 2, 3, False),
                  (6, 176, 14, 1, 3, False), (6, 304, 18, 2, 3, False),
                  (6, 512, 5, 1, 3, False)],
        }
        stem = {"b0": 32, "b3": 40, "s": 24, "m": 24}[self.variant]
        head = {"b0": 1280, "b3": 1536, "s": 1280, "m": 1280}[self.variant]
        spec = specs[self.variant]
        x = Conv(stem, (3, 3), strides=(2, 2), padding="SAME",
                 dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        x = nn.silu(x)
        for t, c, n, s, k, fused in spec:
            for i in range(n):
                x = MBConv(c, kernel=k, stride=s if i == 0 else 1, expand=t,
                           fused=fused, dtype=self.dtype)(x, train)
        x = Conv(head, (1, 1), padding="SAME", dtype=self.dtype)(x)
        x = KerasBatchNorm(dtype=self.dtype)(x, train)
        return nn.silu(x)


# ---------------------------------------------------------------------------
# InceptionV3 / InceptionResNetV2
# ---------------------------------------------------------------------------


def _same_avg_pool3(x):
    """keras ``AveragePooling2D((3, 3), strides=1, padding="same")`` with TF
    semantics: zero-padded window cells are EXCLUDED from the denominator
    (tf.nn.avg_pool divides by the count of valid cells, measured corner
    value 1.0 on an all-ones input — flax's ``nn.avg_pool`` divides by the
    full window size and would disagree on every border pixel)."""
    dims, strides = (1, 3, 3, 1), (1, 1, 1, 1)
    zero = jnp.zeros((), x.dtype)
    summed = lax.reduce_window(x, zero, lax.add, dims, strides, "SAME")
    counts = lax.reduce_window(
        jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype), zero, lax.add, dims,
        strides, "SAME",
    )
    return summed / counts


class InceptionV3(nn.Module):
    """Headless ``keras.applications.InceptionV3`` (the reference's
    "inceptionv3" backbone, audiomodel.get_base_model,
    audiomodel.py:1065-1072).

    Keras-exact semantics: every conv is biasless and followed by
    BN(scale=False, eps 1e-3) + relu (``conv2d_bn``), average pools use the
    TF SAME denominator (see :func:`_same_avg_pool3`).  Each block body is
    written in the keras functional graph's TOPOLOGICAL layer order (NOT
    the keras source's textual order — e.g. the inception-A block runs
    dbl1, 5x5_1, dbl2, 1x1, 5x5_2, dbl3, pool) so the positional weight
    transplant (models/transplant.py) pairs layer-for-layer with
    ``tf.keras.applications.InceptionV3(...).layers``; verified by
    tests/test_tf_model_parity.py.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def cbr(y, f, k, s=(1, 1), pad="SAME"):
            y = Conv(f, k, strides=s, padding=pad, dtype=self.dtype)(y)
            y = KerasBatchNorm(use_scale=False, dtype=self.dtype)(y, train)
            return nn.relu(y)

        def pool3_2(y):
            return nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")

        # stem
        x = cbr(x, 32, (3, 3), (2, 2), "VALID")
        x = cbr(x, 32, (3, 3), pad="VALID")
        x = cbr(x, 64, (3, 3))
        x = pool3_2(x)
        x = cbr(x, 80, (1, 1), pad="VALID")
        x = cbr(x, 192, (3, 3), pad="VALID")
        x = pool3_2(x)

        # mixed0/1/2 (inception-A); pool-branch filters 32/64/64
        for pf in (32, 64, 64):
            dbl = cbr(x, 64, (1, 1))
            b5 = cbr(x, 48, (1, 1))
            dbl = cbr(dbl, 96, (3, 3))
            b1 = cbr(x, 64, (1, 1))
            b5 = cbr(b5, 64, (5, 5))
            dbl = cbr(dbl, 96, (3, 3))
            pool = cbr(_same_avg_pool3(x), pf, (1, 1))
            x = jnp.concatenate([b1, b5, dbl, pool], axis=-1)

        # mixed3 (grid reduction)
        dbl = cbr(x, 64, (1, 1))
        dbl = cbr(dbl, 96, (3, 3))
        b3 = cbr(x, 384, (3, 3), (2, 2), "VALID")
        dbl = cbr(dbl, 96, (3, 3), (2, 2), "VALID")
        x = jnp.concatenate([b3, dbl, pool3_2(x)], axis=-1)

        # mixed4/5/6/7 (inception-B, factorized 7x1/1x7); f 128/160/160/192
        for f in (128, 160, 160, 192):
            dbl = cbr(x, f, (1, 1))
            dbl = cbr(dbl, f, (7, 1))
            b7 = cbr(x, f, (1, 1))
            dbl = cbr(dbl, f, (1, 7))
            b7 = cbr(b7, f, (1, 7))
            dbl = cbr(dbl, f, (7, 1))
            b1 = cbr(x, 192, (1, 1))
            b7 = cbr(b7, 192, (7, 1))
            dbl = cbr(dbl, 192, (1, 7))
            pool = cbr(_same_avg_pool3(x), 192, (1, 1))
            x = jnp.concatenate([b1, b7, dbl, pool], axis=-1)

        # mixed8 (grid reduction)
        d = cbr(x, 192, (1, 1))
        d = cbr(d, 192, (1, 7))
        b = cbr(x, 192, (1, 1))
        d = cbr(d, 192, (7, 1))
        b = cbr(b, 320, (3, 3), (2, 2), "VALID")
        d = cbr(d, 192, (3, 3), (2, 2), "VALID")
        x = jnp.concatenate([b, d, pool3_2(x)], axis=-1)

        # mixed9/10 (inception-C, split 1x3 / 3x1 pairs)
        for _ in range(2):
            dbl = cbr(x, 448, (1, 1))
            b3 = cbr(x, 384, (1, 1))
            dbl = cbr(dbl, 384, (3, 3))
            b3a = cbr(b3, 384, (1, 3))
            b3b = cbr(b3, 384, (3, 1))
            dbla = cbr(dbl, 384, (1, 3))
            dblb = cbr(dbl, 384, (3, 1))
            b1 = cbr(x, 320, (1, 1))
            pool = cbr(_same_avg_pool3(x), 192, (1, 1))
            x = jnp.concatenate(
                [b1, jnp.concatenate([b3a, b3b], axis=-1),
                 jnp.concatenate([dbla, dblb], axis=-1), pool], axis=-1,
            )
        return x


class InceptionResNetV2(nn.Module):
    """Headless ``keras.applications.InceptionResNetV2`` (the reference's
    "inceptionresnetv2" backbone, audiomodel.py:1056-1063).

    Same keras-exactness rules as :class:`InceptionV3`; the residual blocks
    add ``x + scale * up`` (keras ``CustomScaleLayer``) where ``up`` is the
    only biased conv (no BN), with scales 0.17 (block35), 0.1 (block17),
    0.2 (block8) and a final un-activated block8 at scale 1.0.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)

        def cbr(y, f, k, s=(1, 1), pad="SAME"):
            y = Conv(f, k, strides=s, padding=pad, dtype=self.dtype)(y)
            y = KerasBatchNorm(use_scale=False, dtype=self.dtype)(y, train)
            return nn.relu(y)

        def pool3_2(y):
            return nn.max_pool(y, (3, 3), strides=(2, 2), padding="VALID")

        def res_add(y, up, scale, relu=True):
            out = y + scale * up  # CustomScaleLayer: in[0] + scale * in[1]
            return nn.relu(out) if relu else out

        # stem
        x = cbr(x, 32, (3, 3), (2, 2), "VALID")
        x = cbr(x, 32, (3, 3), pad="VALID")
        x = cbr(x, 64, (3, 3))
        x = pool3_2(x)
        x = cbr(x, 80, (1, 1), pad="VALID")
        x = cbr(x, 192, (3, 3), pad="VALID")
        x = pool3_2(x)

        # mixed_5b (inception-A; branch_0 is 96 wide here, pool branch 64)
        dbl = cbr(x, 64, (1, 1))
        b5 = cbr(x, 48, (1, 1))
        dbl = cbr(dbl, 96, (3, 3))
        b0 = cbr(x, 96, (1, 1))
        b5 = cbr(b5, 64, (5, 5))
        dbl = cbr(dbl, 96, (3, 3))
        pool = cbr(_same_avg_pool3(x), 64, (1, 1))
        x = jnp.concatenate([b0, b5, dbl, pool], axis=-1)

        # 10x block35 (inception-resnet-A), scale 0.17
        for _ in range(10):
            b2 = cbr(x, 32, (1, 1))
            b1 = cbr(x, 32, (1, 1))
            b2 = cbr(b2, 48, (3, 3))
            b0 = cbr(x, 32, (1, 1))
            b1 = cbr(b1, 32, (3, 3))
            b2 = cbr(b2, 64, (3, 3))
            mixed = jnp.concatenate([b0, b1, b2], axis=-1)
            up = Conv(320, (1, 1), padding="SAME", dtype=self.dtype)(mixed)
            x = res_add(x, up, 0.17)

        # mixed_6a (reduction-A)
        b1 = cbr(x, 256, (1, 1))
        b1 = cbr(b1, 256, (3, 3))
        b0 = cbr(x, 384, (3, 3), (2, 2), "VALID")
        b1 = cbr(b1, 384, (3, 3), (2, 2), "VALID")
        x = jnp.concatenate([b0, b1, pool3_2(x)], axis=-1)

        # 20x block17 (inception-resnet-B), scale 0.1
        for _ in range(20):
            b1 = cbr(x, 128, (1, 1))
            b1 = cbr(b1, 160, (1, 7))
            b0 = cbr(x, 192, (1, 1))
            b1 = cbr(b1, 192, (7, 1))
            mixed = jnp.concatenate([b0, b1], axis=-1)
            up = Conv(1088, (1, 1), padding="SAME", dtype=self.dtype)(mixed)
            x = res_add(x, up, 0.1)

        # mixed_7a (reduction-B)
        b2 = cbr(x, 256, (1, 1))
        b0 = cbr(x, 256, (1, 1))
        b1 = cbr(x, 256, (1, 1))
        b2 = cbr(b2, 288, (3, 3))
        b0 = cbr(b0, 384, (3, 3), (2, 2), "VALID")
        b1 = cbr(b1, 288, (3, 3), (2, 2), "VALID")
        b2 = cbr(b2, 320, (3, 3), (2, 2), "VALID")
        x = jnp.concatenate([b0, b1, b2, pool3_2(x)], axis=-1)

        # 9x block8 (inception-resnet-C) at scale 0.2 + the final
        # un-activated block8 at scale 1.0
        for i in range(10):
            b1 = cbr(x, 192, (1, 1))
            b1 = cbr(b1, 224, (1, 3))
            b0 = cbr(x, 192, (1, 1))
            b1 = cbr(b1, 256, (3, 1))
            mixed = jnp.concatenate([b0, b1], axis=-1)
            up = Conv(2080, (1, 1), padding="SAME", dtype=self.dtype)(mixed)
            x = res_add(x, up, 1.0 if i == 9 else 0.2, relu=i < 9)

        return cbr(x, 1536, (1, 1))  # conv_7b


# name -> constructor for the registry (audiomodel.py:972-1141 name parity)
BACKBONES = {
    "resnet": partial(ResNet, stage_sizes=(3, 4, 6, 3)),
    "resnetv2": partial(ResNet, stage_sizes=(3, 4, 6, 3), v2=True),
    "resnet152": partial(ResNet, stage_sizes=(3, 8, 36, 3)),
    "vgg16": partial(VGG, blocks=(2, 2, 3, 3, 3)),
    "vgg19": partial(VGG, blocks=(2, 2, 4, 4, 4)),
    "mobilenet": MobileNetV2,
    "densenet121": partial(DenseNet, blocks=(6, 12, 24, 16)),
    "efficientnetb0": partial(EfficientNet, width=1.0, depth=1.0),
    "efficientnetb1": partial(EfficientNet, width=1.0, depth=1.1),
    "efficientnetb5": partial(EfficientNet, width=1.6, depth=2.2),
    "efficientnetv2b0": partial(EfficientNetV2, variant="b0"),
    "efficientnetv2b3": partial(EfficientNetV2, variant="b3"),
    "efficientnetv2bs": partial(EfficientNetV2, variant="s"),
    "efficientnetv2bm": partial(EfficientNetV2, variant="m"),
    "inceptionv3": InceptionV3,
    "inceptionresnetv2": InceptionResNetV2,
}
