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
DenseNet121, EfficientNet-B0/B1/B5, EfficientNetV2-B0/B3/S/M.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

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
}
