"""Hand-rolled headless ResNet50 (reference resnet/resnet.py:5-224 parity).

The generic implementation lives in
:mod:`audio_training_tpu.models.backbones`; this module pins the classic
ResNet50 configuration under the reference's name."""

from __future__ import annotations

from functools import partial

from audio_training_tpu.models.backbones import BottleneckV1, ResNet

ResNet50 = partial(ResNet, stage_sizes=(3, 4, 6, 3), v2=False)
ResNet101 = partial(ResNet, stage_sizes=(3, 4, 23, 3), v2=False)
ResNet152 = partial(ResNet, stage_sizes=(3, 8, 36, 3), v2=False)

identity_block = BottleneckV1  # reference naming (resnet/resnet.py:79)
convolutional_block = partial(BottleneckV1, project=True)  # (:146)

__all__ = ["ResNet50", "ResNet101", "ResNet152", "identity_block",
           "convolutional_block"]
