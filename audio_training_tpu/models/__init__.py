from audio_training_tpu.models.badwinner import BadWinner
from audio_training_tpu.models.badwinner2 import BadWinner2, BadWinner2Res
from audio_training_tpu.models.layers import (
    LMELayer,
    MagTransform,
    PCENLayer,
    logmeanexp,
)
from audio_training_tpu.models.registry import (
    MODEL_NAMES,
    ModelSpec,
    build_model,
    build_random_forest,
    fold_gray_stem,
)
from audio_training_tpu.models.wr_resnet import WRResNet
from audio_training_tpu.models.wr_resnet_bird import WRResNetBird

__all__ = [
    "BadWinner",
    "BadWinner2",
    "BadWinner2Res",
    "WRResNet",
    "WRResNetBird",
    "MagTransform",
    "PCENLayer",
    "LMELayer",
    "logmeanexp",
    "ModelSpec",
    "build_model",
    "build_random_forest",
    "fold_gray_stem",
    "MODEL_NAMES",
]
