from audio_training_tpu.train.checkpoints import (
    BestCheckpointTracker,
    load_state_dict,
    restore_into,
    restore_with_new_head,
    save_state,
)
from audio_training_tpu.train.loop import (
    EarlyStopping,
    FitResult,
    ReduceLROnPlateau,
    fit,
)
from audio_training_tpu.train.losses import get_loss
from audio_training_tpu.train.metadata import (
    featurizer_from_metadata,
    load_metadata,
    save_metadata,
)
from audio_training_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
    param_count,
)
from audio_training_tpu.train.step import (
    fresh_metrics,
    make_eval_step,
    make_predict_fn,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "param_count",
    "make_train_step",
    "make_eval_step",
    "make_predict_fn",
    "fresh_metrics",
    "fit",
    "FitResult",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "get_loss",
    "save_state",
    "load_state_dict",
    "restore_into",
    "restore_with_new_head",
    "BestCheckpointTracker",
    "save_metadata",
    "load_metadata",
    "featurizer_from_metadata",
]
