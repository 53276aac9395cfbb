"""External embedding models (Perch / YAMNet) — gated interfaces.

The reference optionally extracts bird-vocalization-classifier ("Perch")
embeddings at record-write time (audiowriter.py:212,248-253,440-453) and
offers chirp/yamnet embedding + YAMNet speech-score paths at inference
(predict.py:380-396,1051).  Those models load from tensorflow_hub, which is
unreachable in zero-egress builds — these wrappers define the contract,
accept a local saved-model path when one is available, and raise clear
errors otherwise.  Everything downstream (embedding records,
``data/embeddings.EmbeddingStream``, the ``embeddings`` linear-probe model)
is fully functional on stored embeddings.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

PERCH_EMBEDDING_DIM = 1280
YAMNET_EMBEDDING_SHAPE = (6, 1024)  # per 3 s window (tfdataset.py:181)


class EmbeddingModel:
    """Wrapper over a locally-available TF-hub style saved model."""

    def __init__(self, model_path: str | Path | None, name: str,
                 sample_rate: int):
        self.name = name
        self.sample_rate = sample_rate
        self._model = None
        if model_path is not None and Path(model_path).exists():
            try:
                import tensorflow as tf

                self._model = tf.saved_model.load(str(model_path))
            except Exception:
                log.error("could not load %s from %s", name, model_path,
                          exc_info=True)

    @property
    def available(self) -> bool:
        return self._model is not None

    def _require(self):
        if self._model is None:
            raise RuntimeError(
                f"{self.name} embedding model is not available: pass a local "
                "saved-model path (tensorflow_hub is unreachable in "
                "zero-egress builds)"
            )


class PerchModel(EmbeddingModel):
    """bird-vocalization-classifier: 5 s 32 kHz windows -> 1280-d embedding
    + logits (audiowriter.py:212-253)."""

    WINDOW_S = 5.0

    def __init__(self, model_path: str | Path | None = None):
        super().__init__(model_path, "perch", 32000)

    def embed(self, frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(windows*160k,) 32 kHz audio -> (windows, 1280) embeddings and
        (windows, classes) logits."""
        self._require()
        window = int(self.WINDOW_S * self.sample_rate)
        n = len(frames) // window
        chunks = frames[: n * window].reshape(n, window)
        out = self._model.infer_tf(chunks.astype(np.float32))
        return np.asarray(out["embedding"]), np.asarray(out["label"])


class YamnetModel(EmbeddingModel):
    """YAMNet: 16 kHz waveform -> (frames, 1024) embeddings + 521 scores
    (predict.py:380-396)."""

    def __init__(self, model_path: str | Path | None = None):
        super().__init__(model_path, "yamnet", 16000)

    def embed(self, frames: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        self._require()
        scores, embeddings, _ = self._model(frames.astype(np.float32))
        return np.asarray(embeddings), np.asarray(scores)

    def speech_score(self, frames: np.ndarray,
                     speech_index: int = 0) -> float:
        """Max speech probability over the clip (predict.get_speech_score,
        predict.py:1051)."""
        _, scores = self.embed(frames)
        return float(np.max(scores[:, speech_index]))
