"""Checkpointing — orbax equivalent of the reference's Keras callback suite
(audiomodel.checkpoints, audiomodel.py:878-950): one best-checkpoint per
tracked validation metric (val_loss / val_precision / val_auc / val_recall /
val_huber / val_focal / val_accuracy) plus an unconditional per-epoch
``chkpt`` for manual resume (audiomodel.py:932-938)."""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass, field
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from audio_training_tpu.train.state import TrainState

log = logging.getLogger(__name__)

# metric name -> maximize? (audiomodel.py:878-907)
TRACKED_METRICS = {
    "val_loss": False,
    "val_precision": True,
    "val_auc": True,
    "val_recall": True,
    "val_huber": False,
    "val_focal": False,
    "val_accuracy": True,
}


def save_state(path: str | Path, state: TrainState) -> None:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": dict(state.batch_stats),
        "step": np.asarray(state.step),
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_state_dict(path: str | Path) -> dict:
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def restore_into(state: TrainState, path: str | Path) -> TrainState:
    payload = load_state_dict(path)
    return state.replace(
        params=payload["params"], batch_stats=payload["batch_stats"]
    )


def restore_with_new_head(state: TrainState, path: str | Path) -> TrainState:
    """Fine-tune restore that keeps fresh parameters wherever the checkpoint
    shapes disagree — the head swap when label counts differ
    (audiomodel.py:835-857), robust across model families (the badwinner2
    head is a Conv, wr-resnet's a Dense)."""
    import logging

    payload = load_state_dict(path)
    kept_fresh: list[str] = []

    def merge(path_keys, fresh_leaf):
        node = payload["params"]
        try:
            for k in path_keys:
                node = node[k]
        except (KeyError, TypeError):
            kept_fresh.append("/".join(path_keys))
            return fresh_leaf
        if getattr(node, "shape", None) != fresh_leaf.shape:
            kept_fresh.append("/".join(path_keys))
            return fresh_leaf
        return node

    def walk(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        return merge(list(prefix), tree)

    params = walk(jax.tree_util.tree_map(lambda x: x, state.params))
    if kept_fresh:
        logging.getLogger(__name__).info(
            "kept fresh (shape-mismatched) params: %s", kept_fresh
        )
    # batch stats merge the same way (new-head BN stats stay fresh)
    bs_payload = payload.get("batch_stats", {})

    def walk_bs(tree, src, prefix=()):
        if isinstance(tree, dict):
            return {
                k: walk_bs(v, src.get(k, {}) if isinstance(src, dict) else {},
                           prefix + (k,))
                for k, v in tree.items()
            }
        if (
            not isinstance(src, dict)
            and getattr(src, "shape", None) == tree.shape
        ):
            return src
        return tree

    batch_stats = walk_bs(dict(state.batch_stats), dict(bs_payload))
    return state.replace(params=params, batch_stats=batch_stats)


@dataclass
class BestCheckpointTracker:
    """Tracks per-metric bests and saves a checkpoint dir per metric."""

    run_dir: Path
    metrics: dict = field(default_factory=lambda: dict(TRACKED_METRICS))
    best: dict = field(default_factory=dict)

    def update(self, epoch: int, logs: dict[str, float], state: TrainState) -> list[str]:
        saved = []
        for name, maximize in self.metrics.items():
            if name not in logs or not np.isfinite(logs[name]):
                continue
            cur = logs[name]
            prev = self.best.get(name)
            improved = prev is None or (cur > prev if maximize else cur < prev)
            if improved:
                self.best[name] = cur
                save_state(self.run_dir / name.replace("val_", "val-"), state)
                saved.append(name)
        # unconditional per-epoch checkpoint (chkpt.weights.h5 parity)
        save_state(self.run_dir / "chkpt", state)
        (self.run_dir / "best.json").write_text(json.dumps(self.best, indent=2))
        if saved:
            log.info("epoch %s: improved %s", epoch, saved)
        return saved
