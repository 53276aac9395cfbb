"""Train state: params + batch_stats + optax adam with injectable LR.

The learning rate lives in the optimizer hyperparams (optax
``inject_hyperparams``) so ReduceLROnPlateau can rescale it from the host
without recompiling the train step (the reference uses the Keras callback,
audiomodel.py:913-921)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: core.FrozenDict[str, Any] = struct.field(pytree_node=True)

    def current_lr(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def with_lr(self, lr: float) -> "TrainState":
        opt_state = self.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=opt_state.hyperparams["learning_rate"].dtype
        )
        return self.replace(opt_state=opt_state)


def make_optimizer(learning_rate: float = 0.01) -> optax.GradientTransformation:
    """Adam at lr 0.01 (audiomodel.py:149, optimizer(), :1226-1240)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)


def create_train_state(
    module,
    example_inputs: tuple,
    learning_rate: float = 0.01,
    seed: int = 0,
    tx: optax.GradientTransformation | None = None,
) -> TrainState:
    rngs = {"params": jax.random.PRNGKey(seed)}
    variables = module.init(rngs, *example_inputs, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    if tx is None:
        tx = make_optimizer(learning_rate)
    return TrainState.create(
        apply_fn=module.apply, params=params, tx=tx, batch_stats=batch_stats
    )


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
