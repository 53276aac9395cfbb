"""Device mesh + sharding helpers.

The reference has no working multi-device path (MirroredStrategy was tried on
2 GPUs and disabled, audiomodel.py:498-500).  Here data parallelism is
first-class: a (data, model) mesh, batches sharded over ``data``, parameters
replicated (these CNNs are <=10M params), XLA inserting the gradient
all-reduce over ICI.  The ``model`` axis exists so shard_map kernels and
larger models can scale without an API change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: int | None = None,
    num_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    n = num_data * num_model
    if n > len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(num_data, num_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays with the batch axis sharded over ``data``."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
