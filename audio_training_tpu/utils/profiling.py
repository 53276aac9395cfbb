"""Tracing/profiling harness — TPU equivalent of the reference's optional
TensorBoard profiler window + memory estimator (audiomodel.py:940-946,
2720-2767): jax.profiler traces, block_until_ready timing, and a train-state
memory estimate."""

from __future__ import annotations

import contextlib
import logging
import time
from pathlib import Path

import jax
import numpy as np

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | Path = "./profile"):
    """Capture a Perfetto-compatible device trace for the enclosed block
    (replacing the Keras profile_batch=(10, 30) window)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profile written to %s", log_dir)


def time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> dict:
    """block_until_ready timing harness: returns per-call stats in ms."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1000)
    arr = np.asarray(times)
    return {
        "mean_ms": float(arr.mean()),
        "min_ms": float(arr.min()),
        "p50_ms": float(np.median(arr)),
        "p90_ms": float(np.percentile(arr, 90)),
        "iters": iters,
    }


def state_memory_bytes(state, batch_shape: tuple | None = None) -> dict:
    """Rough memory estimate for a train state (params + adam moments +
    batch stats), the orbax-era analogue of
    keras_model_memory_usage_in_bytes (audiomodel.py:2720-2767)."""
    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "size")
        )

    params = nbytes(state.params)
    opt = nbytes(state.opt_state)
    bs = nbytes(state.batch_stats)
    out = {
        "params_bytes": params,
        "optimizer_bytes": opt,
        "batch_stats_bytes": bs,
        "total_bytes": params + opt + bs,
    }
    if batch_shape is not None:
        out["activation_estimate_bytes"] = int(np.prod(batch_shape)) * 4 * 8
    return out


def log_memory_stats() -> dict:
    """Live device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            continue
    return stats
