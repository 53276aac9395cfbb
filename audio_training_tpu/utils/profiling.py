"""Tracing/profiling harness — TPU equivalent of the reference's optional
TensorBoard profiler window + memory estimator (audiomodel.py:940-946,
2720-2767): jax.profiler traces, block_until_ready timing, and a train-state
memory estimate."""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import logging
import re
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


def device_event_summary(
    trace_dir: str | Path, device_substr: str = "/device:TPU:0",
) -> list[tuple[str, float]]:
    """Aggregate device-event durations from a ``trace()`` capture.

    Reads the newest ``*.trace.json.gz`` under ``trace_dir``, keeps events
    whose pid maps (via ``process_name`` metadata) to a device matching
    ``device_substr``, and returns ``(event_name, total_ms)`` sorted by
    cost.  This is the measured per-fusion table behind every entry in
    docs/PERFORMANCE.md — use it (not guesses) before perf work; pair with
    ``fusion_layer_map`` to translate ``fusion.N`` names to model layers.
    """
    paths = sorted(
        glob.glob(str(Path(trace_dir) / "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and device_substr in str(e.get("args", {}).get("name", ""))
    }
    agg: dict[str, float] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0.0)
    return sorted(
        ((name, dur / 1000.0) for name, dur in agg.items()),
        key=lambda kv: -kv[1],
    )


_HLO_OP = re.compile(
    r"%(\S+?) = \S+ (?:fusion|convolution|custom-call|dot)\("
    r'[^\n]*?op_name="([^"]*)"'
)


def fusion_layer_map(fn, *args) -> dict[str, str]:
    """Map compiled fusion/op names to model-layer ``op_name`` metadata.

    Lowers and compiles ``fn(*args)`` and parses the optimized HLO: the op
    metadata carries the Flax module path (e.g.
    ``...  MobileNetV2_0/InvertedResidual_3/Conv_1/conv_general_dilated``),
    which is how ``fusion.N`` rows from ``device_event_summary`` are
    attributed to layers (see .claude/skills/verify/SKILL.md).
    """
    txt = jax.jit(fn).lower(*args).compile().as_text()
    out: dict[str, str] = {}
    for m in _HLO_OP.finditer(txt):
        name, op = m.group(1), m.group(2)
        out.setdefault(name, op)
    return out


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
