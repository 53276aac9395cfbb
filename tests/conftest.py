"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

This is the standard JAX fake-multi-device trick (SURVEY.md §4): multi-chip
sharding tests run on N virtual CPU devices so no TPU hardware is needed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var — override back.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8

# Persistent compilation cache: every train_run builds fresh jit closures
# (new in-memory cache), but identical HLO is reused from disk — cuts the
# e2e CLI tests from ~9 min to ~1 min after the first run.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# mmap-count exhaustion guard.  Every jaxlib-0.9 CPU executable holds
# many small mappings; a full-suite process accumulates them linearly
# (measured: 7.9k maps at 5 min, 64.3k at the crash) until it hits
# vm.max_map_count (default 65530) and the next big compile / cache
# (de)serialize SEGFAULTS — reproduced 6x at ~180 tests in, at three
# different big executables, in compile, serialize AND deserialize
# frames, while every module passes standalone (shallow map count).
# Two-layer fix: raise the kernel limit when we can (root container),
# and clear jax's executable caches between modules to bound growth
# everywhere else.  Details: .claude/skills/verify/SKILL.md.
try:
    with open("/proc/sys/vm/max_map_count") as f:
        _map_limit = int(f.read())
    if _map_limit < 1_048_576:
        with open("/proc/sys/vm/max_map_count", "w") as f:
            f.write("1048576")
except (OSError, PermissionError):
    pass  # non-root: the per-module cache clear below bounds growth

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_mmap_growth():
    """Release compiled executables (and their code-page mappings) at
    module boundaries so map count stays far from vm.max_map_count."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def has_tf() -> bool:
    import importlib.util

    return importlib.util.find_spec("tensorflow") is not None


# TF-parity tests run by default whenever TensorFlow is importable — they are
# the numerical anchor to the reference's stft/pcen/featurizer/record-wire and
# model logits.  They carry the slow marker (TF import is minutes on a 1-core
# host); the fast tier (-m "not slow") skips them.
requires_tf = pytest.mark.skipif(
    not has_tf(), reason="TensorFlow not installed"
)
tf_parity = [requires_tf, pytest.mark.slow]
