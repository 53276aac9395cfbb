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

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


def has_tf() -> bool:
    import importlib.util

    return importlib.util.find_spec("tensorflow") is not None


# TF-parity tests are opt-in (RUN_TF_PARITY=1): importing TF takes minutes on
# small hosts, and the numerical oracles they check against are also covered
# by the pure-numpy oracle tests that always run.
requires_tf = pytest.mark.skipif(
    not (has_tf() and os.environ.get("RUN_TF_PARITY") == "1"),
    reason="TF parity tests are opt-in: set RUN_TF_PARITY=1",
)
