"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform with 8 virtual devices (SURVEY.md §4: replaces the fake backends
the reference lacks).

The image boots every Python process with an axon TPU site hook
(PYTHONPATH=/root/.axon_site) that registers a remote-compile TPU backend
and forces jax_platforms='axon,cpu' — overriding the JAX_PLATFORMS env
var, so env alone can't steer tests onto the CPU. jax.config.update wins
over the hook as long as it runs before backends initialize, i.e. here in
conftest before any test imports jax arrays.
Set RASR_TPU_TEST_TPU=1 to run tests on the real chip instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("RASR_TPU_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_configure(config):
    """Force-disable pytest-xdist for the on-chip suite.

    pytest.ini sets ``-n 2`` for the CPU tiers, but with
    RASR_TPU_TEST_TPU=1 the conftest leaves the TPU backend active and
    two xdist workers would BOTH claim the chip — the second blocks at
    backend init indefinitely (verified chip-claim behavior, CLAUDE.md).
    This hook runs before xdist's trylast pytest_configure activates its
    DSession, so zeroing the option here keeps the hardware gate
    single-process regardless of addopts.
    """
    if os.environ.get("RASR_TPU_TEST_TPU") == "1":
        if getattr(config.option, "numprocesses", None):
            config.option.numprocesses = 0
        if getattr(config.option, "dist", "no") != "no":
            config.option.dist = "no"


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
