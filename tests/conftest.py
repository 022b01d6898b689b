"""Test harness configuration.

Forces JAX onto an 8-device virtual CPU platform so sharding tests exercise a
real multi-device mesh without TPU hardware (the JAX analogue of the fake
clusters the reference lacks — SURVEY.md §4). Must run before any backend
initialization: the environment pre-registers a TPU-tunnel platform at
interpreter startup, so we switch via jax.config before first device use.
"""

import os

# Neutralize the TPU tunnel for the test process tree (subprocesses included).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_NUM_CPU_DEVICES"] = "8"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. running on real TPU deliberately)

import numpy as np
import pytest


@pytest.fixture
def rng(request):
    # Deterministic PER TEST (seeded from the test's nodeid), not per
    # session: a shared session RNG makes every test's data depend on
    # which tests ran before it, so threshold assertions (overlap >=
    # 0.8, recall bounds) flake under -x / -k / reordering. With a
    # per-test seed each test sees identical data no matter what else
    # runs.
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)


def pytest_report_header(config):
    return f"jax devices: {jax.devices()}"
