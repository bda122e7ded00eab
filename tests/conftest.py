# -*- coding: utf-8 -*-
"""Test configuration: CPU backend with 8 virtual devices (for mesh/sharding
tests) and float64 enabled.

Note: env-var platform selection (JAX_PLATFORMS) does not stick in this
environment — the site customization registers a TPU plugin and forces
``jax_platforms`` via config.update at interpreter start — so we force CPU the
same way, before any backend initialises.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


DATA = "/root/reference/Data"


@pytest.fixture(scope="session")
def data_dir():
    if not os.path.isdir(DATA):
        pytest.skip("reference data fixtures not available")
    return DATA
