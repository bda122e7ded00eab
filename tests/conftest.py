# -*- coding: utf-8 -*-
"""Test configuration: CPU backend with 8 virtual devices (for mesh/sharding
tests) and float64 enabled, set up before JAX initialises."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


DATA = "/root/reference/Data"


@pytest.fixture(scope="session")
def data_dir():
    return DATA
