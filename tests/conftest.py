"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX
trick; SURVEY.md §4.8). The axon TPU site hook force-prepends its
platform regardless of JAX_PLATFORMS, so we must override via
jax.config after import — before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
