"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh (the standard JAX
trick; SURVEY.md §4.8) — must be set before JAX initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
