"""Test harness: force an 8-device virtual CPU mesh.

Tests exercise sharding and the tracer on CPU so they run anywhere; the real
TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
