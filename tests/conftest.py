"""Test harness: force an 8-device virtual CPU mesh.

Tests exercise sharding and the tracer on CPU so they run anywhere; the real
TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

# Force CPU even when the environment pins a TPU platform (e.g.
# JAX_PLATFORMS=axon): tests need the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The env var alone is not enough when a sitecustomize PJRT plugin has
# already configured jax at interpreter startup — override the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
