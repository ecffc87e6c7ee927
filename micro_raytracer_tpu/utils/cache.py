"""Persistent XLA compilation cache.

TPU first-compiles of the wavefront kernel run minutes; the reference CLI is
a short-lived process (one render per invocation, cli.rs:155-177), so every
invocation would pay that compile. Enabling JAX's persistent compilation
cache makes repeat CLI/HTTP-server startups near-instant.

Opt out with ``MRT_NO_COMPILE_CACHE=1`` (e.g. for benchmarking cold
compiles). Cache dir: ``$MRT_COMPILE_CACHE_DIR`` or
``~/.cache/micro_raytracer_tpu/xla``.
"""

from __future__ import annotations

import os

_done = False


def enable_compile_cache() -> None:
    """Idempotently enable the persistent compilation cache."""
    global _done
    if _done or os.environ.get("MRT_NO_COMPILE_CACHE") == "1":
        return
    _done = True
    import jax

    path = os.environ.get(
        "MRT_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "micro_raytracer_tpu",
                     "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
