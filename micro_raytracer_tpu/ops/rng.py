"""Counter-based randomness for path tracing.

The reference uses a global ``thread_rng`` (rt.rs:917-919, 996-1007 etc.);
here every draw comes from a threefry key derived from
``(base_key, sample, bounce, purpose)`` so results are reproducible and
independent of device count or tiling — the TPU-native replacement for
stateful RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import linalg


def uniform(key, shape):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def sphere_rand(n, rough, u1, u2):
    """Jittered normal: ``normalize(n + rough * uniform_sphere)``.

    Matches ``RayTracer::rand`` (rt.rs:996-1007): ``th = acos(1 - 2 u)``,
    ``phi = 2 pi v``, direction from spherical angles.

    Args:
      n: ``(..., 3)`` normals.
      rough: ``(...,)`` jitter magnitude.
      u1, u2: ``(...,)`` uniforms in [0, 1).
    """
    th = jnp.arccos(jnp.clip(1.0 - 2.0 * u1, -1.0, 1.0))
    phi = u2 * 2.0 * jnp.pi
    st = jnp.sin(th)
    v = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(th)], axis=-1)
    return linalg.normalize(n + rough[..., None] * v)
