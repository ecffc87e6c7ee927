"""Blockwise Pallas closest-hit (v2) vs the dense path, interpret mode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_scene
from micro_raytracer_tpu.ops import intersect, pallas_hit2

SCENE = {
    "renderer": [
        {"type": "sphere", "r": 0.4, "pos": [0, 1, 0]},
        {"type": "sphere", "r": 0.3, "pos": [0.5, 2, 0]},
        {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -1]},
        {"type": "box", "sizes": [1, 2, 1], "pos": [2, 1, 0],
         "dir": [0, 0.5, 0.5, 0]},
        {"type": "triangle", "vtx": [[-1, 2, -1], [1, 2, -1], [0, 2, 1]]},
        {"type": "mesh", "mesh": [
            [[-2, 3, -1], [0, 3, -1], [-1, 3, 1]],
            [[0, 3, -1], [2, 3, -1], [1, 3, 1]]]},
    ],
}


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene(schema.SceneConfig.from_json(SCENE))
    frames = intersect.build_frames(scene)
    rng = np.random.default_rng(0)
    R = pallas_hit2.RAY_TILE * 3
    orig = jnp.asarray(rng.uniform(-3, 3, (R, 3)), jnp.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return scene, frames, orig, dirs


def test_v2_forward_matches_dense(setup):
    scene, frames, orig, dirs = setup
    ref = intersect.closest_hit(scene, frames, orig, dirs)
    out = pallas_hit2.closest_hit_fast(scene, frames, orig, dirs,
                                       interpret=True)
    h = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(out.hit), h)
    np.testing.assert_allclose(np.asarray(out.t_entry)[h],
                               np.asarray(ref.t_entry)[h], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t_exit)[h],
                               np.asarray(ref.t_exit)[h], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.idx_entry)[h],
                                  np.asarray(ref.idx_entry)[h])
    np.testing.assert_array_equal(np.asarray(out.idx_exit)[h],
                                  np.asarray(ref.idx_exit)[h])


def test_v2_gradients_match_dense(setup):
    scene, frames, orig, dirs = setup

    def loss(fn):
        def inner(ipos, pr, o, d):
            s = dataclasses.replace(scene, inst_pos=ipos, prim_r=pr)
            fr = intersect.build_frames(s)
            h = fn(s, fr, o, d)
            te = jnp.where(h.hit, h.t_entry, 0.0)
            tx = jnp.where(h.hit, h.t_exit, 0.0)
            return jnp.sum(te * 1.3 + tx * 0.7)
        return inner

    args = (scene.inst_pos, scene.prim_r, orig, dirs)
    g_ref = jax.grad(loss(intersect.closest_hit), argnums=(0, 1, 2, 3))(*args)
    g_new = jax.grad(
        loss(lambda s, fr, o, d: pallas_hit2.closest_hit_fast(
            s, fr, o, d, interpret=True)), argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_new, g_ref, ("inst_pos", "prim_r", "orig", "dirs")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
