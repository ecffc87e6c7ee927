"""Pallas fused closest-hit vs the dense jnp path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_scene
from micro_raytracer_tpu.ops import intersect, pallas_hit

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
            [[0, 3, -1], [2, 3, -1], [1, 3, 1]]], "pos": [0, 0, 0]},
    ],
}


@pytest.fixture(scope="module")
def setup():
    scene = compile_scene(schema.SceneConfig.from_json(SCENE))
    frames = intersect.build_frames(scene)
    rng = np.random.default_rng(0)
    R = pallas_hit.TILE  # one full tile
    orig = jnp.asarray(rng.uniform(-3, 3, (R, 3)), jnp.float32)
    d = rng.standard_normal((R, 3)).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return scene, frames, orig, dirs


def test_forward_matches_dense(setup):
    scene, frames, orig, dirs = setup
    ref = intersect.closest_hit(scene, frames, orig, dirs)
    out = pallas_hit.closest_hit_fast(scene, frames, orig, dirs,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(out.t_entry)[h],
                               np.asarray(ref.t_entry)[h], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.t_exit)[h],
                               np.asarray(ref.t_exit)[h], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.idx_entry)[h],
                                  np.asarray(ref.idx_entry)[h])
    np.testing.assert_array_equal(np.asarray(out.idx_exit)[h],
                                  np.asarray(ref.idx_exit)[h])


def test_padding_roundtrip(setup):
    scene, frames, orig, dirs = setup
    R = 100  # deliberately not a TILE multiple
    out = pallas_hit.closest_hit_fast(scene, frames, orig[:R], dirs[:R],
                                      interpret=True)
    ref = intersect.closest_hit(scene, frames, orig[:R], dirs[:R])
    np.testing.assert_array_equal(np.asarray(out.hit), np.asarray(ref.hit))
    assert out.t_entry.shape == (R,)


def test_gradients_match_dense(setup):
    scene, frames, orig, dirs = setup

    def loss_dense(ipos, pr, o, d):
        s = dataclasses.replace(scene, inst_pos=ipos, prim_r=pr)
        fr = intersect.build_frames(s)
        h = intersect.closest_hit(s, fr, o, d)
        te = jnp.where(h.hit, h.t_entry, 0.0)
        tx = jnp.where(h.hit, h.t_exit, 0.0)
        return jnp.sum(te * 1.7 + tx * 0.3)

    def loss_pallas(ipos, pr, o, d):
        s = dataclasses.replace(scene, inst_pos=ipos, prim_r=pr)
        fr = intersect.build_frames(s)
        h = pallas_hit.closest_hit_fast(s, fr, o, d, interpret=True)
        te = jnp.where(h.hit, h.t_entry, 0.0)
        tx = jnp.where(h.hit, h.t_exit, 0.0)
        return jnp.sum(te * 1.7 + tx * 0.3)

    args = (scene.inst_pos, scene.prim_r, orig, dirs)
    g_ref = jax.grad(loss_dense, argnums=(0, 1, 2, 3))(*args)
    g_new = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(g_new, g_ref, ("inst_pos", "prim_r", "orig", "dirs")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
