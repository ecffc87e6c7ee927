"""Correctness of the Pallas triangle reduction (interpret mode on CPU)
against the dense closest_hit, including gradients through the custom VJP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_scene
from micro_raytracer_tpu.ops import intersect, pallas_tri


@pytest.fixture()
def mesh_scene():
    rng = np.random.default_rng(1)
    tris = rng.uniform(-1, 1, (40, 3, 3)).astype(np.float32)
    # a watertight tetra so group exit hits differ from entries
    tetra = [
        [[0.0, 0.0, 0.35], [-0.3, -0.2, -0.25], [0.3, -0.2, -0.25]],
        [[0.0, 0.0, 0.35], [0.3, -0.2, -0.25], [0.0, 0.3, -0.25]],
        [[0.0, 0.0, 0.35], [0.0, 0.3, -0.25], [-0.3, -0.2, -0.25]],
        [[-0.3, -0.2, -0.25], [0.3, -0.2, -0.25], [0.0, 0.3, -0.25]],
    ]
    cfg = schema.SceneConfig.from_json({
        "renderer": [
            {"type": "mesh", "mesh": tris.tolist(), "dir": [0, 0.4, 0.6, 0.2],
             "pos": [0.2, -0.1, 0.3]},
            {"type": "mesh", "mesh": tetra, "pos": [-0.5, 0.5, 0],
             "mat": {"opacity": 0.0, "glass": 0.1}},
            {"type": "sphere", "r": 0.3},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.9]},
        ],
    })
    return compile_scene(cfg)


def rays(n=512, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return o, d


def test_pallas_entry_exit_matches_dense(mesh_scene, monkeypatch):
    monkeypatch.setenv("MRT_TRI_MXU", "1")  # dense side uses the MXU formula
    scene = mesh_scene
    frames = intersect.build_frames(scene)
    o, d = rays()
    ref = intersect.closest_hit(scene, frames, o, d, need_exit=True)
    got = intersect.closest_hit_tri_pallas(scene, frames, o, d,
                                           need_exit=True)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.idx_entry),
                                  np.asarray(got.idx_entry))
    np.testing.assert_array_equal(np.asarray(ref.idx_exit),
                                  np.asarray(got.idx_exit))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t_entry)[h],
                               np.asarray(ref.t_entry)[h], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.t_exit)[h],
                               np.asarray(ref.t_exit)[h], rtol=1e-5)

    anyref = np.asarray(intersect.intersect_all(scene, frames, o, d)[2]).any(1)
    monkeypatch.setenv("MRT_TRI_PALLAS", "1")
    monkeypatch.setenv("MRT_TRI_PALLAS_MIN", "1")
    got_any = np.asarray(intersect.any_hit(scene, frames, o, d))
    np.testing.assert_array_equal(got_any, anyref)


def test_pallas_entry_gradients_match_dense(mesh_scene, monkeypatch):
    """d sum(t_entry over hits) / d inst_pos: custom VJP == dense autodiff."""
    scene = mesh_scene
    o, d = rays(128, seed=3)

    def loss_dense(pos):
        s = dataclasses.replace(scene, inst_pos=pos)
        fr = intersect.build_frames(s)
        h = intersect.closest_hit(s, fr, o, d, need_exit=True)
        return (jnp.sum(jnp.where(h.hit, h.t_entry, 0.0))
                + jnp.sum(jnp.where(h.hit, h.t_exit, 0.0)))

    def loss_pallas(pos):
        s = dataclasses.replace(scene, inst_pos=pos)
        fr = intersect.build_frames(s)
        h = intersect.closest_hit_tri_pallas(s, fr, o, d, need_exit=True)
        return (jnp.sum(jnp.where(h.hit, h.t_entry, 0.0))
                + jnp.sum(jnp.where(h.hit, h.t_exit, 0.0)))

    monkeypatch.setenv("MRT_TRI_MXU", "1")
    g_ref = np.asarray(jax.grad(loss_dense)(scene.inst_pos))
    g_pl = np.asarray(jax.grad(loss_pallas)(scene.inst_pos))
    assert np.all(np.isfinite(g_pl))
    np.testing.assert_allclose(g_pl, g_ref, rtol=2e-4, atol=1e-5)


def test_pallas_tracer_radiance_matches_dense(mesh_scene, monkeypatch):
    """Full tracer through the split Pallas path == dense path."""
    from micro_raytracer_tpu.models.compiler import compile_camera
    from micro_raytracer_tpu.models.tracer import trace_radiance

    cam = compile_camera(schema.CameraConfig.from_json({}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(4)

    def run():
        return np.asarray(trace_radiance(mesh_scene, cam, (64, 64), 3,
                                         jnp.float32(0.15), coords, key))

    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    a = run()
    monkeypatch.setenv("MRT_TRI_PALLAS", "1")
    monkeypatch.setenv("MRT_TRI_PALLAS_MIN", "1")
    b = run()
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)
