"""Correctness of the bounce-step megakernel (interpret mode) against the
jnp reference step it mirrors, including the replay-based VJP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
from micro_raytracer_tpu.models import tracer
from micro_raytracer_tpu.ops import intersect, pallas_step


def scenes():
    rng = np.random.default_rng(4)
    tris = rng.uniform(-1, 1, (16, 3, 3)).astype(np.float32)
    opaque = {
        "renderer": [
            {"type": "sphere", "r": 0.4, "pos": [0.3, 0.2, 0]},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8]},
            {"type": "box", "sizes": [0.3, 0.4, 0.5], "pos": [-0.6, 0.8, 0],
             "dir": [0, 0.5, 0.5, 0.1], "mat": {"rough": 0.7, "emit": 0.3}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.6},
                  {"type": "dir", "dir": [0.3, 0.5, -1], "pwr": 0.3}],
        "sky": {"color": [0.15, 0.2, 0.3], "pwr": 0.5},
    }
    glass = {
        "renderer": [
            {"type": "sphere", "r": 0.4, "mat": {"glass": 0.08, "opacity": 0.0}},
            {"type": "mesh", "mesh": tris.tolist(), "pos": [0.1, 0.9, 0.2],
             "mat": {"rough": 0.9}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8],
             "mat": {"rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [0, -1, 1], "pwr": 0.6}],
        "sky": {"color": [0.2, 0.3, 0.4], "pwr": 0.5},
    }
    tex1 = {"w": 4, "h": 4,
            "dat": rng.uniform(0, 1, (16, 3)).round(3).tolist()}
    tex2 = {"w": 8, "h": 2,
            "dat": rng.uniform(0, 1, (16, 3)).round(3).tolist()}
    emap = {"w": 4, "h": 1,
            "dat": [[0.1, 0, 0], [0.4, 0, 0], [0.7, 0, 0], [0.95, 0, 0]]}
    textured = {
        "renderer": [
            {"type": "sphere", "r": 0.5, "pos": [0.3, 0.2, 0],
             "mat": {"tex": tex1, "rough": 0.4}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8],
             "mat": {"tex": tex2, "emap": emap}},
            {"type": "box", "sizes": [0.4, 0.5, 0.6], "pos": [-0.6, 0.8, 0],
             "dir": [0, 0.5, 0.5, 0.1],
             "mat": {"tex": tex2, "rmap": emap, "omap": tex1,
                     "glass": 0.1}},
            {"type": "mesh", "mesh": tris[:4].tolist(), "pos": [0.9, -0.4, 0],
             "mat": {"tex": tex1}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.6}],
        "sky": {"color": [0.15, 0.2, 0.3], "pwr": 0.5},
    }
    # same_row class (no mesh + refraction): every group is one primitive,
    # so the exit winner IS the entry winner and the kernels take the
    # merged entry/exit path (pallas_step._step_comp_bwd_same) — the
    # CornellBox/CornellBox2 production shape
    glass_flat = {
        "renderer": [
            {"type": "sphere", "r": 0.4,
             "mat": {"glass": 0.08, "opacity": 0.0}},
            {"type": "box", "sizes": [0.4, 0.5, 0.6], "pos": [-0.6, 0.8, 0],
             "dir": [0, 0.5, 0.5, 0.1],
             "mat": {"glass": 0.1, "opacity": 0.3}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8],
             "mat": {"rough": 1.0}},
            {"type": "sphere", "r": 0.3, "pos": [0.8, 0.3, 0.1],
             "mat": {"rough": 0.6, "emit": 0.4}},
        ],
        "light": [{"type": "point", "pos": [0, -1, 1], "pwr": 0.6}],
        "sky": {"color": [0.2, 0.3, 0.4], "pwr": 0.5},
    }
    textured_flat = {
        "renderer": [r for r in textured["renderer"] if r["type"] != "mesh"],
        "light": textured["light"],
        "sky": textured["sky"],
    }
    return {"opaque": opaque, "glass": glass, "textured": textured,
            "glass_flat": glass_flat, "textured_flat": textured_flat}


def state(scene, n=256, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    pwr = jnp.asarray(rng.uniform(0.5, 1.0, (n,)), jnp.float32)
    live = jnp.asarray(rng.random(n) < 0.9)
    A = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    B = jnp.asarray(rng.uniform(0, 0.5, (n, 3)), jnp.float32)
    u = jnp.asarray(rng.random((n, 7)), jnp.float32)
    u_emit = jnp.asarray(rng.random(n), jnp.float32)
    return (o, d, pwr, live), A, B, u, u_emit


@pytest.mark.parametrize("which", ["opaque", "glass", "textured",
                                   "glass_flat", "textured_flat"])
def test_step_kernel_matches_reference(which, monkeypatch):
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "0")   # reference side stays dense
    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    frames = intersect.build_frames(scene)
    attrs = intersect.prim_attributes(scene, frames)
    ray, A, B, u, u_emit = state(scene)
    decay = jnp.float32(0.85)

    ray_r, A_r, B_r, live_r = tracer.fused_step_reference(
        scene, frames, attrs, decay, ray, A, B, u, u_emit)
    ray_k, A_k, B_k, live_k = pallas_step.step(
        scene, frames, decay, ray, A, B, u, u_emit)

    np.testing.assert_array_equal(np.asarray(live_r), np.asarray(live_k))
    for a, b, name in ((ray_r[0], ray_k[0], "o2"), (ray_r[1], ray_k[1], "d2"),
                       (ray_r[2], ray_k[2], "pwr2"), (A_r, A_k, "A2"),
                       (B_r, B_k, "B2")):
        am, bm = np.asarray(a), np.asarray(b)
        lv = np.asarray(live_k)
        if am.ndim == 2:
            lv = lv[:, None] | np.zeros_like(am, bool)
        # dead lanes keep garbage-but-finite values on both sides; compare
        # live lanes (plus A/B which are gated on both sides)
        sel = lv | (name in ("A2", "B2", "pwr2"))
        np.testing.assert_allclose(am[sel], bm[sel], rtol=2e-4, atol=2e-5,
                                   err_msg=name)


def test_step_kernel_all_dead_tile_passthrough(monkeypatch):
    """A fully-dead ray tile takes the whole-tile skip branch; the
    pass-through must equal the jnp reference's dead-lane semantics
    (A/B unchanged, pwr decays, live stays false)."""
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "0")
    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    scene = compile_scene(schema.SceneConfig.from_json(scenes()["opaque"]))
    frames = intersect.build_frames(scene)
    attrs = intersect.prim_attributes(scene, frames)
    ray, A, B, u, u_emit = state(scene, n=256, seed=5)
    ray = (ray[0], ray[1], ray[2], jnp.zeros_like(ray[3]))  # all dead
    decay = jnp.float32(0.85)

    ray_r, A_r, B_r, live_r = tracer.fused_step_reference(
        scene, frames, attrs, decay, ray, A, B, u, u_emit)
    ray_k, A_k, B_k, live_k = pallas_step.step(
        scene, frames, decay, ray, A, B, u, u_emit)
    assert not np.asarray(live_k).any()
    np.testing.assert_allclose(np.asarray(A_k), np.asarray(A_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B_k), np.asarray(B_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ray_k[2]), np.asarray(ray_r[2]),
                               rtol=1e-6)


def test_step_kernel_vjp_matches_reference(monkeypatch):
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "0")
    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    scene = compile_scene(schema.SceneConfig.from_json(scenes()["opaque"]))
    ray, A, B, u, u_emit = state(scene, n=128, seed=2)
    decay = jnp.float32(0.85)

    def loss(albedo, use_kernel):
        s = dataclasses.replace(scene, mat_albedo=albedo)
        fr = intersect.build_frames(s)
        at = intersect.prim_attributes(s, fr)
        if use_kernel:
            _, A2, B2, _ = pallas_step.step(s, fr, decay, ray, A, B, u, u_emit)
        else:
            _, A2, B2, _ = tracer.fused_step_reference(
                s, fr, at, decay, ray, A, B, u, u_emit)
        return jnp.sum(B2) + jnp.sum(A2 * 0.3)

    g_ref = np.asarray(jax.grad(lambda p: loss(p, False))(scene.mat_albedo))
    g_k = np.asarray(jax.grad(lambda p: loss(p, True))(scene.mat_albedo))
    assert np.all(np.isfinite(g_k)) and np.abs(g_ref).sum() > 0
    np.testing.assert_allclose(g_k, g_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("which", ["glass", "textured", "glass_flat",
                                   "textured_flat"])
def test_step_kernel_full_trace_matches(which, monkeypatch):
    from micro_raytracer_tpu.models.tracer import trace_radiance

    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(9)

    def run():
        # inference=True: textured scenes enable the kernel only on the
        # rendering path (no texel terms in the backward megakernel)
        return np.asarray(trace_radiance(scene, cam, (64, 64), 3,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_STEP", "0")
    a = run()
    monkeypatch.setenv("MRT_STEP", "1")
    b = run()
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)


def test_compact_perm_is_stable_live_first_partition():
    """_compact_perm: live lanes keep relative order in leading slots,
    dead lanes follow, for every reshape branch (512/128/1 inner tile)."""
    from micro_raytracer_tpu.models.tracer import _compact_perm

    rng = np.random.default_rng(11)
    for n in (2048, 512, 256, 128, 96):
        for frac in (0.0, 0.02, 0.5, 1.0):
            live = (rng.random(n) < frac).astype(np.float32)
            perm = np.asarray(_compact_perm(jnp.asarray(live)))
            assert sorted(perm.tolist()) == list(range(n))
            lanes_live = np.nonzero(live > 0.5)[0]
            lanes_dead = np.nonzero(live <= 0.5)[0]
            na = lanes_live.size
            np.testing.assert_array_equal(perm[:na], lanes_live)
            np.testing.assert_array_equal(perm[na:], lanes_dead)


def test_compaction_radiance_bitwise_identical(monkeypatch):
    """Live-first lane compaction between whole-trace segments is pure
    scheduling: radiance must be BITWISE identical with it on or off
    (the trace_fused docstring's claim, as a test). Runs the triangle
    (glass+mesh) scene where compaction is default-on, through the
    whole-trace kernel in interpret mode, at a bounce deep enough to
    cross both default cuts (3, 6)."""
    from micro_raytracer_tpu.models.tracer import trace_radiance

    scene = compile_scene(schema.SceneConfig.from_json(scenes()["glass"]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(4, 60, 4), np.arange(4, 60, 4))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(3)
    monkeypatch.setenv("MRT_STEP", "1")

    def run():
        return np.asarray(trace_radiance(scene, cam, (64, 64), 8,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_COMPACT", "0")
    base = run()
    monkeypatch.setenv("MRT_COMPACT", "1")
    comp = run()
    assert np.asarray(base).max() > 0  # scene actually renders something
    np.testing.assert_array_equal(comp, base)
    # any permutation keeps radiance bitwise (ids ride the carry):
    # the octant-sorted variant too
    monkeypatch.setenv("MRT_COMPACT_KEY", "oct")
    octr = run()
    np.testing.assert_array_equal(octr, base)


def test_compaction_forced_on_spheres_bitwise_identical(monkeypatch):
    """MRT_COMPACT=1 forces compaction on non-triangle scenes too (the
    opt-in path); radiance must still be bitwise identical."""
    from micro_raytracer_tpu.models.tracer import trace_radiance

    scene = compile_scene(schema.SceneConfig.from_json(scenes()["opaque"]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(7)
    monkeypatch.setenv("MRT_STEP", "1")

    def run():
        return np.asarray(trace_radiance(scene, cam, (64, 64), 8,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_COMPACT", "0")
    base = run()
    monkeypatch.setenv("MRT_COMPACT", "1")
    comp = run()
    assert np.asarray(base).max() > 0
    np.testing.assert_array_equal(comp, base)


@pytest.mark.parametrize("which", ["opaque", "glass", "textured"])
def test_group_fetch_matches_flat(which, monkeypatch):
    """The group-keyed attribute fetch (large-P_pad scenes: shared columns
    from the per-group table via the winner group, normals carried out of
    the sweep reduction) must reproduce the flat per-row one-hot fetch.
    The fetched values differ only in the na columns' precision (the
    sweep-carried normal is exact f32; the flat fetch reconstructs it
    from the 2-pass bf16 split), so the gate is tight allclose."""
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_GF_MIN", "8")   # force group fetch on tiny scenes
    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    frames = intersect.build_frames(scene)
    ray, A, B, u, u_emit = state(scene)
    decay = jnp.float32(0.85)
    ray2, A2, B2, live2 = pallas_step.step(scene, frames, decay, ray, A, B,
                                           u, u_emit)
    monkeypatch.setenv("MRT_GF_MIN", "99999")  # flat fetch
    ray1, A1, B1, live1 = pallas_step.step(scene, frames, decay, ray, A, B,
                                           u, u_emit)
    np.testing.assert_array_equal(np.asarray(live2), np.asarray(live1))
    np.testing.assert_allclose(np.asarray(A2), np.asarray(A1), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(B2), np.asarray(B1), rtol=1e-5,
                               atol=1e-6)
    lv = np.asarray(live1)[:, None]
    np.testing.assert_allclose(np.asarray(ray2[1]) * lv,
                               np.asarray(ray1[1]) * lv, rtol=1e-4,
                               atol=1e-5)


def test_group_fetch_full_trace_and_grads(monkeypatch):
    """Group fetch through the whole-trace path: radiance and gradients
    match the flat-fetch path on a mesh scene."""
    import dataclasses
    from micro_raytracer_tpu.models.tracer import trace_radiance

    scene = compile_scene(schema.SceneConfig.from_json(scenes()["glass"]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(5)
    monkeypatch.setenv("MRT_STEP", "1")

    def run():
        def loss(albedo):
            s = dataclasses.replace(scene, mat_albedo=albedo)
            rad = trace_radiance(s, cam, (64, 64), 4, jnp.float32(0.15),
                                 coords, key)
            return jnp.mean(rad ** 2)

        g = jax.grad(loss)(scene.mat_albedo)
        rad = trace_radiance(scene, cam, (64, 64), 4, jnp.float32(0.15),
                             coords, key, inference=True)
        return np.asarray(rad), np.asarray(g)

    monkeypatch.setenv("MRT_GF_MIN", "99999")
    rad1, g1 = run()
    monkeypatch.setenv("MRT_GF_MIN", "8")
    rad2, g2 = run()
    assert rad1.max() > 0 and np.abs(g1).sum() > 0
    np.testing.assert_allclose(rad2, rad1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g2, g1, rtol=1e-3, atol=1e-6)


def test_big_atlas_block_major_fetch_matches(monkeypatch):
    """Atlases with more than 128 texel blocks keep the block-major fetch
    layout (small ones use the round-5 j-major order — _pack_tex); both
    must agree with the jnp reference path. 16640 texels -> 130 blocks."""
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.ops import pallas_step as ps

    rng = np.random.default_rng(9)
    big = {"w": 128, "h": 130,
           "dat": rng.uniform(0, 1, (128 * 130, 3)).round(3).tolist()}
    scene = compile_scene(schema.SceneConfig.from_json({
        "renderer": [
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8],
             "mat": {"tex": big, "rough": 1.0}},
            {"type": "sphere", "r": 0.4, "pos": [0.3, 0.2, 0],
             "mat": {"rough": 0.4}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.6}],
        "sky": {"color": [0.15, 0.2, 0.3], "pwr": 0.5},
    }))
    TEXT, _meta = ps._pack_tex(scene)
    assert TEXT.shape[0] == 768, TEXT.shape      # block-major layout
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(2)

    def run():
        return np.asarray(trace_radiance(scene, cam, (64, 64), 3,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_STEP", "0")
    monkeypatch.setenv("MRT_HIT3", "0")
    ref = run()
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "1")
    got = run()
    assert ref.max() > 0
    # same-RNG cross-implementation comparison: a handful of pixels may
    # flip a bounce path at winner-t ulp boundaries, so gate the mean
    # and the flip FRACTION rather than a loose per-pixel atol (a wrong
    # channel/block in the fetch shifts nearly every textured pixel and
    # fails both)
    diff = np.abs(got - ref)
    assert diff.mean() < 5e-3, diff.mean()
    assert (diff.max(axis=-1) > 0.02).mean() < 0.02
