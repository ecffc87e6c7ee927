"""Backward bounce-step megakernel vs the jnp reference step's VJP.

The backward kernel evaluates jax.vjp of the sweep-free residual replay
(:func:`pallas_step._step_rows`) inside the kernel body; these tests pin
its cotangents — for every scene leaf and every ray input — to the
gradients of :func:`tracer.fused_step_reference` (the jnp path the
training route used before the kernel existed). Interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema, tracer
from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
from micro_raytracer_tpu.ops import intersect, pallas_step

from test_pallas_step import scenes, state


LEAVES = ["mat_albedo", "mat_rough", "mat_metal", "mat_glass", "mat_emit",
          "mat_opacity", "light_pos", "light_dir", "light_pwr",
          "light_color", "inst_pos", "inst_dir", "prim_a", "prim_b",
          "prim_c", "prim_r"]


def _step_grads(scene, ray, A, B, u, u_emit, use_kernel, ct):
    """Cotangents of one bounce step w.r.t. scene leaves + ray inputs."""
    o, d, pwr, live = ray
    decay = jnp.float32(0.85)

    def f(leaves, o, d, pwr, A, B):
        s = dataclasses.replace(scene, **leaves)
        fr = intersect.build_frames(s)
        if use_kernel:
            ray2, A2, B2, _ = pallas_step.step(
                s, fr, decay, (o, d, pwr, live), A, B, u, u_emit)
        else:
            at = intersect.prim_attributes(s, fr)
            ray2, A2, B2, _ = tracer.fused_step_reference(
                s, fr, at, decay, (o, d, pwr, live), A, B, u, u_emit)
        return (ray2[0], ray2[1], ray2[2], A2, B2)

    leaves = {k: getattr(scene, k) for k in LEAVES}
    _, vjp = jax.vjp(f, leaves, o, d, pwr, A, B)
    return vjp(ct)


@pytest.mark.parametrize("which", ["opaque", "glass", "glass_flat"])
def test_step_bwd_kernel_matches_reference(which, monkeypatch):
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "0")   # reference side stays dense
    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    ray, A, B, u, u_emit = state(scene, n=256, seed=7)

    # random cotangents, masked to live lanes for the ray outputs (dead
    # lanes carry garbage-but-finite values on both sides by design)
    frames = intersect.build_frames(scene)
    attrs = intersect.prim_attributes(scene, frames)
    _, _, _, live2 = tracer.fused_step_reference(
        scene, frames, attrs, jnp.float32(0.85), ray, A, B, u, u_emit)
    rng = np.random.default_rng(3)
    m = np.asarray(live2)[:, None]
    ct = (jnp.asarray(rng.normal(size=(256, 3)) * m, jnp.float32),
          jnp.asarray(rng.normal(size=(256, 3)) * m, jnp.float32),
          jnp.asarray(rng.normal(size=(256,)), jnp.float32),
          jnp.asarray(rng.normal(size=(256, 3)), jnp.float32),
          jnp.asarray(rng.normal(size=(256, 3)), jnp.float32))

    g_ref = _step_grads(scene, ray, A, B, u, u_emit, False, ct)
    g_ker = _step_grads(scene, ray, A, B, u, u_emit, True, ct)

    names = ["leaves", "o", "d", "pwr", "A", "B"]
    for name, gr, gk in zip(names, g_ref, g_ker):
        flat_r = jax.tree_util.tree_leaves_with_path(gr)
        flat_k = jax.tree_util.tree_leaves(gk)
        for (path, r), k in zip(flat_r, flat_k):
            r, k = np.asarray(r), np.asarray(k)
            assert np.all(np.isfinite(k)), f"{name}{path}: non-finite"
            np.testing.assert_allclose(
                k, r, rtol=5e-4, atol=5e-5,
                err_msg=f"cotangent mismatch at {name}{path}")


def test_step_bwd_nontrivial_gradients(monkeypatch):
    """Sanity: the kernel's scene-leaf gradients are not silently zero."""
    monkeypatch.setenv("MRT_STEP", "1")
    scene = compile_scene(schema.SceneConfig.from_json(scenes()["glass"]))
    ray, A, B, u, u_emit = state(scene, n=256, seed=1)
    ones = (jnp.ones((256, 3)), jnp.ones((256, 3)), jnp.ones((256,)),
            jnp.ones((256, 3)), jnp.ones((256, 3)))
    g = _step_grads(scene, ray, A, B, u, u_emit, True, ones)
    leaves = g[0]
    for k in ["mat_albedo", "mat_rough", "light_pwr", "inst_pos", "prim_a"]:
        assert np.abs(np.asarray(leaves[k])).sum() > 0, f"{k} grad all-zero"


@pytest.mark.parametrize("which", ["glass", "textured", "glass_flat",
                                   "textured_flat"])
def test_full_trace_grad_matches_jnp_path(which, monkeypatch):
    """grad of the full fused trace through the megakernel == jnp path.

    ``textured`` covers the backward megakernel's map terms: texture
    VALUES are not trainable (shard.TRAINABLE_FIELDS) and the nearest
    texel fetch (rt.rs:618-628) is piecewise-constant, so the replay
    re-runs it as a constant and every material/geometry cotangent still
    must match the jnp path's (albedo multiplies through the texel RGB,
    scalar maps zero the base-column cotangent where a map id is set).
    """
    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 10), np.arange(8, 56, 10))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(5)

    def loss(albedo, lpwr, ipos):
        s = dataclasses.replace(scene, mat_albedo=albedo, light_pwr=lpwr,
                                inst_pos=ipos)
        rad = tracer.trace_radiance(s, cam, (64, 64), 3, jnp.float32(0.15),
                                    coords, key)
        return jnp.mean(rad ** 2)

    args = (scene.mat_albedo, scene.light_pwr, scene.inst_pos)
    monkeypatch.setenv("MRT_STEP", "0")
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(*args)
    monkeypatch.setenv("MRT_STEP", "1")
    g_ker = jax.grad(loss, argnums=(0, 1, 2))(*args)
    for r, k in zip(g_ref, g_ker):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("which", ["opaque", "glass", "textured",
                                   "glass_flat", "textured_flat"])
def test_hand_bwd_matches_machine(which, monkeypatch):
    """The hand-derived step transpose (pallas_step._step_comp_bwd) ==
    jax.vjp of the replay, through the full trace kernel (interpret).

    The hand chain factors the machine transpose's algebra; values may
    differ only by float reassociation, so the gate is tight."""
    import os

    scene = compile_scene(schema.SceneConfig.from_json(scenes()[which]))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 10), np.arange(8, 56, 10))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(5)
    monkeypatch.setenv("MRT_STEP", "1")

    def loss(albedo, lpwr, ipos, rough):
        s = dataclasses.replace(scene, mat_albedo=albedo, light_pwr=lpwr,
                                inst_pos=ipos, mat_rough=rough)
        rad = tracer.trace_radiance(s, cam, (64, 64), 3, jnp.float32(0.15),
                                    coords, key)
        return jnp.mean(rad ** 2)

    args = (scene.mat_albedo, scene.light_pwr, scene.inst_pos,
            scene.mat_rough)
    monkeypatch.setenv("MRT_BWD_HAND", "0")
    g_m = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    monkeypatch.setenv("MRT_BWD_HAND", "1")
    g_h = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for r, k in zip(g_m, g_h):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-4, atol=1e-7)


def test_winner_t_bwd_both_matches_two_sides():
    """The merged entry+exit winner-t transpose (same_row scenes) ==
    the sum of the two single-side hand transposes, which share every
    primal. Exact equality is not required (the merged form factors
    shared subexpressions), but agreement must be tight."""
    scene = compile_scene(schema.SceneConfig.from_json(scenes()["glass_flat"]))
    layout = pallas_step._seg_layout(scene.kind_counts)
    rng = np.random.default_rng(11)
    W = (8, 16)
    blk = lambda: jnp.asarray(rng.uniform(-0.9, 0.9, W), jnp.float32)
    v3 = lambda: (blk(), blk(), blk())
    at = tuple(jnp.asarray(rng.uniform(0.1, 0.9, W), jnp.float32)
               for _ in range(24))
    o, d = v3(), v3()
    row = jnp.asarray(
        rng.integers(0, scene.n_prims, W).astype(np.float32))
    ct_e, ct_x = blk(), blk()

    d_at_m, d_o_m, d_d_m = pallas_step._winner_t_bwd_both(
        layout, at, o, d, row, ct_e, ct_x)
    d_at_e, d_o_e, d_d_e, _, _ = pallas_step._winner_t_bwd_math(
        layout, False, at, o, d, row, ct_e, None, None)
    d_at_x, d_o_x, d_d_x, _, _ = pallas_step._winner_t_bwd_math(
        layout, True, at, o, d, row, ct_x, None, None)

    for j, (m, e, x) in enumerate(zip(d_at_m, d_at_e, d_at_x)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(e + x),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"d_at col {j}")
    for k in range(3):
        np.testing.assert_allclose(
            np.asarray(d_o_m[k]), np.asarray(d_o_e[k] + d_o_x[k]),
            rtol=2e-5, atol=1e-6, err_msg=f"d_o[{k}]")
        np.testing.assert_allclose(
            np.asarray(d_d_m[k]), np.asarray(d_d_e[k] + d_d_x[k]),
            rtol=2e-5, atol=1e-6, err_msg=f"d_d[{k}]")


def test_full_trace_grad_group_fetch_matches_flat(monkeypatch):
    """Whole-trace training with the group-keyed fetch (forced via
    MRT_GF_MIN on a small opaque scene): the backward reads the winner
    group + normal from residual rows and fetches shared columns off the
    (G_pad, NC) table, with shared-column cotangents folded onto the
    table's first rows. Gradients must match the flat-fetch path's for
    every leaf (same math, different summation association)."""
    scene = compile_scene(schema.SceneConfig.from_json(scenes()["opaque"]))
    assert not scene.any_refract
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(12)

    def loss(albedo, lpwr, ipos, rough):
        s = dataclasses.replace(scene, mat_albedo=albedo, light_pwr=lpwr,
                                inst_pos=ipos, mat_rough=rough)
        rad = tracer.trace_radiance(s, cam, (64, 64), 4, jnp.float32(0.15),
                                    coords, key)
        return jnp.mean(rad ** 2)

    args = (scene.mat_albedo, scene.light_pwr, scene.inst_pos,
            scene.mat_rough)
    monkeypatch.setenv("MRT_STEP", "1")
    g_flat = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    monkeypatch.setenv("MRT_GF_MIN", "8")
    g_gf = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
    for r, k in zip(g_flat, g_gf):
        assert np.asarray(r).any()
        np.testing.assert_allclose(np.asarray(k), np.asarray(r),
                                   rtol=2e-5, atol=1e-7)
