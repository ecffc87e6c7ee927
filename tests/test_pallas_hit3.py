"""Correctness of the all-kind fused Pallas closest-hit (interpret mode)
against the dense closest_hit, including the per-kind winner-t VJP."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_scene
from micro_raytracer_tpu.ops import intersect, pallas_hit3


@pytest.fixture()
def mixed_scene():
    rng = np.random.default_rng(2)
    tris = rng.uniform(-1, 1, (24, 3, 3)).astype(np.float32)
    return compile_scene(schema.SceneConfig.from_json({
        "renderer": [
            {"type": "sphere", "r": 0.4, "pos": [0.3, 0.2, 0]},
            {"type": "sphere", "r": 0.25, "pos": [-0.5, 0.5, 0.2],
             "dir": [0, 0.6, 0.4, 0]},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.8]},
            {"type": "plane", "n": [0.3, -1, 0.1], "pos": [0, 1.5, 0]},
            {"type": "box", "sizes": [0.3, 0.4, 0.5], "pos": [0.6, 0.8, 0],
             "dir": [0, 0.5, 0.5, 0.1]},
            {"type": "mesh", "mesh": tris.tolist(), "pos": [-0.2, 0.9, 0.1],
             "mat": {"opacity": 0.0, "glass": 0.1}},
        ],
    }))


def rays(n=512, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    d = rng.normal(size=(n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    return o, d


@pytest.mark.parametrize("need_exit", [True, False])
def test_hit3_matches_dense(mixed_scene, need_exit, monkeypatch):
    monkeypatch.setenv("MRT_TRI_MXU", "1")
    monkeypatch.setenv("MRT_HIT3", "1")
    scene = mixed_scene
    frames = intersect.build_frames(scene)
    o, d = rays()
    ref = intersect.closest_hit(scene, frames, o, d, need_exit=need_exit)
    got = pallas_hit3.closest_hit(scene, frames, o, d, need_exit=need_exit)
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.idx_entry),
                                  np.asarray(got.idx_entry))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t_entry)[h],
                               np.asarray(ref.t_entry)[h], rtol=1e-5,
                               atol=1e-6)
    if need_exit:
        np.testing.assert_array_equal(np.asarray(ref.idx_exit),
                                      np.asarray(got.idx_exit))
        np.testing.assert_allclose(np.asarray(got.t_exit)[h],
                                   np.asarray(ref.t_exit)[h], rtol=1e-5,
                                   atol=1e-6)

    anyref = np.asarray(intersect.any_hit(scene, frames, o, d))
    np.testing.assert_array_equal(
        np.asarray(pallas_hit3.any_hit(scene, frames, o, d)), anyref)


@pytest.mark.parametrize("field", ["inst_pos", "inst_dir"])
def test_hit3_gradients_match_dense(mixed_scene, field, monkeypatch):
    """d sum(t_entry + t_exit over hits) / d transforms: per-kind winner-t
    VJP == dense autodiff across all four kinds at once."""
    monkeypatch.setenv("MRT_TRI_MXU", "1")
    monkeypatch.setenv("MRT_HIT3", "1")
    scene = mixed_scene
    o, d = rays(128, seed=5)

    def loss(pos, use_pallas):
        s = dataclasses.replace(scene, **{field: pos})
        fr = intersect.build_frames(s)
        f = pallas_hit3.closest_hit if use_pallas else intersect.closest_hit
        h = f(s, fr, o, d, need_exit=True)
        return (jnp.sum(jnp.where(h.hit, h.t_entry, 0.0))
                + jnp.sum(jnp.where(h.hit, h.t_exit, 0.0)))

    p0 = getattr(scene, field)
    g_ref = np.asarray(jax.grad(lambda p: loss(p, False))(p0))
    g_pl = np.asarray(jax.grad(lambda p: loss(p, True))(p0))
    assert np.all(np.isfinite(g_pl))
    np.testing.assert_allclose(g_pl, g_ref, rtol=3e-4, atol=2e-5)


def test_hit3_tracer_radiance_matches_dense(mixed_scene, monkeypatch):
    from micro_raytracer_tpu.models.compiler import compile_camera
    from micro_raytracer_tpu.models.tracer import trace_radiance

    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2, 0]}))
    xs, ys = np.meshgrid(np.arange(8, 56, 6), np.arange(8, 56, 6))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    key = jax.random.PRNGKey(6)

    def run():
        return np.asarray(trace_radiance(mixed_scene, cam, (64, 64), 3,
                                         jnp.float32(0.15), coords, key))

    monkeypatch.setenv("MRT_HIT3", "0")
    monkeypatch.setenv("MRT_TRI_PALLAS", "0")
    a = run()
    monkeypatch.setenv("MRT_HIT3", "1")
    b = run()
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)


def test_hit3_tri_culling_matches_dense(monkeypatch):
    """>128 triangles (n_cb > 1) activate the candidate-list AABB culling
    path; clustered geometry makes real skips happen, an instanced
    rotation exercises the world-vertex inverse, and results must be
    IDENTICAL to the dense sweep (culling is conservative, not lossy)."""
    monkeypatch.setenv("MRT_TRI_MXU", "1")
    monkeypatch.setenv("MRT_HIT3", "1")
    rng = np.random.default_rng(7)
    tris = []
    # three tight clusters far apart -> most (tile, super) pairs cull
    for c in ([-3.0, 0.0, 0.0], [3.0, 2.0, 0.0], [0.0, -3.0, 2.0]):
        base = rng.uniform(-0.5, 0.5, (70, 1, 3)) + np.asarray(c)[None, None]
        tris.append(base + rng.uniform(-0.2, 0.2, (70, 3, 3)))
    tris = np.concatenate(tris).astype(np.float32)      # 210 triangles
    scene = compile_scene(schema.SceneConfig.from_json({
        "renderer": [
            {"type": "mesh", "mesh": tris.tolist(),
             "pos": [0.2, 0.1, 0.0], "dir": [0, 0.4, 0.8, 0.1]},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -4]},
        ],
    }))
    frames = intersect.build_frames(scene)
    o, d = rays(n=512, seed=3)
    ref = intersect.closest_hit(scene, frames, o, d, need_exit=False)
    got = pallas_hit3.closest_hit(scene, frames, o, d, need_exit=False)
    assert np.asarray(ref.hit).any()
    np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(got.hit))
    np.testing.assert_array_equal(np.asarray(ref.idx_entry),
                                  np.asarray(got.idx_entry))
    h = np.asarray(ref.hit)
    np.testing.assert_allclose(np.asarray(got.t_entry)[h],
                               np.asarray(ref.t_entry)[h], rtol=1e-5,
                               atol=1e-6)


def test_occl_early_exit_and_nocull_match(monkeypatch):
    """The shadow-sweep early exit (MRT_TRI_OCCL_EXIT) stops the candidate
    loop once every live lane is occluded — it may only SKIP work, never
    change which live lane counts as occluded, so radiance through the
    step megakernel must be bitwise identical with it on and off. The
    same scene with culling disabled entirely (MRT_TRI_NOCULL, the
    golden_check validation knob) must agree too: this mesh has no
    |det|>=E phantom rows, so dropping none is observable."""
    from micro_raytracer_tpu.models.compiler import compile_camera
    from micro_raytracer_tpu.models.tracer import trace_radiance

    rng = np.random.default_rng(11)
    tris = []
    for c in ([-1.5, 1.0, 0.0], [1.5, 1.5, 0.3], [0.0, 2.5, -0.3]):
        base = rng.uniform(-0.4, 0.4, (70, 1, 3)) + np.asarray(c)[None, None]
        tris.append(base + rng.uniform(-0.15, 0.15, (70, 3, 3)))
    tris = np.concatenate(tris).astype(np.float32)      # 210 tris, n_cb > 1
    scene = compile_scene(schema.SceneConfig.from_json({
        "renderer": [
            {"type": "mesh", "mesh": tris.tolist(), "mat": {"rough": 1.0}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -1.2],
             "mat": {"rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.8], "pwr": 0.7}],
        "sky": {"color": [0.2, 0.25, 0.3], "pwr": 0.4},
    }))
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2.5, 0]}))
    # 1024 rays -> a full 1024-lane kernel tile, so the component-form
    # slab test AND the sub-tile (H-group) candidate path are exercised
    # in interpret mode (smaller batches take the (1, RT) fallback)
    xs, ys = np.meshgrid(np.arange(32), np.arange(32))
    coords = jnp.asarray(np.stack([xs.ravel() * 1.8 + 2,
                                   ys.ravel() * 1.8 + 2], -1), jnp.float32)
    key = jax.random.PRNGKey(9)
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "1")

    def run():
        return np.asarray(trace_radiance(scene, cam, (64, 64), 4,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_TRI_SUBTILE", "1")
    monkeypatch.setenv("MRT_TRI_OCCL_EXIT", "0")
    base = run()
    assert base.max() > 0
    monkeypatch.setenv("MRT_TRI_OCCL_EXIT", "1")
    fast = run()
    np.testing.assert_array_equal(fast, base)
    monkeypatch.setenv("MRT_TRI_OCCL_EXIT", "0")
    for h in ("2", "4"):
        monkeypatch.setenv("MRT_TRI_SUBTILE", h)
        sub = run()
        np.testing.assert_array_equal(sub, base)
    monkeypatch.setenv("MRT_TRI_NOCULL", "1")
    nocull = run()
    np.testing.assert_array_equal(nocull, base)


def test_sphere_cull_blocks_match_dense(monkeypatch):
    """Instance-class scenes (a long sphere segment) sweep _CB-row
    candidate blocks gated by per-block AABBs. At a 1024-lane tile the
    step-kernel path must produce bitwise-identical radiance with
    culling on, off (MRT_TRI_NOCULL), and sub-tile variants, and match
    the dense jnp reference in expectation (same RNG: exactly)."""
    from micro_raytracer_tpu.models.compiler import compile_camera
    from micro_raytracer_tpu.models.tracer import trace_radiance

    rng = np.random.default_rng(5)
    objs = []
    # 9*8*5 = 360 spheres: deliberately NOT a multiple of _CB=64, so the
    # last candidate block overhangs the segment — the round-5 review
    # caught dynamic_slice clamping the start while the row labels used
    # the unclamped value (every row of the final block mislabeled)
    for x in range(9):
        for y in range(8):
            for z in range(5):
                objs.append({
                    "type": "sphere", "r": 0.18,
                    "pos": [x * 0.5 - 2.0, y * 0.5 + 1.0, z * 0.5 - 1.0],
                    "mat": {"rough": float(rng.uniform(0.2, 1.0)),
                            "albedo": [float(v) for v in
                                       rng.uniform(0.2, 1.0, 3)]},
                })
    scene = compile_scene(schema.SceneConfig.from_json({
        "renderer": objs,
        "light": [{"type": "point", "pos": [0, -1, 1.5], "pwr": 0.7}],
        "sky": {"color": [0.25, 0.3, 0.35], "pwr": 0.5},
    }))
    assert pallas_hit3._sph_cull_rows(
        pallas_hit3._seg_layout(scene.kind_counts)) is not None
    cam = compile_camera(schema.CameraConfig.from_json({"pos": [0, -2.5, 0]}))
    xs, ys = np.meshgrid(np.arange(32), np.arange(32))
    coords = jnp.asarray(np.stack([xs.ravel() * 1.8 + 2,
                                   ys.ravel() * 1.8 + 2], -1), jnp.float32)
    key = jax.random.PRNGKey(4)
    monkeypatch.setenv("MRT_STEP", "1")
    monkeypatch.setenv("MRT_HIT3", "1")

    def run():
        return np.asarray(trace_radiance(scene, cam, (64, 64), 3,
                                         jnp.float32(0.15), coords, key,
                                         inference=True))

    monkeypatch.setenv("MRT_TRI_NOCULL", "1")
    base = run()
    assert base.max() > 0
    monkeypatch.delenv("MRT_TRI_NOCULL")
    culled = run()
    np.testing.assert_array_equal(culled, base)
    for h in ("1", "4"):
        monkeypatch.setenv("MRT_TRI_SUBTILE", h)
        sub = run()
        np.testing.assert_array_equal(sub, base)
    monkeypatch.delenv("MRT_TRI_SUBTILE")
    # two-level attribute fetch (attr2): this scene has 320 groups (>
    # _GF_MAX_GROUPS, so no group fetch); lowering the width threshold
    # forces the block-rearranged fetch, which selects the same rows
    # bitwise (stage 1 is the same 2-pass split dot with one nonzero
    # one-hot column, stage 2 an exact 0/1 select)
    monkeypatch.setenv("MRT_GF_MIN", "64")
    two = run()
    np.testing.assert_array_equal(two, base)
    monkeypatch.delenv("MRT_GF_MIN")
    # dense jnp reference, same RNG stream: agreement is per-pixel except
    # where a winner-t ulp difference between the implementations flips a
    # bounce path (sphere silhouettes; same chaos as the tri bad_frac)
    monkeypatch.setenv("MRT_STEP", "0")
    monkeypatch.setenv("MRT_HIT3", "0")
    dense = run()
    bad = np.abs(culled - dense).max(axis=-1) > 0.05
    assert bad.mean() < 0.02, f"bad_frac {bad.mean():.4f}"
