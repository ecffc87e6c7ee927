"""Microbench for the bounce-step megakernel: fwd / train-fwd / bwd.

Times the three pallas_step entry points in isolation on the current
platform (one kernel dispatch each, no scan, no camera), sweeping ray-tile
sizes, so kernel-level regressions are visible without the full-render
noise. Use to tune MRT_STEP_RT / MRT_STEP_BWD_RT.

Usage: python tools/step_perf.py [--scene CornellBox] [--rays 1048576]
Prints one JSON line per (kernel, tile) with ms and rays/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = "/root/reference/example"


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="CornellBox")
    p.add_argument("--rays", type=int, default=1048576)
    p.add_argument("--tiles", default="256,512,1024,2048")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--platform", default="env", choices=("cpu", "env"))
    args = p.parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import compile_scene
    from micro_raytracer_tpu.ops import intersect, pallas_step

    with open(f"{EXAMPLES}/{args.scene}.json") as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    scene = compile_scene(cfg.scene)
    frames = intersect.build_frames(scene)
    tri_pack = None
    if scene.kind_counts[schema.KIND_TRIANGLE]:
        tri_pack = intersect.triangle_pack(scene, frames)
    consts, attr, _gattr, _attr2, lights, _tex = pallas_step.pack_step(
        scene, frames, tri_pack)
    layout = pallas_step._seg_layout(scene.kind_counts)
    need_exit, L = scene.any_refract, scene.n_lights

    R = args.rays
    rk = jax.random.PRNGKey(0)
    ks = jax.random.split(rk, 8)
    oT = jax.random.normal(ks[0], (3, R), jnp.float32)
    dT_ = jax.random.normal(ks[1], (3, R), jnp.float32)
    dT_ = dT_ / jnp.linalg.norm(dT_, axis=0, keepdims=True)
    pwrT = jnp.ones((1, R), jnp.float32)
    liveT = jnp.ones((1, R), jnp.float32)
    A_T = jnp.ones((3, R), jnp.float32)
    B_T = jnp.zeros((3, R), jnp.float32)
    u8 = jax.random.uniform(ks[2], (8, R), jnp.float32)
    dk = jnp.float32(0.85)
    cts = tuple(jnp.ones_like(x) for x in (oT, dT_, pwrT, A_T, B_T))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    def best(f, *a):
        sync(f(*a))
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            sync(f(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # dispatch floor with a one-op program
    tiny = jax.jit(lambda x: x + 1.0)
    base = best(tiny, jnp.zeros((8, 128), jnp.float32))

    fwd = jax.jit(lambda *a: pallas_step._call_step(
        layout, need_exit, L, consts, attr, lights, dk, *a))
    fwd_t = jax.jit(lambda *a: pallas_step._call_step(
        layout, need_exit, L, consts, attr, lights, dk, *a, train=True))

    def bwd_fn(oT, dT_, pwrT, liveT, A_T, B_T, u8, te, tx, row, xrow, lok,
               *cts):
        res_lane = (oT, dT_, pwrT, liveT, A_T, B_T, u8, te, tx, row, xrow,
                    lok)
        return pallas_step._call_step_bwd(
            layout, need_exit, L, consts[6], consts[7], attr, lights, dk,
            res_lane, cts)

    bwd = jax.jit(bwd_fn)

    args_fwd = (oT, dT_, pwrT, liveT, A_T, B_T, u8)
    for tile in [int(t) for t in args.tiles.split(",")]:
        pallas_step._TILE_FWD = tile
        # the component-form backward needs >=1024 rays per tile (its lane
        # width is RT/8 and Mosaic wants multiples of 128)
        pallas_step._TILE_BWD = max(tile, 1024)
        fwd._clear_cache()
        fwd_t._clear_cache()
        bwd._clear_cache()
        t_inf = best(fwd, *args_fwd)
        outs, resid = fwd_t(*args_fwd)
        t_train = best(fwd_t, *args_fwd)
        te, tx, row, xrow = resid[:4]
        lok = resid[4] if L else te
        t_bwd = best(bwd, *args_fwd, te, tx, row, xrow, lok, *cts)
        print(json.dumps({
            "tile": tile, "rays": R, "dispatch_ms": round(base * 1e3, 2),
            "fwd_ms": round((t_inf - base) * 1e3, 2),
            "train_fwd_ms": round((t_train - base) * 1e3, 2),
            "bwd_ms": round((t_bwd - base) * 1e3, 2),
            "fwd_rays_per_s": round(R / (t_inf - base), 1),
            "bwd_rays_per_s": round(R / (t_bwd - base), 1),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
