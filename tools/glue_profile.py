"""Where does the production sample time go OUTSIDE the step kernels?

Times, per 131k-ray sample on the real device (loop-amortized over K
iterations inside one dispatch, dispatch cost subtracted):
  - u8s: the bounce uniforms (steps x (R,7)+(R,)) via the production RNG
  - camera: primary-ray generation incl. the aperture uniforms
  - pack: build_frames + prim_attributes + pack_step (scene lowering)
  - trace_inf / trace_grad: full trace_radiance fwd / fwd+bwd
    (the bench body), for end-to-end comparison

Usage: python tools/glue_profile.py [--scene CornellBox] [--rays 131072]
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
    p.add_argument("--rays", type=int, default=131072)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import (compile_camera,
                                                     compile_scene)
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.ops import intersect, pallas_step, rng
    from micro_raytracer_tpu.parallel import shard

    with open(f"{EXAMPLES}/{args.scene}.json") as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    if args.scene == "CornellBox":
        cfg.frame.res = (1080, 1080)
        cfg.frame.ssaa = 1.0
    scene = compile_scene(cfg.scene)
    cam = compile_camera(cfg.frame.cam)
    render_wh = cfg.frame.render_res
    bounce = cfg.rt.bounce
    loss = jnp.float32(cfg.rt.loss)
    R = args.rays
    K = args.iters
    steps = bounce + 1
    key = rng.make_key(0)
    coords = jnp.stack([jnp.arange(R, dtype=jnp.float32) % render_wh[0],
                        jnp.arange(R, dtype=jnp.float32) / render_wh[0]], -1)

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

    tiny = jax.jit(lambda x: x + 1.0)
    base = best(tiny, jnp.zeros((8, 128), jnp.float32))
    out = {"scene": args.scene, "rays": R, "steps": steps,
           "dispatch_ms": round(base * 1e3, 2)}

    def loop(body):
        def run(key):
            def it(i, acc):
                return acc + body(jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, K, it, jnp.zeros((), jnp.float32))
        return jax.jit(run)

    # 1. bounce uniforms exactly as trace_fused draws them
    def u8s_body(k):
        k_t, k_s = jax.random.split(k, 2)
        tot = jnp.zeros((), jnp.float32)
        for i in range(steps):
            u = rng.uniform(jax.random.fold_in(k_t, i), (R, 7))
            ue = rng.uniform(jax.random.fold_in(k_s, i), (R,))
            tot = tot + jnp.sum(u[0]) + ue[0]
        return tot
    out["u8s_ms"] = round((best(loop(u8s_body), key) - base) / K * 1e3, 3)

    # 2. camera raygen
    from micro_raytracer_tpu.models import camera as camera_mod

    def cam_body(k):
        u_aprt = rng.uniform(k, (R, 2))
        o, d = camera_mod.gen_rays(cam, render_wh, coords, u_aprt)
        return jnp.sum(o[0]) + jnp.sum(d[0])
    out["camera_ms"] = round((best(loop(cam_body), key) - base) / K * 1e3, 3)

    # 3. scene lowering (frames/attrs/pack_step); loop-carried dependence on
    # a scalar so XLA cannot hoist it
    def pack_body(k):
        import dataclasses
        eps = jax.random.uniform(k, ()) * 0.0
        s2 = dataclasses.replace(scene, inst_pos=scene.inst_pos + eps)
        frames = intersect.build_frames(s2)
        tri_pack = None
        if scene.kind_counts[schema.KIND_TRIANGLE]:
            tri_pack = intersect.triangle_pack(s2, frames)
        consts, attr, _gattr, _attr2, lights, _ = pallas_step.pack_step(
            s2, frames, tri_pack)
        return jnp.sum(attr[0]) + jnp.sum(consts[0][0])
    out["pack_ms"] = round((best(loop(pack_body), key) - base) / K * 1e3, 3)

    # 4. full forward sample
    def inf_body(k):
        rad = trace_radiance(scene, cam, render_wh, bounce, loss, coords, k,
                             inference=True)
        return jnp.sum(rad[0])
    out["trace_inf_ms"] = round((best(loop(inf_body), key) - base) / K * 1e3,
                                3)

    # 5. full fwd+bwd sample
    params, _ = shard.split_params(scene)

    def grad_body(k):
        def loss_fn(p):
            s = shard.merge_params(scene, p)
            rad = trace_radiance(s, cam, render_wh, bounce, loss, coords, k)
            return jnp.mean(rad ** 2)
        g = jax.grad(loss_fn)(params)
        return g["mat_albedo"][0, 0]
    out["trace_grad_ms"] = round((best(loop(grad_body), key) - base) / K * 1e3,
                                 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
