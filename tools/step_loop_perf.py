"""Loop-amortized microbench for the bounce-step megakernel paths.

One jitted dispatch runs K chained steps (scan), so per-step device time
is visible above the ~30-40 ms tunnel dispatch cost. Times:
  - inference forward step (the render path)
  - train forward step (residual-emitting variant)
  - backward megakernel step
  - full fwd+bwd of a bounce+1 scan via jax.grad (the production shape)

Usage: python tools/step_loop_perf.py [--scene CornellBox] [--rays 131072]
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
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args(argv)

    import jax
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
    print(json.dumps({"scene": args.scene, "P_pad": int(consts[5].shape[0]),
                      "need_exit": bool(need_exit), "L": int(L)}))

    R = args.rays
    K = args.steps
    rk = jax.random.PRNGKey(0)
    ks = jax.random.split(rk, 8)
    oT = jax.random.normal(ks[0], (3, R), jnp.float32)
    dT_ = jax.random.normal(ks[1], (3, R), jnp.float32)
    dT_ = dT_ / jnp.linalg.norm(dT_, axis=0, keepdims=True)
    pwrT = jnp.ones((1, R), jnp.float32)
    liveT = jnp.ones((1, R), jnp.float32)
    A_T = jnp.ones((3, R), jnp.float32)
    B_T = jnp.zeros((3, R), jnp.float32)
    u8s = jax.random.uniform(ks[2], (K, 8, R), jnp.float32)
    dk = jnp.float32(0.85)

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

    def scan_fwd(train):
        def run(oT, dT_, pwrT, liveT, A_T, B_T, u8s):
            def body(c, u8):
                o, d, pw, lv, A, B = c
                out = pallas_step._call_step(
                    layout, need_exit, L, consts, attr, lights, dk,
                    o, d, pw, lv, A, B, u8, train=train)
                if train:
                    (o2, d2, pw2, lv2, A2, B2), _res = out
                else:
                    o2, d2, pw2, lv2, A2, B2 = out
                return (o2, d2, pw2, lv2, A2, B2), None
            c, _ = jax.lax.scan(body, (oT, dT_, pwrT, liveT, A_T, B_T), u8s)
            return c[4]
        return jax.jit(run)

    t_inf = best(scan_fwd(False), oT, dT_, pwrT, liveT, A_T, B_T, u8s)
    t_trn = best(scan_fwd(True), oT, dT_, pwrT, liveT, A_T, B_T, u8s)

    # backward kernel chained: carry the 5 cotangent rows
    outs, resid = jax.jit(lambda *a: pallas_step._call_step(
        layout, need_exit, L, consts, attr, lights, dk, *a,
        train=True))(oT, dT_, pwrT, liveT, A_T, B_T, u8s[0])
    te, tx, row, xrow = resid[:4]
    lok = resid[4] if L else te

    def run_bwd(oT, dT_, pwrT, liveT, A_T, B_T, te, tx, row, xrow, lok,
                cto, ctd, ctp, ctA, ctB, u8s):
        res_lane = (oT, dT_, pwrT, liveT, A_T, B_T, u8s[0], te, tx, row,
                    xrow, lok)

        def body(c, u8):
            cto, ctd, ctp, ctA, ctB = c
            g = pallas_step._call_step_bwd(
                layout, need_exit, L, consts[6], consts[7], attr, lights,
                dk, res_lane, (cto, ctd, ctp, ctA, ctB))
            return (g[3], g[4], g[5], g[6], g[7]), None

        c, _ = jax.lax.scan(body, (cto, ctd, ctp, ctA, ctB), u8s)
        return c[0]

    cts = (jnp.ones_like(oT), jnp.ones_like(dT_), jnp.ones_like(pwrT),
           jnp.ones_like(A_T), jnp.ones_like(B_T))
    t_bwd = best(jax.jit(run_bwd), oT, dT_, pwrT, liveT, A_T, B_T,
                 te, tx, row, xrow, lok, *cts, u8s)

    # production fwd+bwd: grad through a K-step scan w.r.t. attr
    def run_grad(attr_in, oT, dT_, pwrT, liveT, A_T, B_T, u8s):
        fn = pallas_step._get_step_fn(layout, need_exit, L)

        def loss(attr_p):
            def body(c, u8):
                o, d, pw, lv, A, B = c
                o2, d2, pw2, lv2, A2, B2 = fn(
                    consts, attr_p, lights, dk, o, d, pw, lv, A, B, u8)
                return (o2, d2, pw2, lv2, A2, B2), None
            c, _ = jax.lax.scan(body, (oT, dT_, pwrT, liveT, A_T, B_T),
                                u8s)
            return jnp.mean(c[5] ** 2)

        return jax.grad(loss)(attr_in)

    t_grad = best(jax.jit(run_grad), attr, oT, dT_, pwrT, liveT, A_T, B_T,
                  u8s)

    def per_step(t):
        return (t - base) / K * 1e3

    print(json.dumps({
        "rays": R, "steps": K, "dispatch_ms": round(base * 1e3, 2),
        "fwd_step_ms": round(per_step(t_inf), 3),
        "train_fwd_step_ms": round(per_step(t_trn), 3),
        "bwd_step_ms": round(per_step(t_bwd), 3),
        "grad_total_step_ms": round(per_step(t_grad), 3),
        "fwd_steps_per_s": round(R * K / (t_inf - base), 1),
        "grad_rays_per_s_at_b8": round(R * K / (t_grad - base) / 9.0, 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
