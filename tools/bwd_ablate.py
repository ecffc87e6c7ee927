"""Ablation timing for the whole-trace backward kernel.

Times one production fwd+bwd call (grad-accumulation shape, few samples)
under the current env, printing per-sample ms. Run it under different env
settings (MRT_STEP_BWD_RT, MRT_BWD_*) to measure what the backward kernel
actually pays for.

Usage: python tools/bwd_ablate.py [--scene CornellBox] [--samples 8]
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
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--lo", type=int, default=2)
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--fwd-only", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
    from micro_raytracer_tpu.models.render import _pick_chunk, morton_ray_order
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.ops import rng
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
    chunk = _pick_chunk(render_wh[0] * render_wh[1], scene)
    nw, nh = render_wh
    order = morton_ray_order(nw, nh)
    start = max(0, (nw * nh - chunk) // 2)
    pix = order[start:start + chunk]
    ys, xs = np.divmod(pix, nw)
    coords = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    key = rng.make_key(0)
    params, _ = shard.split_params(scene)

    def make(S):
        if args.fwd_only:
            def run(params, coords, key):
                def body(i, acc):
                    rad = trace_radiance(scene, cam, render_wh, bounce, loss,
                                         coords, jax.random.fold_in(key, i),
                                         inference=True)
                    return acc + rad

                return jax.lax.fori_loop(0, S, body,
                                         jnp.zeros((chunk, 3), jnp.float32))
        else:
            def run(params, coords, key):
                def sample_grad(i):
                    def loss_fn(pp):
                        s = shard.merge_params(scene, pp)
                        rad = trace_radiance(s, cam, render_wh, bounce, loss,
                                             coords,
                                             jax.random.fold_in(key, i))
                        return jnp.mean(rad ** 2)

                    return jax.grad(loss_fn)(params)

                zero = jax.tree_util.tree_map(jnp.zeros_like, params)

                def body(i, acc):
                    return jax.tree_util.tree_map(jnp.add, acc,
                                                  sample_grad(i))

                return jax.lax.fori_loop(0, S, body, zero)
        return jax.jit(run)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    f_hi, f_lo = make(args.samples), make(args.lo)
    sync(f_hi(params, coords, key))
    sync(f_lo(params, coords, key))
    diffs = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        sync(f_hi(params, coords, key))
        t1 = time.perf_counter()
        sync(f_lo(params, coords, key))
        t2 = time.perf_counter()
        diffs.append((t1 - t0) - (t2 - t1))
    diffs.sort()
    med = diffs[len(diffs) // 2]
    per = med / (args.samples - args.lo)
    env = {k: v for k, v in os.environ.items() if k.startswith("MRT_")}
    print(json.dumps({"scene": args.scene, "chunk": chunk,
                      "ms_per_sample": round(per * 1e3, 3),
                      "rays_per_s": round(chunk / per, 1), "env": env}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
