"""Inverse rendering demo: recover scene parameters from a target image.

Showcases the framework's differentiable core end-to-end: render a target
with known materials, perturb them, and gradient-descend the L2 image loss
back to the truth — per-pixel radiance differentiated w.r.t. material
albedo/roughness, light power, and sky through the full bounce scan
(trace_radiance with rematerialization).

Usage:
  python tools/invert_render.py [--steps 60] [--platform cpu|env]
Prints a JSON line per optimization step and a final summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lr", type=float, default=0.5)
    p.add_argument("--res", type=int, default=48)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--platform", default="env", choices=("cpu", "env"))
    args = p.parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
    from micro_raytracer_tpu.models.tracer import trace_radiance

    scene_json = {
        "renderer": [
            {"type": "sphere", "r": 0.5,
             "mat": {"albedo": [0.9, 0.3, 0.2], "rough": 0.8}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.5],
             "mat": {"albedo": [0.3, 0.5, 0.9], "rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [-0.6, -1, 0.6], "pwr": 0.6}],
        "sky": {"color": [0.1, 0.1, 0.15], "pwr": 0.5},
    }
    cfg = schema.RenderConfig.from_json({"scene": scene_json})
    truth = compile_scene(cfg.scene)
    cam = compile_camera(cfg.frame.cam)
    wh = (args.res, args.res)
    bounce, loss_cfg = 3, jnp.float32(0.15)

    n_pix = args.res * args.res
    ys, xs = np.divmod(np.arange(n_pix, dtype=np.int64), args.res)
    coords = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def render(scene, key, spp):
        def body(i, acc):
            return acc + trace_radiance(scene, cam, wh, bounce, loss_cfg,
                                        coords, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, spp, body,
                                 jnp.zeros((n_pix, 3), jnp.float32)) / spp

    target = jax.jit(lambda k: render(truth, k, 64))(key)

    # perturb: wrong albedos + light power
    init = {
        "mat_albedo": jnp.full_like(truth.mat_albedo, 0.5),
        "light_pwr": truth.light_pwr * 0.3,
    }

    @jax.jit
    def step(params, k):
        def loss_fn(p):
            s = dataclasses.replace(truth, **p)
            img = render(s, k, args.spp)
            return jnp.mean((img - target) ** 2)

        l, g = jax.value_and_grad(loss_fn)(params)
        new = jax.tree_util.tree_map(
            lambda x, gx: jnp.clip(x - args.lr * gx, 0.0, 2.0), params, g)
        return l, new

    params = init
    for i in range(args.steps):
        l, params = step(params, jax.random.fold_in(key, 1000 + i))
        if i % 10 == 0 or i == args.steps - 1:
            print(json.dumps({"step": i, "loss": round(float(l), 6)}))

    err_albedo = float(jnp.abs(params["mat_albedo"] - truth.mat_albedo).mean())
    err_pwr = float(jnp.abs(params["light_pwr"] - truth.light_pwr).mean())
    out = {"final_albedo_err": round(err_albedo, 4),
           "final_light_pwr_err": round(err_pwr, 4),
           "recovered": bool(err_albedo < 0.15 and err_pwr < 0.15)}
    print(json.dumps(out))
    return 0 if out["recovered"] else 1


if __name__ == "__main__":
    sys.exit(main())
