"""Benchmark: CornellBox 1080x1080 rays/s/chip, forward+backward.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}

"rays" counts primary paths (pixel-samples); each path additionally carries
`bounce+1` closest-hit sweeps and per-light shadow sweeps, matching how the
reference's per-sample wall time is defined (one path per pixel per sample,
/root/reference/src/sampler.rs:28-78).

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against an estimated throughput of the Rust renderer on its default 24-thread
pool for the same scene class (~2e6 paths/s — scalar Rust path tracing at
~80k paths/s/thread), recorded in BASELINE.md as the comparison anchor.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_S = 2.0e6  # estimated Rust reference, 24 CPU threads


def main():
    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.parallel import shard

    path = "/root/reference/example/CornellBox.json"
    with open(path) as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    cfg.frame.res = (1080, 1080)
    cfg.frame.ssaa = 1.0

    scene = compile_scene(cfg.scene)
    cam = compile_camera(cfg.frame.cam)
    render_wh = cfg.frame.render_res
    bounce = cfg.rt.bounce
    loss = jnp.float32(cfg.rt.loss)
    key = jax.random.PRNGKey(0)

    chunk = 1 << 16
    n_pix = render_wh[0] * render_wh[1]
    ys, xs = np.divmod(np.arange(chunk, dtype=np.int64), render_wh[0])
    coords = jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))

    # ---- forward throughput ----
    @jax.jit
    def fwd(scene, coords, key):
        return trace_radiance(scene, cam, render_wh, bounce, loss, coords, key)

    fwd(scene, coords, key).block_until_ready()  # compile
    n_iters = max(2, (n_pix // chunk) // 4)
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fwd(scene, coords, jax.random.fold_in(key, i))
    out.block_until_ready()
    fwd_s = (time.perf_counter() - t0) / n_iters
    fwd_rays = chunk / fwd_s

    # ---- forward+backward throughput ----
    params, _ = shard.split_params(scene)

    @jax.jit
    def fwdbwd(params, coords, key):
        def loss_fn(p):
            s = shard.merge_params(scene, p)
            rad = trace_radiance(s, cam, render_wh, bounce, loss, coords, key,
                                 remat=True)
            return jnp.mean(rad ** 2)

        return jax.grad(loss_fn)(params)

    g = fwdbwd(params, coords, key)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for i in range(n_iters):
        g = fwdbwd(params, coords, jax.random.fold_in(key, i))
    jax.block_until_ready(g)
    bwd_s = (time.perf_counter() - t0) / n_iters
    fwdbwd_rays = chunk / bwd_s

    value = fwdbwd_rays
    print(json.dumps({
        "metric": "cornellbox_1080_rays_per_s_per_chip_fwdbwd",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
        "fwd_rays_per_s": round(fwd_rays, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
