"""Backward-megakernel check: grads + timing, megakernel vs jnp path.

Validates that the bounce-step megakernel's in-kernel backward (the
component-form residual replay in ops/pallas_step.py) produces the same
gradients as the jnp+pallas_hit3 route for every trainable scene leaf,
then times both fwd+bwd paths at a production chunk. The estimator itself
is the reference's (rt.rs:867-898 composed with rt.rs:966-992); both
routes draw identical RNG streams, so gradients must agree to float
reassociation.

Usage:
  python tools/grad_check.py [--platform cpu|env] [--scene CornellBox]
                             [--chunk 131072] [--samples 4]
Prints JSON lines: one per leaf (max abs/rel diff), one timing summary.

Note on CornellBox's zero leaves (inst_pos/mat_rough/...): with zero
analytic lights and a black sky, radiance is a sum of albedo/emission
products — the fold coefficients (rt.rs:966-992) carry no continuous
dependence on geometry, so position/rotation/rough gradients are
EXACTLY zero in both paths (which object a ray hits is discrete).
Lit-scene coverage for those leaves lives in the CPU suite
(test_pallas_step_grad, point+dir lights) and in --scene Default/dof.
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
    p.add_argument("--platform", default="env", choices=("cpu", "env"))
    p.add_argument("--scene", default="CornellBox")
    p.add_argument("--res", type=int, default=256,
                   help="square render res for the validation pass")
    p.add_argument("--chunk", type=int, default=131072,
                   help="rays per call for the timing pass")
    p.add_argument("--samples", type=int, default=4,
                   help="fused samples per timed call")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--skip-timing", action="store_true")
    p.add_argument("--gate", type=float, default=5e-3,
                   help="worst-leaf relative-diff gate. CornellBox holds "
                        "5e-3 (measured 3e-4); scenes with sphere "
                        "silhouettes in frame (dof) need ~2e-2: grazing "
                        "hits differentiate through ~1/sqrt(disc), so the "
                        "hand-derived winner-t cotangent and the machine "
                        "transpose — algebraically equal, float-"
                        "reassociated — diverge %-level on those lanes "
                        "(round-4 analysis, BASELINE.md)")
    args = p.parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import (compile_camera,
                                                     compile_scene)
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.ops import rng
    from micro_raytracer_tpu.parallel import shard

    with open(f"{EXAMPLES}/{args.scene}.json") as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    scene = compile_scene(cfg.scene)
    cam = compile_camera(cfg.frame.cam)
    bounce = cfg.rt.bounce
    loss = jnp.float32(cfg.rt.loss)
    wh = (args.res, args.res)
    key = rng.make_key(7)

    def grads_fn(n_rays, n_samples):
        # center-frame block: top-of-frame rows can be black in scenes
        # like CornellBox (no analytic lights), zeroing most grad leaves
        # and making the comparison vacuous
        start = max(0, (wh[0] * wh[1] - n_rays) // 2)
        ys, xs = np.divmod(start + np.arange(n_rays, dtype=np.int64), wh[0])
        coords = jnp.asarray(np.stack([xs % wh[0], ys % wh[1]], -1)
                             .astype(np.float32))
        params, _ = shard.split_params(scene)

        def fwdbwd(params):
            def loss_fn(pp):
                s = shard.merge_params(scene, pp)

                def body(i, acc):
                    rad = trace_radiance(s, cam, wh, bounce, loss, coords,
                                         jax.random.fold_in(key, i))
                    return acc + jnp.mean((rad - 0.25) ** 2)

                return jax.lax.fori_loop(0, n_samples, body, 0.0)

            return jax.grad(loss_fn)(params)

        return params, fwdbwd

    def run(env, n_rays, n_samples):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            params, f = grads_fn(n_rays, n_samples)
            jf = jax.jit(f)
            g = jax.block_until_ready(jf(params))
            times = []
            if not args.skip_timing:
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    out = jax.block_until_ready(jf(params))
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
                    times.append(time.perf_counter() - t0)
            return jax.device_get(g), (min(times) if times else None)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    envs = {
        "jnp": {"MRT_STEP": "0"},
        "jnp_record": {"MRT_STEP": "0", "MRT_NO_FUSE": "1"},
        "megakernel": {"MRT_STEP": "" if args.platform == "env" else "1",
                       "MRT_STEP_GRAD": "1"},
    }

    # --- gradient agreement at a small chunk --------------------------------
    n_val = 8192
    g_ref, _ = run(envs["jnp"], n_val, 2)
    # intrinsic noise floor: the record path draws the SAME RNG stream
    # and differs from the fused path only by float reassociation
    # (tracer.trace_radiance docstring). Silhouette-grazing lanes
    # differentiate through ~1/sqrt(disc), so ulp-level reassociation
    # amplifies to %-level leaf shifts on scenes like dof.json — a
    # conditioning property of the estimator, not an implementation
    # error; the kernel gate scales with the measured floor instead of
    # demanding what the jnp path itself cannot reproduce.
    g_flr, _ = run(envs["jnp_record"], n_val, 2)
    g_new, _ = run(envs["megakernel"], n_val, 2)
    worst, floor = 0.0, 0.0
    for k in sorted(g_ref):
        a, b = np.asarray(g_ref[k]), np.asarray(g_new[k])
        f = np.asarray(g_flr[k])
        ad = float(np.max(np.abs(a - b))) if a.size else 0.0
        fd = float(np.max(np.abs(a - f))) if a.size else 0.0
        scale = float(np.max(np.abs(a))) if a.size else 0.0
        rel = ad / (scale + 1e-12)
        frel = fd / (scale + 1e-12)
        if scale > 1e-6:
            worst = max(worst, rel)
            floor = max(floor, frel)
        print(json.dumps({"leaf": k, "max_abs_diff": ad,
                          "ref_scale": scale, "rel": round(rel, 6),
                          "floor_rel": round(frel, 6)}))
    gate = max(args.gate, 4.0 * floor)
    ok = worst < gate
    print(json.dumps({"grad_match": ok, "worst_rel": round(worst, 6),
                      "noise_floor_rel": round(floor, 6),
                      "gate": round(gate, 6)}))

    # --- timing at production chunk ------------------------------------------
    if not args.skip_timing:
        _, t_ref = run(envs["jnp"], args.chunk, args.samples)
        _, t_new = run(envs["megakernel"], args.chunk, args.samples)
        paths = args.chunk * args.samples
        print(json.dumps({
            "chunk": args.chunk, "samples": args.samples,
            "jnp_s": round(t_ref, 4), "megakernel_s": round(t_new, 4),
            "jnp_rays_per_s": round(paths / t_ref, 1),
            "megakernel_rays_per_s": round(paths / t_new, 1),
            "speedup": round(t_ref / t_new, 3),
        }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
