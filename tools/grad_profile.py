"""Capture a device trace of the training (grad) scan and print the
per-op time breakdown, so glue outside the two megakernels is visible.

Usage: python tools/grad_profile.py [--scene CornellBox] [--steps 16]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = "/root/reference/example"


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="CornellBox")
    p.add_argument("--rays", type=int, default=131072)
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--top", type=int, default=30)
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

    R, K = args.rays, args.steps
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    oT = jax.random.normal(ks[0], (3, R), jnp.float32)
    dT_ = jax.random.normal(ks[1], (3, R), jnp.float32)
    dT_ = dT_ / jnp.linalg.norm(dT_, axis=0, keepdims=True)
    pwrT = jnp.ones((1, R), jnp.float32)
    liveT = jnp.ones((1, R), jnp.float32)
    A_T = jnp.ones((3, R), jnp.float32)
    B_T = jnp.zeros((3, R), jnp.float32)
    u8s = jax.random.uniform(ks[2], (K, 8, R), jnp.float32)
    dk = jnp.float32(0.85)

    fn = pallas_step._get_step_fn(layout, need_exit, L)

    def run_grad(attr_in):
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

    f = jax.jit(run_grad)
    out = f(attr)
    np.asarray(jax.device_get(out[0, 0]))

    tmp = tempfile.mkdtemp(prefix="mrt_trace_")
    jax.profiler.start_trace(tmp)
    out = f(attr)
    np.asarray(jax.device_get(out[0, 0]))
    jax.profiler.stop_trace()

    files = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace produced", file=sys.stderr)
        return 1
    with gzip.open(files[0], "rt") as fh:
        tr = json.load(fh)
    # device-side complete events, grouped by name
    tot = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    for ev in tr.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        tot[ev["name"]] += ev.get("dur", 0) / 1e3
        cnt[ev["name"]] += 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:args.top]
    total = sum(tot.values())
    print(f"pids: { {p: pid_names.get(p, '?') for p in dev_pids} }")
    print(f"{'ms':>9} {'n':>5}  name   (sum {total:.1f} ms)")
    for name, ms in rows:
        print(f"{ms:9.3f} {cnt[name]:5d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
