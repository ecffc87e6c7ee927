"""Vector-op census of the backward replay: hand vs machine transpose.

Counts jaxpr equations (weighted by rough VPU cost class) of
`_step_comp_bwd` and of `jax.vjp(_step_comp)` at component-block shapes
for a given example scene's layout. Every eqn is one vector op per 8
sublanes at kernel width, so eqn count tracks backward-kernel time far
better than wall-clock probes through the tunnel.

Usage: python tools/bwd_opcount.py [--scene CornellBox]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLES = "/root/reference/example"

CHEAP = {"add", "sub", "mul", "max", "min", "and", "or", "not", "xor",
         "select_n", "neg", "abs", "lt", "le", "gt", "ge", "eq", "ne",
         "convert_element_type", "sign", "floor", "ceil", "round",
         "is_finite", "clamp"}
MED = {"div", "rsqrt", "sqrt"}
EXPENSIVE = {"sin", "cos", "tan", "exp", "log", "atan2", "pow",
             "integer_pow"}
FREE = {"broadcast_in_dim", "reshape", "squeeze", "transpose", "copy",
        "stop_gradient", "slice", "concatenate", "iota", "pjit",
        "custom_vjp_call", "custom_jvp_call", "closed_call"}


def census(jaxpr, counts):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                census(v.jaxpr, counts)
            elif hasattr(v, "eqns"):
                census(v, counts)
        if name in FREE:
            continue
        if name in EXPENSIVE:
            counts["expensive"] += 1
        elif name in MED:
            counts["med"] += 1
        else:
            counts["cheap"] += 1
    return counts


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="CornellBox")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from micro_raytracer_tpu.models import schema
    from micro_raytracer_tpu.models.compiler import compile_scene
    from micro_raytracer_tpu.ops import pallas_step as ps

    with open(f"{EXAMPLES}/{args.scene}.json") as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    scene = compile_scene(cfg.scene)
    layout = ps._seg_layout(scene.kind_counts)
    need_exit = scene.any_refract
    L = scene.n_lights
    n_tri = layout[2]
    kinds = sorted(k for k, _s, _c in layout[0])
    print(f"# scene={args.scene} kinds={kinds} n_tri={n_tri} "
          f"need_exit={need_exit} L={L}")

    W = (8, 128)
    rngn = np.random.default_rng(0)
    blk = lambda: jnp.asarray(rngn.uniform(0.1, 0.9, W), jnp.float32)
    v3 = lambda: (blk(), blk(), blk())
    NC = 24 + (8 if scene.has_maps else 0)
    p_in = {"o": v3(), "d": v3(), "pwr": blk(), "A": v3(), "B": v3(),
            "dk": blk(),
            "lr": [[blk() for _ in range(11)] for _ in range(L)],
            "atE": tuple(blk() for _ in range(NC))}
    if need_exit:
        p_in["atX"] = tuple(blk() for _ in range(NC))
    if n_tri:
        p_in["g3e"], p_in["h3e"] = v3(), blk()
        if need_exit:
            p_in["g3x"], p_in["h3x"] = v3(), blk()
    u = [blk() for _ in range(8)]
    live = blk() > 0.3
    te_sv, tx_sv = blk(), blk()
    rowv = jnp.asarray(
        rngn.integers(0, scene.n_prims, W).astype(np.float32))
    lok = [blk() > 0.5 for _ in range(L)]
    cts = (v3(), v3(), blk(), v3(), v3())

    same_row = need_exit and n_tri == 0

    def hand(p_in, cts):
        if same_row:
            p2 = {k: v for k, v in p_in.items() if k != "atX"}
            return ps._step_comp_bwd_same(layout, L, p2, u, live, te_sv,
                                          tx_sv, rowv, live, lok, cts)
        return ps._step_comp_bwd(layout, need_exit, L, p_in, u, live,
                                 te_sv, tx_sv, rowv, rowv, lok, cts)

    def machine(p_in, cts):
        if same_row:
            p_in = {k: v for k, v in p_in.items() if k != "atX"}
        primal = partial(ps._step_comp, layout, need_exit, L,
                         u=u, live=live, te_sv=te_sv, tx_sv=tx_sv,
                         row=rowv, xrow=rowv, lok=lok, same_row=same_row,
                         choose_sv=live if same_row else None)
        _, vjp = jax.vjp(lambda pp: primal(pp)[:5], p_in)
        return vjp(cts)[0]

    for name, f in (("hand", hand), ("machine", machine)):
        jx = jax.make_jaxpr(f)(p_in, cts)
        c = census(jx.jaxpr, {"cheap": 0, "med": 0, "expensive": 0})
        weighted = c["cheap"] + 2 * c["med"] + 8 * c["expensive"]
        print(json.dumps({"which": name, **c, "weighted": weighted}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
