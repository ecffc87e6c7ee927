"""Benchmark: rays/s/chip across the reference example configs.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N,
   "fwd_rays_per_s": N, "configs": {...}, ...}

The headline value stays CornellBox 1080x1080 forward+backward rays/s per
chip ("rays" = primary paths, one per pixel-sample, matching the reference's
unit of work — /root/reference/src/sampler.rs:28-78; each path carries
bounce+1 closest-hit sweeps plus per-light shadow sweeps). ``configs``
reports forward AND forward+backward throughput for every BASELINE.json
config (Default/dof/CornellBox/CornellBox2/Mesh) plus the two known-cliff
scene classes — Instance.json (1000 spheres: wide attribute tables) and
Minecraft.json (instanced textured boxes: small-chunk dispatch) — so
scene-class cliffs, including training-path fallbacks, are visible to the
driver.

``util_pct`` (per config) is an honest utilization number replacing the
old ``roofline_pct`` (XLA's byte-count cost analysis cannot see inside a
Pallas megakernel's VMEM-resident work, so its "roofline" was
meaningless):

    util_pct = (model_flops / measured_vpu_peak) / per_sample_seconds

where ``model_flops`` is XLA's own flop count of the DENSE jnp reference
pipeline for one sample (the semantic work the renderer must do — every
primitive row intersected per bounce plus shading; XLA sees all of it
because that path uses no custom kernels), and ``measured_vpu_peak`` is a
fused-multiply-add microbenchmark run on the same chip at bench time
(slope between two unroll depths, so HBM traffic and dispatch cancel).
A kernel that CULLS work the dense model counts (triangle candidate
lists, dead-lane skips) can exceed 100% — that is speedup over the dense
formulation, reported as such; the number is "effective utilization
against dense semantic work", the same convention FlashAttention-style
"effective TFLOPs" reporting uses.

Measures the *production* dispatch shape: fused per-pixel samples in one
device call via ``fori_loop`` (the Renderer's execute_many path) with the
production RNG (``rng.make_key``). Per-sample time is the interleaved
hi/lo slope (see ``_slope``) so the remote tunnel's per-call constant
cancels; the fixed dispatch cost is also measured and reported.

The reference publishes no numbers (BASELINE.md); vs_baseline is against an
estimated 2e6 paths/s for the Rust renderer on its default 24-thread pool.
"""

import json
import os
import time

os.environ.setdefault("MRT_NO_COMPILE_CACHE", "0")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_S = 2.0e6  # estimated Rust reference, 24 CPU threads
SAMPLES_FWD = 64   # forward calls amortize dispatch like production renders
SAMPLES_BWD = 64   # per-sample grads accumulate in-loop: residency is one
                   # sample's residuals regardless of the fused count
SAMPLES_BWD_AUX = 16  # non-headline configs: fewer fused samples, same slope

EXAMPLES = "/root/reference/example"
# CornellBox (the headline) is measured FIRST: compiling/running other
# configs beforehand perturbs HBM buffer placement enough to inflate the
# headline's per-sample time ~10% (measured: fwdbwd slope 4.02 ms/sample
# when first vs 4.37 ms after Default+dof). The JSON reports configs in
# canonical order regardless.
CONFIGS = ["CornellBox", "Default", "dof", "CornellBox2", "Mesh",
           "Instance", "Minecraft"]
REPORT_ORDER = ["Default", "dof", "CornellBox", "CornellBox2", "Mesh",
                "Instance", "Minecraft"]
if os.environ.get("MRT_BENCH_CONFIGS"):  # dev subset, e.g. "CornellBox"
    CONFIGS = [c for c in CONFIGS
               if c in os.environ["MRT_BENCH_CONFIGS"].split(",")]
SKIP_UTIL = os.environ.get("MRT_BENCH_UTIL", "1") != "1"


def _load(name):
    from micro_raytracer_tpu.models import schema

    with open(f"{EXAMPLES}/{name}.json") as f:
        cfg = schema.RenderConfig.from_json(json.load(f))
    if name == "CornellBox":
        cfg.frame.res = (1080, 1080)
        cfg.frame.ssaa = 1.0
    return cfg


def _coords(chunk, render_wh):
    # production ray layout: a middle slice of the Morton-ordered frame
    # (the Renderer's chunking), so kernel ray tiles are compact pixel
    # blocks, not 512x1 strips; middle rather than edge because edge
    # regions can be all-sky (black) in some scenes
    from micro_raytracer_tpu.models.render import morton_ray_order

    nw, nh = render_wh
    order = morton_ray_order(nw, nh)
    start = max(0, (nw * nh - chunk) // 2)
    pix = order[start:start + chunk]
    if pix.shape[0] < chunk:
        pix = np.concatenate([pix, np.zeros(chunk - pix.shape[0], np.int64)])
    ys, xs = np.divmod(pix, nw)
    return jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))


def _time_once(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    # ONE-SCALAR fetch forces a real sync even where block_until_ready
    # is a no-op (experimental PJRT plugins). Slice on device first — a
    # full-leaf device_get would time the tunnel's transfer bandwidth,
    # not the device.
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))
    return time.perf_counter() - t0


def _slope(fn_hi, fn_lo, s_hi, s_lo, *args, pairs=7):
    """Marginal per-unit-of-work seconds between two fused counts.

    Device-side per-sample time is flat in the fused count (profiler: the
    kernel span is identical at S=8 and S=64), but the tunnel's per-call
    constant varies tens of ms BETWEEN measurement loops, so neither a
    single overhead-subtracted call nor a difference of two separately
    taken minima is stable. Interleave hi/lo calls so each difference
    pairs adjacent draws of the same tunnel state, then take the median
    pair — robust to slow drift and to outliers in either direction."""
    jax.block_until_ready(fn_hi(*args))
    jax.block_until_ready(fn_lo(*args))
    diffs = []
    for _ in range(pairs):
        t_hi = _time_once(fn_hi, *args)
        t_lo = _time_once(fn_lo, *args)
        diffs.append(t_hi - t_lo)
    diffs.sort()
    med = diffs[len(diffs) // 2] if pairs % 2 else 0.5 * (
        diffs[pairs // 2 - 1] + diffs[pairs // 2])
    return med / (s_hi - s_lo), min(_ for _ in diffs) / (s_hi - s_lo)


def _dispatch_overhead():
    """Fixed cost of one jitted dispatch+sync through the runtime.

    On tunneled PJRT plugins this is tens of ms and would otherwise be
    attributed to the kernel; measured with a trivial one-op program.
    """
    x = jax.block_until_ready(jnp.ones((8,), jnp.float32))
    f = jax.jit(lambda v: v * 1.0000001)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = f(x)
        np.asarray(jax.device_get(out[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _vpu_peak():
    """Measured elementwise FMA peak (flops/s) of this chip.

    One fused kernel applies U chained ``y*a+b`` updates to a 16M-element
    f32 block (arithmetic intensity ~U/4 flops/byte — compute-bound well
    before U=128). The U_HI vs U_LO slope cancels the HBM read/write and
    the dispatch constant, leaving pure ALU time for 2*(U_HI-U_LO)*N
    flops."""
    N = 32 * 1024 * 1024
    x = jax.block_until_ready(jnp.full((N,), 0.5, jnp.float32))

    def chain(u, k=16):
        # k independent accumulator chains: one serial y=y*a+b chain is
        # FMA-LATENCY bound (measured 0.64 TFLOP/s vs 4.0 with k=16)
        def f(v):
            accs = [v * (1.0 + 0.001 * i) for i in range(k)]
            for _ in range(u // k):
                for j in range(k):
                    accs[j] = accs[j] * 1.0000001 + 1e-7
            out = accs[0]
            for j in range(1, k):
                out = out + accs[j]
            return out
        return jax.jit(f)

    # the hi-lo ALU delta must dwarf the tunnel's tens-of-ms jitter or
    # the slope is noise: 2*1280*32Mi = 86 GFLOP ~ 20+ ms of pure FMA
    U_HI, U_LO = 1536, 256
    f_hi, f_lo = chain(U_HI), chain(U_LO)
    for pairs in (5, 7):  # retry once if tunnel noise flips the slope
        per_u, _ = _slope(f_hi, f_lo, U_HI, U_LO, x, pairs=pairs)
        if per_u > 0:
            return 2.0 * N / per_u
    return None


def _model_flops(scene, cam, render_wh, bounce, loss, coords, key):
    """XLA's flop count of ONE dense-reference sample (no custom kernels:
    every primitive row intersected per bounce + shading, the semantic
    work). Returns flops or None if lowering fails."""
    from micro_raytracer_tpu.models.tracer import trace_radiance

    env = {"MRT_STEP": "0", "MRT_HIT3": "0", "MRT_TRI_PALLAS": "0",
           "MRT_TRI_MXU": "0"}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        def one(scene, coords, key):
            return trace_radiance(scene, cam, render_wh, bounce, loss,
                                  coords, key, inference=True)

        cost = (jax.jit(one).lower(scene, coords, key).compile()
                .cost_analysis())
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
    from micro_raytracer_tpu.models.render import _pick_chunk
    from micro_raytracer_tpu.models.tracer import trace_radiance
    from micro_raytracer_tpu.ops import rng
    from micro_raytracer_tpu.parallel import shard
    from micro_raytracer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    key = rng.make_key(0)
    overhead = _dispatch_overhead()
    peak = None if SKIP_UTIL else _vpu_peak()
    per_config = {}
    headline = {}

    for name in CONFIGS:
        cfg = _load(name)
        scene = compile_scene(cfg.scene)
        cam = compile_camera(cfg.frame.cam)
        render_wh = cfg.frame.render_res
        bounce = cfg.rt.bounce
        loss = jnp.float32(cfg.rt.loss)
        chunk = _pick_chunk(render_wh[0] * render_wh[1], scene)
        coords = _coords(chunk, render_wh)
        is_head = name == "CornellBox"

        def fwd_n(S):
            def f(scene, coords, key, _S=S):
                def body(i, acc):
                    rad = trace_radiance(scene, cam, render_wh, bounce,
                                         loss, coords,
                                         jax.random.fold_in(key, i),
                                         inference=True)
                    return acc + rad

                return jax.lax.fori_loop(0, _S, body,
                                         jnp.zeros((chunk, 3), jnp.float32))
            return jax.jit(f)

        S_LO = max(1, SAMPLES_FWD // 4)
        fwd_j = fwd_n(SAMPLES_FWD)
        fwd_raw = _time_once(fwd_j, scene, coords, key)
        per_s, _ = _slope(fwd_j, fwd_n(S_LO), SAMPLES_FWD, S_LO,
                          scene, coords, key, pairs=5)
        rays = chunk / per_s if per_s > 0 else None
        entry = {"fwd_rays_per_s": round(rays, 1) if rays else None,
                 "chunk": chunk, "bounce": bounce,
                 "n_prims": scene.n_prims,
                 "raw_call_ms": round(fwd_raw * 1e3, 1)}

        # forward+backward: grads w.r.t. every trainable scene leaf, per-
        # sample grads summed in-loop (identical gradients to
        # differentiating the summed loss — tools/gradshape_check.py —
        # but only ONE sample's trace residuals are ever live)
        params, _ = shard.split_params(scene)
        S_B = SAMPLES_BWD if is_head else SAMPLES_BWD_AUX

        def fwdbwd_n(S):
            def f(params, coords, key, _S=S):
                def sample_grad(i):
                    def loss_fn(p):
                        s = shard.merge_params(scene, p)
                        rad = trace_radiance(s, cam, render_wh, bounce,
                                             loss, coords,
                                             jax.random.fold_in(key, i))
                        return jnp.mean(rad ** 2)

                    return jax.grad(loss_fn)(params)

                zero = jax.tree_util.tree_map(jnp.zeros_like, params)

                def body(i, acc):
                    return jax.tree_util.tree_map(jnp.add, acc,
                                                  sample_grad(i))

                return jax.lax.fori_loop(0, _S, body, zero)
            return jax.jit(f)

        B_LO = max(1, S_B // 4)
        fwdbwd_j = fwdbwd_n(S_B)
        bwd_raw = _time_once(fwdbwd_j, params, coords, key)
        per_s_b, _ = _slope(fwdbwd_j, fwdbwd_n(B_LO), S_B, B_LO,
                            params, coords, key,
                            pairs=9 if is_head else 5)
        rays_b = chunk / per_s_b if per_s_b > 0 else None
        entry["fwdbwd_rays_per_s"] = round(rays_b, 1) if rays_b else None
        entry["fwdbwd_raw_call_ms"] = round(bwd_raw * 1e3, 1)

        if peak and per_s > 0:
            mf = _model_flops(scene, cam, render_wh, bounce, loss, coords,
                              key)
            if mf:
                entry["util_pct"] = round(100.0 * (mf / peak) / per_s, 1)
                entry["model_gflops_per_sample"] = round(mf / 1e9, 2)

        per_config[name] = entry
        if is_head:
            headline["fwd_rays_per_s"] = entry["fwd_rays_per_s"]
            headline["fwdbwd_rays_per_s"] = entry["fwdbwd_rays_per_s"]
            headline["util_pct"] = entry.get("util_pct")

    if not headline:  # dev subset without CornellBox: first config stands in
        headline = dict(per_config[CONFIGS[0]])
    value = headline["fwdbwd_rays_per_s"]
    print(json.dumps({
        "metric": "cornellbox_1080_rays_per_s_per_chip_fwdbwd",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_S, 3),
        "fwd_rays_per_s": headline["fwd_rays_per_s"],
        "util_pct": headline.get("util_pct"),
        "vpu_peak_gflops": round(peak / 1e9, 1) if peak else None,
        "configs": {k: per_config[k] for k in REPORT_ORDER
                    if k in per_config},
        "dispatch_overhead_ms": round(overhead * 1e3, 2),
        "samples_per_call": {"fwd": SAMPLES_FWD, "bwd": SAMPLES_BWD,
                             "bwd_aux": SAMPLES_BWD_AUX},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
