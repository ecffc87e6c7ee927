"""Golden-image comparison against the reference's published renders.

The reference ships no tests; its de-facto goldens are the README command
lines and their published outputs (/root/reference/README.md:16-27,127-157
-> /root/reference/doc/out0-3.png). This tool re-renders those scenes
through the real CLI parsing path and reports downsampled mean-absolute
error against each published image.

RNG differs from the reference (threefry vs thread_rng), so images match in
expectation only: both sides are box-downsampled to wash out sampling noise
before comparison. Published goldens were rendered at 1024 spp; pass
--sample to trade time for noise.

Measured status (256 spp, all pass): out0 MAE 0.01/255, out2 4.1/255,
out3 3.8/255, out4 0.16/255 (residual is sampling noise vs the 1024-spp
published renders).
(An earlier out3 MAE of ~45 was a real TPU-only bug — the one-hot
attribute-fetch matmul ran at default precision, truncating fetched
geometry to bfloat16 and zeroing box normals; fixed with
Precision.HIGHEST in intersect.fetch_attrs. CPU tests could not catch it.)

Usage:
  python tools/golden_check.py [--sample 64] [--scenes out0,out2,out3] [--save DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DOC = "/root/reference/doc"

# README command lines, verbatim argv (README.md:127-157, 16-27).
GOLDENS = {
    "out0": ["--obj", "sphere", "--light", "point:", "-0.5", "-1", "0.5"],
    "out1": ["--obj", "sphere", "--light", "point:", "-0.5", "-1", "0.5",
             "--res", "1920", "1080", "--ssaa", "2"],
    "out2": ("--obj sph r: 0.2 pos: 0.5 0.5 0 albedo: #ffc177 emit: 1.0 "
             "--obj sph r: 0.2 pos: -0.5 0 0 rough: 1 "
             "--obj sph r: 0.2 pos: 0 0.5 0 albedo: #ff0000 "
             "--obj sph r: 0.2 pos: 0.5 0 0 metal: 1 "
             "--obj sph r: 0.2 pos: -0.15 -0.5 0 glass: 0.08 opacity: 0 "
             "--obj pln pos: 0 0 -0.201 rough: 1 "
             "--obj pln n: 0 0 -1 pos: 0 0 1 rough: 1 "
             "--obj pln n: -1 0 0 pos: 1 0 0 albedo: #00ff00 rough: 1 "
             "--obj pln n: 1 0 0 pos: -1 0 0 albedo: #ff0000 rough: 1 "
             "--obj pln n: 0 -1 0 pos: 0 1 0 rough: 1 "
             "--cam pos: 0 -1.2 0.1 fov: 60 gamma: 0.5 exp: 0.75 "
             "--bounce 16").split(),
    "out3": ("--obj sph r: 0.15 pos: 0 0 -0.1 "
             "--obj box size: 0.25 0.25 0.25 pos: 0 0 -0.375 dir: 0 0.5 0.5 0 "
             "--obj box size: 0.3 0.3 0.01 pos: 0 0 0.499 emit: 1 "
             "--obj box size: 1 0.01 1 pos: 0 0.5 0 "
             "--obj box size: 1 1 0.01 pos: 0 0 0.5 "
             "--obj box size: 1 1 0.01 pos: 0 0 -0.5 "
             "--obj box size: 0.01 1 1 pos: -0.5 0 0 albedo: #ff0000 "
             "--obj box size: 0.01 1 1 pos: 0.5 0 0 albedo: #00ff00 "
             "--cam pos: 0 -1.25 0 fov: 60 gamma: 0.6 exp: 0.8 "
             "--ssaa 2 --res 1080 1080").split(),
}


# Published images rendered from shipped example files rather than CLI
# commands: out4 is dof.json (README.md:11 hero image).
GOLDEN_FILES = {
    "out4": "/root/reference/example/dof.json",
}


SELF_GOLDENS = {
    # name -> (scene file, res, MAE gate, bad_frac gate, nocull gate)
    "tri_self": ("/root/reference/example/Mesh.json", (320, 180),
                 3.0, 0.20, 0.05),
    # sphere-segment candidate culling (Instance class, round 5): same
    # conservative-culling invariant as tri_self — cull on/off must
    # agree per-pixel (spheres have no phantom-hit analog, so the gate
    # is tighter than the chaotic cross-implementation bad_frac)
    "sph_self": ("/root/reference/example/Instance.json", (320, 180),
                 3.0, 0.20, 0.01),
}


def run_tri_self(sample: int, save_dir: str | None = None,
                 name: str = "tri_self") -> dict:
    """Triangle-scene self-golden: Mesh.json rendered by the production
    Pallas path vs the dense jnp sweep, SAME device and RNG streams.

    The reference publishes no Mesh render (and no Rust toolchain exists
    here), so the dense path — oracle-validated per-kind — stands in as
    the reference. Identical sampling means the difference is pure
    numerics plus the documented compacted-culling deviation: phantom
    |det| >= E rows whose numeric hit point lies outside the triangle
    are dropped by the candidate-list sweep (~0.7% of silhouette pixels,
    BASELINE.md round 2). The downsampled-MAE gate pins semantic drift;
    ``bad_frac`` (full-res pixels off by > 8/255) additionally tracks
    per-pixel divergence — it includes chaotic path splits from
    ulp-level winner-t differences between the implementations
    (measured ~13% at 32 spp) and is GATED at < 0.20 so silhouette
    regressions can't creep behind the downsampled MAE.

    ``nocull_frac`` isolates the culling deviation from the
    cross-implementation chaos: the production path rendered with and
    without candidate-block culling (``MRT_TRI_NOCULL=1``) differs ONLY
    on paths that touched a dropped phantom — identical RNG, identical
    kernel otherwise. Historically ~sub-1% of pixels; gated at < 0.05.
    """
    import os as _os

    from micro_raytracer_tpu.frontends import cli
    from micro_raytracer_tpu.models.render import render_image

    scene_file, (rw, rh), _mg, _bg, _ng = SELF_GOLDENS[name]

    def render(env):
        saved = {k: _os.environ.get(k) for k in env}
        _os.environ.update(env)
        try:
            # the MRT_* knobs are trace-time constants: without clearing
            # the in-process jit cache, an env flip between renders of
            # IDENTICAL shapes silently reuses the cached program and the
            # comparison is the same image against itself (reviewed
            # round 5 — nocull_frac measured a structural 0.0)
            import jax as _jax

            _jax.clear_caches()
            cfg = cli.parse_render(cli.build_parser().parse_args(
                [scene_file, "--res", str(rw), str(rh)]))
            cfg.rt.sample = sample
            return render_image(cfg).astype(np.float32)
        finally:
            for k, v in saved.items():
                if v is None:
                    _os.environ.pop(k, None)
                else:
                    _os.environ[k] = v

    ours = render({})
    nocull = render({"MRT_TRI_NOCULL": "1"})
    dense = render({"MRT_STEP": "0", "MRT_HIT3": "0",
                    "MRT_TRI_PALLAS": "0", "MRT_TRI_MXU": "0"})
    # chaos amplification: a single winner-t ulp difference between the
    # two implementations flips a bounce path, so PER-PIXEL equality
    # cannot hold across them; like the published goldens, compare the
    # expectation (box-downsampled). bad_frac (full-res pixels off by
    # > 8/255) is reported to track silhouette-phantom drift.
    f = 8
    ds = np.abs(downsample(ours, f) - downsample(dense, f))
    mae = float(ds.mean())
    diff = np.abs(ours - dense)
    bad_frac = float((diff.max(axis=-1) > 8.0).mean())
    nocull_frac = float(
        (np.abs(ours - nocull).max(axis=-1) > 8.0).mean())
    if save_dir:
        from PIL import Image

        os.makedirs(save_dir, exist_ok=True)
        Image.fromarray(ours.astype(np.uint8)).save(
            os.path.join(save_dir, f"{name}_ours.png"))
        Image.fromarray(dense.astype(np.uint8)).save(
            os.path.join(save_dir, f"{name}_dense.png"))
    return {"name": name, "mae_u8": round(mae, 2),
            "bad_frac": round(bad_frac, 4),
            "nocull_frac": round(nocull_frac, 4),
            "shape": list(ours.shape), "sample": sample}


def downsample(img: np.ndarray, f: int) -> np.ndarray:
    h, w = img.shape[:2]
    h2, w2 = h // f * f, w // f * f
    return img[:h2, :w2].reshape(h2 // f, f, w2 // f, f, 3).mean((1, 3))


def run_golden(name: str, sample: int, save_dir: str | None = None) -> dict:
    from PIL import Image

    from micro_raytracer_tpu.frontends import cli
    from micro_raytracer_tpu.models.render import render_image

    if name in GOLDEN_FILES:
        cfg = cli.parse_render(cli.build_parser().parse_args([GOLDEN_FILES[name]]))
    else:
        cfg = cli.parse_render(cli.build_parser().parse_args(GOLDENS[name]))
    cfg.rt.sample = sample
    ours = render_image(cfg).astype(np.float32)
    ref = np.asarray(
        Image.open(os.path.join(DOC, f"{name}.png")).convert("RGB"),
        np.float32)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)

    f = max(8, ours.shape[1] // 160)
    a, b = downsample(ours, f), downsample(ref, f)
    mae = float(np.abs(a - b).mean())
    p95 = float(np.percentile(np.abs(a - b), 95))
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        Image.fromarray(ours.astype(np.uint8)).save(
            os.path.join(save_dir, f"{name}_ours.png"))
    return {"name": name, "mae_u8": round(mae, 2), "p95_u8": round(p95, 2),
            "shape": list(ours.shape), "sample": sample}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sample", type=int, default=64)
    p.add_argument("--scenes",
                   default="out0,out1,out2,out3,out4,tri_self,sph_self",
                   help="comma-separated golden names")
    p.add_argument("--save", default=None, help="dir to save our renders")
    args = p.parse_args(argv)

    results = []
    tri_ok = True
    for name in args.scenes.split(","):
        name = name.strip()
        if name in SELF_GOLDENS:
            r = run_tri_self(min(args.sample, 32), args.save, name=name)
            # identical RNG streams on both sides: the MAE gate is tight
            # (phantom silhouette drift, ~0.7% of pixels historically);
            # bad_frac (chaotic per-pixel splits, 12.9% at round 4) and
            # nocull_frac (pure culling deviation) are gated against
            # drift from the recorded levels (per-scene, SELF_GOLDENS)
            _f, _res, mg, bg, ng = SELF_GOLDENS[name]
            ok_s = (r["mae_u8"] < mg and r["bad_frac"] < bg
                    and r["nocull_frac"] < ng)
            tri_ok = tri_ok and ok_s
            print(json.dumps(r))
            continue
        r = run_golden(name, args.sample, args.save)
        print(json.dumps(r))
        results.append(r)
    worst = max(r["mae_u8"] for r in results) if results else 0.0
    ok = worst < 12.0 and tri_ok
    print(json.dumps({"worst_mae_u8": worst, "tri_self_pass": tri_ok,
                      "pass": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
