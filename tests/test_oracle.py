"""Statistical validation of the vectorized tracer against the scalar oracle.

The oracle (tests/oracle.py) is a direct NumPy port of the reference's
per-pixel trace; RNG streams differ, so comparisons are in expectation with
tolerances sized to the Monte-Carlo SEM. This is the strongest correctness
evidence we can produce without building the Rust binary (none is shipped).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oracle import Oracle
from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
from micro_raytracer_tpu.models.tracer import trace_radiance


def _ours(cfg, pix, samples, seed=0):
    scene = compile_scene(cfg.scene)
    cam = compile_camera(cfg.frame.cam)
    wh = cfg.frame.render_res
    coords = jnp.asarray(np.array(pix, np.float32))
    f = jax.jit(lambda k: trace_radiance(
        scene, cam, wh, cfg.rt.bounce, jnp.float32(cfg.rt.loss), coords, k))
    acc = np.zeros((len(pix), 3))
    key = jax.random.PRNGKey(seed)
    for i in range(samples):
        acc += np.asarray(f(jax.random.fold_in(key, i)))
    return acc / samples


def _oracle(cfg, pix, samples, seed=1):
    orc = Oracle(cfg, np.random.default_rng(seed))
    return np.array([orc.radiance(x, y, samples) for x, y in pix])


def _check(cfg, pix, s_oracle=300, s_ours=2000, atol=0.02, rtol=0.25):
    a = _oracle(cfg, pix, s_oracle)
    b = _ours(cfg, pix, s_ours)
    np.testing.assert_allclose(b, a, atol=atol, rtol=rtol)


def test_direct_lit_sphere_matches_oracle():
    cfg = schema.RenderConfig.from_json({
        "frame": {"res": [64, 64]},
        "scene": {
            "renderer": [{"type": "sphere", "r": 0.5, "mat": {"rough": 1.0}}],
            "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
            "sky": {"color": [0.1, 0.1, 0.2], "pwr": 0.5},
        },
    })
    cfg.rt.bounce = 3
    _check(cfg, [(32, 32), (26, 26), (40, 30)], s_oracle=200, s_ours=1200,
           atol=0.02, rtol=0.15)


def test_emissive_box_room_matches_oracle():
    """The Cornell-box class (emissive panel, closed white box room).

    High-variance scene: tolerances sized to the SEM of ~600 oracle samples
    with per-path contributions up to ~2.
    """
    cfg = schema.RenderConfig.from_json({
        "frame": {"res": [64, 64],
                  "cam": {"pos": [0, -1.25, 0], "fov": 60}},
        "scene": {
            "renderer": [
                {"type": "box", "sizes": [0.3, 0.3, 0.01], "pos": [0, 0, 0.499],
                 "mat": {"emit": 1}},
                {"type": "box", "sizes": [1, 0.01, 1], "pos": [0, 0.5, 0]},
                {"type": "box", "sizes": [1, 1, 0.01], "pos": [0, 0, 0.5]},
                {"type": "box", "sizes": [1, 1, 0.01], "pos": [0, 0, -0.5]},
                {"type": "box", "sizes": [0.01, 1, 1], "pos": [-0.5, 0, 0],
                 "mat": {"albedo": "#ff0000"}},
                {"type": "box", "sizes": [0.01, 1, 1], "pos": [0.5, 0, 0],
                 "mat": {"albedo": "#00ff00"}},
            ],
        },
    })
    cfg.rt.bounce = 6
    pix = [(32, 8), (32, 32), (12, 32)]
    a = _oracle(cfg, pix, 900)
    b = _ours(cfg, pix, 4000)
    # compare summed luminance per pixel with generous MC tolerance
    la, lb = a.sum(1), b.sum(1)
    np.testing.assert_allclose(lb, la, rtol=0.35, atol=0.02)


def test_glass_sphere_matches_oracle():
    cfg = schema.RenderConfig.from_json({
        "frame": {"res": [64, 64]},
        "scene": {
            "renderer": [
                {"type": "sphere", "r": 0.3,
                 "mat": {"glass": 0.08, "opacity": 0.0}},
                {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.3],
                 "mat": {"rough": 1.0}},
            ],
            "light": [{"type": "point", "pos": [0, -1, 1], "pwr": 0.6}],
            "sky": {"color": [0.2, 0.3, 0.4], "pwr": 0.5},
        },
    })
    cfg.rt.bounce = 4
    _check(cfg, [(32, 32), (32, 48)], s_oracle=300, s_ours=2000,
           atol=0.03, rtol=0.3)


def test_rotated_instanced_boxes_match_oracle():
    """Instance transforms (dir rotation + inst list) through the full path."""
    cfg = schema.RenderConfig.from_json({
        "frame": {"res": [64, 64], "cam": {"pos": [0, -2, 0.3]}},
        "scene": {
            "renderer": [
                {"type": "box", "sizes": [0.4, 0.4, 0.4], "pos": [0, 0, 0],
                 "dir": [0, 0.5, 0.5, 0],
                 "mat": {"albedo": [0.8, 0.4, 0.2], "rough": 0.6}},
                {"type": "sphere", "r": 0.25,
                 "inst": [[[-0.7, 0.3, 0], [0, 0, -1, 0]],
                          [[0.7, 0.3, 0], [0, 0.7, 0.3, 0]]],
                 "mat": {"metal": 1.0}},
                {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.4],
                 "mat": {"rough": 1.0}},
            ],
            "light": [{"type": "dir", "dir": [0.3, 0.5, -1], "pwr": 0.7}],
            "sky": {"color": [0.15, 0.18, 0.25], "pwr": 0.5},
        },
    })
    cfg.rt.bounce = 3
    _check(cfg, [(32, 40), (32, 20), (10, 40)], s_oracle=250, s_ours=1500,
           atol=0.03, rtol=0.3)


def test_textured_materials_match_oracle():
    """Texture + roughness/emission maps through the full tracer vs oracle."""
    # a 2x2 checker texture and a horizontal-gradient emission map
    checker = {"w": 2, "h": 2, "dat": [[1, 1, 1], [0.2, 0.2, 0.2],
                                       [0.2, 0.2, 0.2], [1, 1, 1]]}
    emap = {"w": 4, "h": 1, "dat": [[0, 0, 0], [0.3, 0.3, 0.3],
                                    [0.6, 0.6, 0.6], [1, 1, 1]]}
    cfg = schema.RenderConfig.from_json({
        "frame": {"res": [64, 64]},
        "scene": {
            "renderer": [
                {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.4],
                 "mat": {"tex": checker, "rough": 1.0}},
                {"type": "sphere", "r": 0.4, "pos": [0, 0.5, 0],
                 "mat": {"albedo": [0.9, 0.6, 0.3], "emap": emap}},
            ],
            "light": [{"type": "point", "pos": [-0.5, -1, 0.8], "pwr": 0.6}],
            "sky": {"color": [0.1, 0.12, 0.2], "pwr": 0.5},
        },
    })
    cfg.rt.bounce = 3
    _check(cfg, [(32, 50), (32, 28), (20, 30)], s_oracle=250, s_ours=1500,
           atol=0.03, rtol=0.3)
