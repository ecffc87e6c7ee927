import jax
import pytest
import jax.numpy as jnp
import numpy as np

from micro_raytracer_tpu.models import schema
from micro_raytracer_tpu.models.compiler import compile_camera, compile_scene
from micro_raytracer_tpu.models.tracer import trace_radiance


def make(scene_json, cam_json=None):
    scene = compile_scene(schema.SceneConfig.from_json(scene_json))
    cam = compile_camera(schema.CameraConfig.from_json(cam_json or {}))
    return scene, cam


def radiance(scene, cam, coords, wh=(64, 64), bounce=8, loss=0.15, seed=0):
    return trace_radiance(scene, cam, wh, bounce, jnp.float32(loss),
                          jnp.asarray(coords, jnp.float32), jax.random.PRNGKey(seed))


def test_miss_returns_sky_color():
    scene, cam = make({"sky": {"color": [0.2, 0.4, 0.6], "pwr": 0.5}})
    # no objects at all -> bare sky color, no pwr factor (rt.rs:957-959)
    out = radiance(scene, cam, [[32, 32]])
    np.testing.assert_allclose(np.asarray(out[0]), [0.2, 0.4, 0.6], atol=1e-6)


def test_emissive_sphere_returns_albedo():
    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5,
                      "mat": {"albedo": [0.9, 0.5, 0.1], "emit": 1.0}}],
    })
    # center pixel looks straight at the sphere; emit=1 -> always albedo
    out = radiance(scene, cam, [[32, 32]])
    np.testing.assert_allclose(np.asarray(out[0]), [0.9, 0.5, 0.1], atol=1e-5)


def test_sky_powered_fold_single_hit():
    # One black-emitting-nothing sphere, no lights: radiance of a hit pixel is
    # (0.5*base + albedo*base) * pwr with base = sky.color*sky.pwr folded
    # through every live bounce. With albedo=0 the fold gives
    # col_k = 0.5^(n_live-k) * base * pwr^... — we just sanity-check bounds.
    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5, "mat": {"albedo": [0, 0, 0]}}],
        "sky": {"color": [1.0, 1.0, 1.0], "pwr": 0.5},
    })
    out = np.asarray(radiance(scene, cam, [[32, 32]], bounce=2, loss=0.0))
    assert np.all(out >= 0.0) and np.all(out <= 1.0)
    assert np.all(out[0] > 0.0)  # indirect sky light reaches the camera


def test_direct_light_zero_bounce_math():
    # bounce=0, rough=1 diffuse sphere, single point light, no sky.
    # Path = single hit; fold: col = (0.5*base + c*base + l_col) * pwr(=1),
    # base = 0 (black sky), so col = l_col =
    #   (albedo*(1-metal)*diff (.) light_color + spec) * light_pwr.
    albedo = np.array([0.8, 0.6, 0.4], np.float32)
    lpos = np.array([0.0, -2.0, 0.0], np.float32)
    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5, "mat": {"albedo": albedo.tolist(),
                                                          "rough": 1.0}}],
        "light": [{"type": "point", "pos": lpos.tolist(), "pwr": 0.7,
                   "color": [1.0, 1.0, 1.0]}],
        "sky": {"color": [0, 0, 0]},
    }, {"aprt": 0.0})
    out = np.asarray(radiance(scene, cam, [[32, 32]], wh=(64, 64), bounce=0))[0]

    # reproduce the expected shading by hand at the analytic hit point
    # camera at (0,-1,0), dir ~ +y, hit at (~0,-0.5,0), normal (0,-1,0)
    hit_p = np.array([0.0, -0.5, 0.0])
    n = np.array([0.0, -1.0, 0.0])
    l = lpos - hit_p
    ln = l / np.linalg.norm(l)
    diff = max(float(np.dot(ln, n)), 0.0)
    d = np.array([0.0, 1.0, 0.0])
    refl = ln - n * 2 * np.dot(ln, n)
    spec = max(float(np.dot(d, refl)), 0.0) ** 32 * (1.0 - 1.0)
    expect = (albedo * 1.0 * diff * 1.0 + spec) * 0.7
    np.testing.assert_allclose(out, expect, atol=5e-3)


def test_shadowed_light_is_dropped():
    # occluder between the surface and the light -> no direct contribution
    base = {
        "renderer": [
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.5],
             "mat": {"albedo": [1, 1, 1], "rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [0, 0, 2.0], "pwr": 1.0}],
        "sky": {"color": [0, 0, 0]},
    }
    cam_json = {"pos": [0, -1, 0.0], "dir": [0, 0, 1, -0.5]}
    scene, cam = make(base, cam_json)
    lit = np.asarray(radiance(scene, cam, [[32, 32]], bounce=0))[0]

    occluded = dict(base)
    occluded["renderer"] = base["renderer"] + [
        {"type": "sphere", "r": 0.4, "pos": [0, 0, 1.0],
         "mat": {"albedo": [0, 0, 0]}}]
    scene2, _ = make(occluded, cam_json)
    dark = np.asarray(radiance(scene2, cam, [[32, 32]], bounce=0))[0]
    assert lit.sum() > 0.01
    assert dark.sum() < lit.sum() * 0.05


def test_gradients_match_finite_differences():
    # d radiance / d light_pwr via AD vs central differences on the SAME key
    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5, "mat": {"rough": 1.0}}],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
        "sky": {"color": [0.1, 0.1, 0.1], "pwr": 0.5},
    })
    coords = jnp.asarray([[32.0, 32.0], [20.0, 40.0]], jnp.float32)
    key = jax.random.PRNGKey(7)

    def f(pwr):
        s = jax.tree_util.tree_map(lambda x: x, scene)
        import dataclasses
        s = dataclasses.replace(scene, light_pwr=pwr)
        out = trace_radiance(s, cam, (64, 64), 4, jnp.float32(0.15), coords, key)
        return jnp.sum(out)

    p0 = scene.light_pwr
    g = jax.grad(f)(p0)
    eps = 1e-2
    fd = (f(p0 + eps) - f(p0 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g)[0], float(fd), rtol=2e-2, atol=1e-4)


def test_gradients_wrt_albedo_nonzero():
    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5, "mat": {"rough": 1.0}}],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
    })
    coords = jnp.asarray([[32.0, 32.0]], jnp.float32)
    key = jax.random.PRNGKey(3)

    def f(albedo):
        import dataclasses
        s = dataclasses.replace(scene, mat_albedo=albedo)
        return jnp.sum(trace_radiance(s, cam, (64, 64), 2, jnp.float32(0.15),
                                      coords, key))

    g = jax.grad(f)(scene.mat_albedo)
    assert float(jnp.abs(g).sum()) > 0.0


@pytest.mark.parametrize("field,eps", [
    ("sky_pwr", 1e-2), ("mat_rough", 1e-2), ("mat_albedo", 1e-2),
])
def test_gradients_match_fd_other_params(field, eps):
    import dataclasses

    scene, cam = make({
        "renderer": [{"type": "sphere", "r": 0.5,
                      "mat": {"rough": 0.5, "albedo": [0.8, 0.6, 0.4]}}],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
        "sky": {"color": [0.2, 0.2, 0.3], "pwr": 0.4},
    })
    coords = jnp.asarray([[32.0, 32.0], [16.0, 48.0]], jnp.float32)
    key = jax.random.PRNGKey(11)

    def f(v):
        s = dataclasses.replace(scene, **{field: v})
        return jnp.sum(trace_radiance(s, cam, (64, 64), 3, jnp.float32(0.15),
                                      coords, key))

    p0 = getattr(scene, field)
    g = np.asarray(jax.grad(f)(p0))
    # central differences along the first element
    delta = np.zeros_like(np.asarray(p0))
    delta.flat[0] = eps
    fd = (float(f(p0 + delta)) - float(f(p0 - delta))) / (2 * eps)
    np.testing.assert_allclose(g.flat[0], fd, rtol=5e-2, atol=1e-4)


@pytest.mark.parametrize("glass", [False, True])
def test_fused_matches_record_path(glass):
    """trace_fused (forward affine fold) == trace_records+shade_records.

    Same RNG draws, so all stochastic choices are identical; values agree up
    to float reassociation of the radiance fold.
    """
    mat = {"glass": 0.08, "opacity": 0.0} if glass else {"rough": 0.6}
    scene, cam = make({
        "renderer": [
            {"type": "sphere", "r": 0.4, "mat": mat},
            {"type": "box", "sizes": [0.3, 0.3, 0.3], "pos": [0.5, 0.4, 0],
             "dir": [0, 0.5, 0.5, 0], "mat": {"emit": 0.4}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.4],
             "mat": {"rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
        "sky": {"color": [0.2, 0.25, 0.35], "pwr": 0.5},
    })
    xs, ys = np.meshgrid(np.arange(8, 56, 4), np.arange(8, 56, 4))
    coords = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], -1), jnp.float32)
    for seed in (0, 1):
        key = jax.random.PRNGKey(seed)
        a = np.asarray(trace_radiance(scene, cam, (64, 64), 6,
                                      jnp.float32(0.15), coords, key,
                                      fused=True))
        b = np.asarray(trace_radiance(scene, cam, (64, 64), 6,
                                      jnp.float32(0.15), coords, key,
                                      fused=False))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("field", ["inst_pos", "inst_dir", "light_pos"])
def test_gradients_match_fd_transforms(field):
    """Geometry/transform gradients (through the hit distance t) vs central
    differences at a fixed key.

    The detached-control estimator keeps branch *choices* (hit masks, face
    selection, stochastic picks) constant under an infinitesimal parameter
    shift, so AD gradients of one fixed-key sample must match FD as long as
    the eps window flips no branch; components are checked where the AD
    gradient is largest (well inside a smooth region).
    """
    import dataclasses

    scene, cam = make({
        "renderer": [
            {"type": "box", "sizes": [0.5, 0.5, 0.5],
             "dir": [0, 0.4, 0.6, 0.1],
             "mat": {"rough": 0.8, "albedo": [0.7, 0.5, 0.3]}},
            {"type": "plane", "n": [0, 0, 1], "pos": [0, 0, -0.4],
             "mat": {"rough": 1.0}},
        ],
        "light": [{"type": "point", "pos": [-0.5, -1, 0.5], "pwr": 0.5}],
        "sky": {"color": [0.2, 0.2, 0.3], "pwr": 0.4},
    })
    coords = jnp.asarray([[32.0, 32.0], [28.0, 36.0]], jnp.float32)
    key = jax.random.PRNGKey(5)

    def f(v):
        s = dataclasses.replace(scene, **{field: v})
        return jnp.sum(trace_radiance(s, cam, (64, 64), 2, jnp.float32(0.15),
                                      coords, key))

    p0 = getattr(scene, field)
    g = np.asarray(jax.grad(f)(p0))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 1e-4, f"no gradient signal through {field}"

    eps = 1e-3
    order = np.argsort(-np.abs(g).ravel())[:3]
    for flat_idx in order:
        delta = np.zeros_like(g)
        delta.flat[flat_idx] = eps
        fd = (float(f(p0 + delta)) - float(f(p0 - delta))) / (2 * eps)
        np.testing.assert_allclose(
            g.flat[flat_idx], fd, rtol=8e-2, atol=5e-4,
            err_msg=f"{field}[{flat_idx}] AD vs FD")
