import jax.numpy as jnp
import numpy as np
import pytest

from micro_raytracer_tpu.ops import linalg


def test_dot_cross_norm():
    a = jnp.array([[1.0, 2.0, 3.0]])
    b = jnp.array([[4.0, 5.0, 6.0]])
    assert np.isclose(linalg.dot(a, b)[0], 32.0)
    np.testing.assert_allclose(linalg.cross(a, b)[0], [-3.0, 6.0, -3.0])
    np.testing.assert_allclose(linalg.mag(a)[0], np.sqrt(14.0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(linalg.normalize(a)[0]), np.array([1, 2, 3]) / np.sqrt(14), rtol=1e-6
    )


def test_reflect():
    v = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(linalg.reflect(v, n)[0]), [1.0, 1.0, 0.0], atol=1e-7)


def test_refract_straight_through():
    # The reference formula (lin.rs:96-105) is v*eta + n*(cos*eta + sqrt(k))
    # with cos = -n.v; for an exit hit the normal is aligned with the ray
    # (cos = -1) and eta=1 transmits unchanged: v + n*(-1 + 1) = v.
    v = jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, ok = linalg.refract(v, jnp.array([1.0]), n)
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0, 0.0], atol=1e-6)


def test_refract_tir():
    # grazing incidence with high eta -> k < 0 -> total internal reflection
    v = linalg.normalize(jnp.array([[1.0, 0.01, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    _, ok = linalg.refract(v, jnp.array([1.5]), n)
    assert not bool(ok[0])


def test_lookat_default_forward_is_identity():
    # camera default dir [0,0,1,0] (w,x,y,z) -> identity orientation
    d = jnp.array([0.0, 0.0, 1.0, 0.0])
    np.testing.assert_allclose(np.asarray(linalg.lookat_mat(d)), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(linalg.rotate_y_mat(d)), np.eye(3), atol=1e-6)


def test_rotate_y_roll():
    # w = sin(roll); for w=1, cw=0: maps x->z, z->-x (per lin.rs:175-183)
    d = jnp.array([1.0, 0.0, 1.0, 0.0])
    m = np.asarray(linalg.rotate_y_mat(d))
    np.testing.assert_allclose(m, [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], atol=1e-6)


def test_lookat_right_turn():
    # dir = +x (look right): fwd=(1,0,0), right=fwd x up=(0,-1,0), n_up=right x fwd=(0,0,1)
    d = jnp.array([0.0, 1.0, 0.0, 0.0])
    m = np.asarray(linalg.lookat_mat(d))
    expect = np.array([[0.0, 1.0, 0.0], [-1.0, 0.0, -0.0], [0.0, -0.0, 1.0]])
    np.testing.assert_allclose(m, expect, atol=1e-6)


def test_instance_mat_backward_is_identity():
    # default object dir = backward [0,0,-1,0]; -dir = forward -> identity
    d = jnp.array([0.0, 0.0, -1.0, 0.0])
    np.testing.assert_allclose(np.asarray(linalg.instance_mat(d)), np.eye(3), atol=1e-6)
